package graft

/** Every declared query must run at sf0.001 (one test per operator —
  * SURVEY §5.2; value-level checks are the driver's DuckDB oracle gate,
  * exercised via graft.Verify + tools/check.py).
  */
class QueriesSmokeSpec extends SparkSpec {

  // queries whose correct answer can legitimately be empty at tiny SF
  // q09: part prices (900..920 at sf0.001) don't overlap the supplier
  // band until sf0.01+, where the oracle checks values.
  private val mayBeEmpty = Set("q08_join_anti", "q09_join_range",
    "q59_range_join_binned", // same band non-overlap as q09 at sf0.001
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding_cosine",
    // 12-bit radius-2 probing catches ~15%/table of τ=0.45 pairs; at
    // sf0.001 (7 planted pairs) the deterministic draw lands on 0 — the
    // sf0.01 oracle row (7 of 14 pairs) is the populated check
    "dedup_embedding_ann_scaled")

  SparkEntry.allDefs.foreach { d =>
    test(s"${d.name} runs at sf0.001") {
      val n = d.fn(spark, sf()).count()
      if (!mayBeEmpty(d.name)) assert(n > 0, s"${d.name} returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
