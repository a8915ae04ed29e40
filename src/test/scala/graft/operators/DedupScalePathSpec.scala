package graft.operators

import graft.SparkSpec
import graft.queries.{DedupQueries, QueryDef}

/** The two round-7 bucketed dedup paths vs their all-pairs reference
  * forms (VERDICT r6 items 1-2).
  *
  *  - dedup_simhash_banded is LOSSLESS by pigeonhole (13 bands > radius
  *    12), so its pair set must EQUAL dedup_simhash's — exact equality,
  *    not recall.
  *  - dedup_embedding_ann is approximate by design; this spec measures
  *    and pins recall against dedup_embedding_cosine (the recall oracle)
  *    and asserts perfect precision (the in-bucket verify is exact).
  */
class DedupScalePathSpec extends SparkSpec {

  private def run(name: String, dir: String = sf()): Set[(Long, Long)] = {
    val fn = QueryDef.toQueriesMap(DedupQueries.defs)(name)
    fn(spark, dir)
      .select("*")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
  }

  test("dedup_simhash_banded pair set equals the all-pairs form exactly") {
    val allPairs = run("dedup_simhash")
    val banded = run("dedup_simhash_banded")
    assert(banded == allPairs,
      s"banding must be lossless: missing=${(allPairs -- banded).take(5)} " +
        s"extra=${(banded -- allPairs).take(5)}")
    assert(allPairs.nonEmpty, "fixture must exercise the operator")
  }

  test("tight-radius banded form equals the all-pairs set at its threshold (lossless at d=3 too)") {
    // the production-radius variant (4 bands of 15 bits) must ALSO be
    // exactly lossless by the same pigeonhole — at its own threshold:
    // the loose all-pairs set filtered to hamming <= 3
    import org.apache.spark.sql.functions.col
    val allPairsTight = {
      val fn = QueryDef.toQueriesMap(DedupQueries.defs)("dedup_simhash")
      fn(spark, sf()).filter(col("hamming") <= DedupQueries.SimhashTightMaxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val tight = run("dedup_simhash_banded_tight")
    assert(tight == allPairsTight,
      s"tight banding must be lossless: missing=${(allPairsTight -- tight).take(5)} " +
        s"extra=${(tight -- allPairsTight).take(5)}")
    assert(tight.nonEmpty, "fixture must exercise the tight operator")
  }

  test("dedup_embedding_ann: perfect precision, recall >= 0.8 on fixture") {
    // sf0.01 — the correctness-gate fixture (14 planted pairs; sf0.001
    // has only 7, where one miss swings recall by 0.14)
    val exact = run("dedup_embedding_cosine", sf("sf0.01"))
    val ann = run("dedup_embedding_ann", sf("sf0.01"))
    assert(exact.nonEmpty, "fixture must exercise the operator")
    // exact in-bucket verification ⇒ no false positives, ever
    assert((ann -- exact).isEmpty, s"false positives: ${(ann -- exact).take(5)}")
    val recall = ann.size.toDouble / exact.size
    info(f"dedup_embedding_ann recall = ${ann.size}/${exact.size} = $recall%.3f " +
      s"(${DedupQueries.AnnTables} tables, probe radius ${DedupQueries.AnnProbeRadius}, " +
      "fixture pairs at cosine 0.45-0.51 — sign-LSH's hardest regime)")
    // measured 12/14 = 0.857 at radius 2; floor leaves headroom for
    // fixture regeneration but catches a broken probe/table config
    assert(recall >= 0.8, f"recall $recall%.3f below 0.8 floor")
  }
}
