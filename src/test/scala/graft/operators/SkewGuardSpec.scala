package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hot-bucket skew guard (Salting.gridSelfPairs): on an adversarial
  * corpus — boilerplate docs all sharing an LSH band value — the banded
  * dedup join must not put the bucket's O(H²) pair work on one task.
  * The guard's contract under test:
  *  (1) EXACT pair preservation: grid decomposition emits every
  *      unordered in-bucket pair exactly once (vs the naive self-join);
  *  (2) BOUNDED skew: the guarded join's largest key group carries
  *      ~2H/grid rows instead of the hot bucket's full H — task input
  *      in a shuffled equi-join is proportional to key-group size, so
  *      this is the quantity that bounds task skew;
  *  (3) cold buckets are untouched (no replication, plain equi-join).
  */
class SkewGuardSpec extends SparkSpec {

  private val Grid = 4
  private val HotLoad = 50L

  /** 400 rows in ONE hot bucket + 120 rows spread over 40 cold buckets. */
  private def planted = {
    import spark.implicits._
    val hot = (1 to 400).map(i => (i.toLong, "B", 777L, i.toLong * 3))
    val cold = (401 to 520).map(i => (i.toLong, "B", (i % 40).toLong, i.toLong * 3))
    (hot ++ cold).toDF("doc_id", "band", "band_val", "payload")
  }

  private def guarded = Salting.gridSelfPairs(planted,
    Seq("band", "band_val"), "doc_id", Seq("payload"), Grid, HotLoad)

  test("grid decomposition preserves the pair set exactly (planted hot bucket)") {
    val rows = planted
    val naive = rows.as("a").join(rows.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        col("a.payload").as("px"), col("b.payload").as("py"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = guarded
      .select(col("a_doc_id"), col("b_doc_id"), col("a_payload"), col("b_payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == got.toSet.size, "a pair was emitted more than once")
    assert(got.toSet == naive, s"pair sets differ: ${got.length} vs ${naive.size}")
    // sanity on the scale of the test: the hot bucket alone is C(400,2)
    assert(naive.size >= 400 * 399 / 2)
  }

  test("guarded join keys carry ~2H/grid rows where the naive key carries H") {
    // reconstruct the guard's key distribution with ITS deterministic
    // group assignment: hot rows replicate to grid cells keyed by
    // (bucket, lo, hi); the largest such group bounds what any join
    // task reads for the hot bucket
    val hotRows = planted.filter(col("band_val") === 777L)
      .withColumn("g", pmod(xxhash64(col("doc_id")), lit(Grid.toLong)))
      .withColumn("k", explode(sequence(lit(0L), lit((Grid - 1).toLong))))
      .withColumn("lo", least(col("g"), col("k")))
      .withColumn("hi", greatest(col("g"), col("k")))
    val loads = hotRows.groupBy(col("lo"), col("hi")).count()
      .collect().map(_.getLong(2))
    val h = 400.0
    // xxhash64 group sizes are not exactly H/grid; 1.6x headroom over
    // the ideal 2H/grid still demonstrates the H -> 2H/grid collapse
    assert(loads.max <= (2 * h / Grid * 1.6).toLong,
      s"hot-bucket cell load ${loads.max} did not collapse (H=$h, grid=$Grid)")
    assert(loads.length == Grid * (Grid + 1) / 2,
      s"expected ${Grid * (Grid + 1) / 2} grid cells, saw ${loads.length}")
  }

  test("gridSelfPairs DeriveHotLoad: in-plan tail threshold engages on planted skew, pair set preserved") {
    import spark.implicits._
    // one 120-row hot bucket + 1200 cold buckets of load 2: with >1000
    // distinct buckets the p999 of the load rollup sits at the cold
    // load, so the planted tail — and only it — clears the strict
    // `load > thr` filter (below ~1000 buckets the sketch quantile
    // equals the max load and the derived guard no-ops by design —
    // the documented DeriveHotLoad small-cardinality note)
    val hot = (1 to 120).map(i => (i.toLong, "B", 777777L, i.toLong))
    val cold = (1 to 1200).flatMap(b => Seq(
      (10000L + 2 * b, "B", b.toLong, 1L),
      (10001L + 2 * b, "B", b.toLong, 2L)))
    val rows = (hot ++ cold).toDF("doc_id", "band", "band_val", "payload")
    val naive = rows.as("a").join(rows.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Salting.gridSelfPairs(rows, Seq("band", "band_val"),
        "doc_id", Seq("payload"), Grid, Salting.DeriveHotLoad)
      .select(col("a_doc_id"), col("b_doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "a pair was emitted more than once")
    assert(got.toSet == naive, "derived-threshold guard changed the pair set")
    // engagement: the derived threshold (the guard's own quantile
    // expression over the planted rollup) sits below the hot load, so
    // the 120-row bucket routes through the grid arm — a never-routing
    // guard would pass the set-equality law silently
    val thr = rows.groupBy(col("band"), col("band_val"))
      .agg(count(lit(1)).as("__load"))
      .agg(expr(s"approx_percentile(__load, ${Salting.GuardTailQuantile}, 10000)"))
      .head.getLong(0)
    assert(thr >= 2L && thr < 120L,
      s"derived p999 threshold $thr must sit below the planted hot load")
  }

  test("the declared guarded row's DEFAULT derived threshold preserves the pair set on the fixture") {
    val dir = sf("sf0.001")
    val (unguarded, d1) = graft.queries.DedupQueries
      .simhashBandedPairs(spark, dir, graft.queries.DedupQueries.SimhashTightMaxHamming)
    val expect = unguarded.collect().map(r => (r.get(0), r.get(1))).toSet
    d1.unpersist()
    // defaults = the declared dedup_simhash_banded_guarded config
    // (grid 8, hotLoad = Salting.DeriveHotLoad since round 19)
    val (guardedPairs, d2) = graft.queries.DedupQueries
      .simhashBandedPairsGuarded(spark, dir)
    val got = guardedPairs.collect().map(r => (r.get(0), r.get(1))).toSet
    d2.unpersist()
    assert(got == expect,
      s"derived-default guarded (${got.size}) and unguarded (${expect.size}) pair sets differ")
  }

  test("the guarded banded dedup matches the unguarded pair set on the fixture") {
    // force the guard ON for every bucket (hotLoad=1): the pure-grid
    // path must still reproduce the plain bucket join bit for bit
    val dir = sf("sf0.001")
    val (unguarded, d1) = graft.queries.DedupQueries
      .simhashBandedPairs(spark, dir, graft.queries.DedupQueries.SimhashTightMaxHamming)
    val expect = unguarded.collect().map(r => (r.get(0), r.get(1))).toSet
    d1.unpersist()
    val (guardedPairs, d2) = graft.queries.DedupQueries
      .simhashBandedPairsGuarded(spark, dir, grid = 3, hotLoad = 1L)
    val got = guardedPairs.collect().map(r => (r.get(0), r.get(1))).toSet
    d2.unpersist()
    assert(got == expect,
      s"guarded (${got.size}) and unguarded (${expect.size}) pair sets differ")
  }
}
