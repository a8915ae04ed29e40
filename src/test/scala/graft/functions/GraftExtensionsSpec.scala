package graft.functions

import graft.SparkSpec

/** The native functions must be callable from plain SQL after
  * registration (`GraftFunctions.register` on the shared session; the
  * `withExtensions`/`spark.sql.extensions` path runs the identical
  * injectFunction list at session build time).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot / vec_dist2 are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "vec_dist2(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS e").collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 8.0)
  }

  test("minhash_sig is callable from SQL and matches the query-layer constants") {
    GraftFunctions.register(spark)
    val sig = spark.sql("SELECT minhash_sig(array(42L, 7L)) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == graft.queries.DedupQueries.K)
    val a = graft.queries.DedupQueries.A
    val b = graft.queries.DedupQueries.B
    val p = graft.queries.DedupQueries.P
    val expected0 = math.min((a(0) * 42L + b(0)) % p, (a(0) * 7L + b(0)) % p)
    assert(sig.head == expected0)
  }

  test("pq_argmin_k: ranked prefix with the (d2, index asc) tiebreak, from SQL") {
    GraftFunctions.register(spark)
    // d2 vs [0.0]: c0=1, c1=0, c2=1 (ties c0 — earlier index wins), c3=25
    val r = spark.sql(
      """SELECT pq_argmin_k(array(0.0D),
           array(array(1.0D), array(0.0D), array(-1.0D), array(5.0D)), 3) AS ks""")
      .collect().head.getSeq[Int](0)
    assert(r == Seq(1, 0, 2), s"ranked prefix was $r")
    // k beyond the candidate count returns all candidates, ranked
    val all = spark.sql(
      "SELECT pq_argmin_k(array(0.0D), array(array(2.0D), array(1.0D)), 9) AS ks")
      .collect().head.getSeq[Int](0)
    assert(all == Seq(1, 0), s"overlong k was $all")
    // rank 1 coincides with pq_argmin on the same inputs
    val both = spark.sql(
      """SELECT pq_argmin_k(array(0.5D, -1.0D),
           array(array(0.0D, 0.0D), array(1.0D, -1.0D), array(0.5D, -1.0D)), 1)[0] AS k1,
         pq_argmin(array(0.5D, -1.0D),
           array(array(0.0D, 0.0D), array(1.0D, -1.0D), array(0.5D, -1.0D))) AS am""")
      .collect().head
    assert(both.getInt(0) == both.getInt(1))
  }

  test("extension class exposes the same function list") {
    assert(GraftFunctions.all.map(_._1.funcName).sorted ==
      Seq("bloom_filter_agg", "jaccard_sim", "might_contain", "minhash_sig",
        "pq_argmin", "pq_argmin_k", "vec_dist2", "vec_dot"))
    // constructing the extensions class must not throw
    new GraftExtensions
  }

  test("bloom_filter_agg + might_contain: distributed build, zero false negatives") {
    GraftFunctions.register(spark)
    import spark.implicits._
    (1L to 1000L).toDF("k").createOrReplaceTempView("bf_keys")
    // Probe every inserted key (must all hit — Bloom has no false
    // negatives) plus disjoint keys (some may false-positive, never all).
    val r = spark.sql("""
      SELECT
        sum(CASE WHEN NOT might_contain(
              (SELECT bloom_filter_agg(xxhash64(k)) FROM bf_keys),
              xxhash64(k)) THEN 1 ELSE 0 END) AS missed
      FROM bf_keys""").collect().head
    assert(r.getLong(0) == 0L)
    // the build must be a distributed aggregate, not a driver collect
    val plan = spark.sql(
      "SELECT bloom_filter_agg(xxhash64(k)) FROM bf_keys")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected distributed agg in plan:\n$plan")
  }
}
