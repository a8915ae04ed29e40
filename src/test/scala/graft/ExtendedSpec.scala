package graft

import org.apache.spark.sql.functions._

/** Pins the round-3 ExtendedQueries forms to the Spark built-ins they
  * re-express deterministically (q61 mode, q62 skew/kurt), plus the
  * sketch invariants behind q67.
  */
class ExtendedSpec extends SparkSpec {

  test("q61: built-in mode() agrees with the deterministic count-desc form when the winner is unique") {
    val li = Tables.load(spark, sf(), "lineitem")
    val det = queries.ExtendedQueries.defs.find(_.name == "q61_mode").get
      .fn(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val counts = li.groupBy(col("l_linestatus"), col("l_returnflag"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
    val builtin = li.groupBy(col("l_linestatus"))
      .agg(mode(col("l_returnflag")).as("m")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    det.foreach { case (status, flag) =>
      val ns = counts(status).map(r => r.getString(1) -> r.getLong(2))
      val top = ns.map(_._2).max
      if (ns.count(_._2 == top) == 1)
        assert(builtin(status) == flag, s"mode($status): builtin ${builtin(status)} vs $flag")
    }
  }

  test("q62: built-in skewness/kurtosis equal the population moments behind the sample-corrected query") {
    val li = Tables.load(spark, sf(), "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        skewness(col("l_quantity")).as("g1"),
        kurtosis(col("l_quantity")).as("g2"),
        count(lit(1)).cast("double").as("n"),
        sum(expr("cast(l_quantity as bigint)")).cast("double").as("s1"),
        sum(expr("cast(l_quantity as bigint) * cast(l_quantity as bigint)")).cast("double").as("s2"),
        sum(expr("cast(l_quantity as bigint) * cast(l_quantity as bigint) * cast(l_quantity as bigint)")).cast("double").as("s3"),
        sum(expr("cast(l_quantity as bigint) * cast(l_quantity as bigint) * cast(l_quantity as bigint) * cast(l_quantity as bigint)")).cast("double").as("s4"))
      .collect()
    rows.foreach { r =>
      val Seq(g1, g2, n, s1, s2, s3, s4) = (1 to 7).map(i => r.getDouble(i))
      val mu = s1 / n
      val m2 = s2 / n - mu * mu
      val m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
      val m4 = s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu
      val expSkew = m3 / math.pow(m2, 1.5)
      val expKurt = m4 / (m2 * m2) - 3
      assert(math.abs(g1 - expSkew) < 1e-8, s"skewness: $g1 vs $expSkew")
      assert(math.abs(g2 - expKurt) < 1e-8, s"kurtosis: $g2 vs $expKurt")
    }
  }

  test("q67: bloom filter has no false negatives and respects the configured fpp on absent keys") {
    val orders = Tables.load(spark, sf(), "orders")
    val keys = orders.select(col("o_orderkey")).collect().map(_.getLong(0))
    val bf = orders.stat.bloomFilter("o_orderkey", keys.length.toLong, 0.01)
    assert(keys.forall(bf.mightContain), "false negative")
    val maxKey = keys.max
    val absent = (1 to 10000).map(i => maxKey + i.toLong)
    val fpr = absent.count(bf.mightContain).toDouble / absent.size
    assert(fpr <= 0.05, s"observed fpr $fpr far above configured 0.01")
  }

  test("q67: count-min sketch never under-counts and is near-exact at fixture scale") {
    val li = Tables.load(spark, sf(), "lineitem")
    val cms = li.stat.countMinSketch("l_returnflag", 0.01, 0.99, 42)
    val exact = li.groupBy(col("l_returnflag")).count().collect()
    exact.foreach { r =>
      val est = cms.estimateCount(r.getString(0))
      assert(est >= r.getLong(1), s"${r.getString(0)}: est $est < exact ${r.getLong(1)}")
      assert(est <= (r.getLong(1) * 1.02 + 10).toLong, s"${r.getString(0)}: est $est way above exact")
    }
  }
}
