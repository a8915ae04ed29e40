package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the operators the DuckDB oracle can't hash-check
  * (Q10 approx distinct — HLL++ differs across engines; Q24 sampling —
  * nondeterministic row sets, count bounds only).
  */
class ApproxSpec extends SparkSpec {

  test("q15 approx_count_distinct (rsd=0.01) is within 5% of exact on every fixture column") {
    val li = Tables.load(spark, sf(), "lineitem")
    Seq("l_orderkey", "l_partkey", "l_suppkey").foreach { c =>
      val r = li.agg(
        countDistinct(col(c)).as("exact"),
        approx_count_distinct(col(c), rsd = 0.01).as("approx")).collect().head
      val exact = r.getLong(0).toDouble
      val approx = r.getLong(1).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"$c: approx $approx vs exact $exact")
    }
  }

  test("q31 sample returns a fraction-proportional row count") {
    val li = Tables.load(spark, sf(), "lineitem")
    val n = li.count().toDouble
    val sampled = li.sample(withReplacement = false, fraction = 0.1, seed = 42).count().toDouble
    assert(sampled > n * 0.05 && sampled < n * 0.15,
      s"sampled $sampled of $n not within [5%, 15%]")
  }

  test("q31 sample with the same seed is reproducible") {
    val li = Tables.load(spark, sf(), "lineitem")
    val a = li.sample(withReplacement = false, 0.1, 7).agg(sum(col("l_orderkey"))).collect().head.getLong(0)
    val b = li.sample(withReplacement = false, 0.1, 7).agg(sum(col("l_orderkey"))).collect().head.getLong(0)
    assert(a == b)
  }
}
