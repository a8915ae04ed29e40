package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed co-located join must run with zero exchanges (the pattern a
  * recurring 100 TB fact⋈fact join relies on).
  */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join with no Exchange and no extra Sort") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketing.writeBucketed(
        Tables.load(spark, sf(), "orders"), "b_orders", "o_custkey", 8)
      Bucketing.writeBucketed(
        Tables.load(spark, sf(), "customer"), "b_customer", "c_custkey", 8)
      val j = Bucketing.colocatedJoin(spark, "b_orders", "b_customer",
        "o_custkey", "c_custkey")
      val n = j.count()
      assert(n > 0)
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), "bucketed join must not shuffle:\n" + p.take(3000))
      // cross-check: the same join on the raw (unbucketed) parquet shuffles
      val raw = Tables.load(spark, sf(), "orders").join(
        Tables.load(spark, sf(), "customer"),
        col("o_custkey") === col("c_custkey"))
      raw.collect()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
