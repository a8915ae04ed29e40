package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev probe — deleted before commit. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").createOrReplaceTempView("orders")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lineitem")
    try {
      val df = spark.sql("""
        SELECT count(*) AS n,
          sum(CASE WHEN NOT might_contain(
                (SELECT bloom_filter_agg(xxhash64(o_orderkey), 2000000000L) FROM orders),
                xxhash64(l_orderkey)) THEN 1 ELSE 0 END) AS missed
        FROM (SELECT DISTINCT l_orderkey FROM lineitem)""")
      println("RESULT: " + df.collect().mkString(" | "))
      println("---PLAN---")
      println(df.queryExecution.executedPlan.toString.take(4000))
    } catch { case e: Throwable => println("FAILED: " + e.toString.take(2000)) }
    spark.stop()
  }
}
