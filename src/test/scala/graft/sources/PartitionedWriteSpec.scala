package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Partitioned layout + partition pruning: the 100 TB path for
  * date/category-scoped scans. The assertion is on the PLAN — a filter on
  * the partition column must become a `PartitionFilters` entry (pruned
  * before I/O), not a post-scan `Filter`.
  */
class PartitionedWriteSpec extends SparkSpec {

  test("write.partitionBy produces a prunable layout and the scan prunes it") {
    val dir = tmpDir("part-layout") + "/orders_by_status"
    val orders = Tables.load(spark, sf(), "orders")
    TableIO.writePartitioned(orders, dir, Seq("o_orderstatus"))

    // layout: one directory per status value
    val statuses = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("o_orderstatus="))
    assert(statuses.length >= 2, s"expected >=2 partition dirs, got ${statuses.mkString(",")}")

    val back = TableIO.read(spark, dir).filter(col("o_orderstatus") === "F")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("o_orderstatus"), plan.take(2000))
    // pruning is real: only the matching partition's rows are read
    val expected = orders.filter(col("o_orderstatus") === "F").count()
    assert(back.count() == expected)

    // partition column round-trips as data (value comes from the path)
    assert(back.select("o_orderstatus").distinct().collect().map(_.getString(0)).toSeq == Seq("F"))
  }
}
