package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggSpec extends SparkSpec {

  private lazy val skewed =
    spark.range(0, 20000)
      .withColumn("g", when(col("id") % 100 =!= 0, lit("hot")).otherwise(concat(lit("g"), pmod(col("id"), lit(7)))))
      .withColumn("v", (col("id") % 9973).cast("double"))
      .repartition(8)

  test("aggregator top-k equals window top-k on skewed groups") {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val windowed = skewed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("g"), col("rn"), col("id"), col("v"))
      .collect().map(_.toString).sorted
    val topk = udaf(TopKAgg(5))
    val agged = skewed.groupBy(col("g"))
      .agg(topk(col("v"), col("id")).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "x")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rn"),
        col("x.tag").as("id"), col("x.value").as("v"))
      .collect().map(_.toString).sorted
    assert(windowed.length == agged.length)
    assert(windowed.sameElements(agged))
  }

  test("aggregation is partial (map-side) before the exchange") {
    val topk = udaf(TopKAgg(3))
    val df = skewed.groupBy(col("g")).agg(topk(col("v"), col("id")).as("tk"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_topkagg"), p.take(2000))
  }
}
