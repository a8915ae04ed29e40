package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins.
  *
  * Writing both sides of a recurring equi-join bucketed on the join key
  * (same bucket count) lets every subsequent join run with NO exchange:
  * each task reads matching bucket files from both sides. At 100 TB this
  * converts the nightly fact⋈fact join from the cluster's biggest
  * shuffle into a partition-local merge; the one-off cost is the write.
  * `sortBy` on the same key additionally removes the sort from the
  * sort-merge join.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their keys — shuffle-free when
    * bucket counts match (verified by BucketingSpec on the plan).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
