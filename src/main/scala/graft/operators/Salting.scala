package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation for equi-joins: salt the skewed (big) side, replicate
  * the small side.
  *
  * AQE's skew-join splitting handles sort-merge joins; explicit salting
  * is the tool when (a) the skew is on a broadcast-ineligible small side,
  * (b) the join is feeding an aggregation keyed on the same hot key, or
  * (c) you need deterministic partition sizing (e.g., bounding state per
  * task in a streaming join). At 100 TB a single hot key (the classic
  * null-key or default-value skew) otherwise pins one task at 100% while
  * the stage idles.
  *
  * Result equivalence: every big-side row carries exactly one salt in
  * [0, salts); the small side is replicated once per salt value, so each
  * matching (big, small) pair joins exactly once. The salt value itself
  * is arbitrary — `pmod(xxhash64(key, partition_id), salts)` spreads a
  * hot key across `salts` reducers deterministically per partition.
  */
object Salting {

  val SaltCol = "__graft_salt"

  /** Inner/left equi-join on `key` with the big side salted `salts` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn(SaltCol,
      pmod(xxhash64(col(key), spark_partition_id()), lit(salts)))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    salted.join(replicated, Seq(key, SaltCol), joinType).drop(SaltCol)
  }

  /** Two-phase aggregation for a skewed groupBy key: partial-aggregate on
    * (key, salt), then final-aggregate on key. `sum`/`count` compose as
    * sum-of-sums; pass the partial and final expressions explicitly.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn(SaltCol, pmod(xxhash64(col(key), spark_partition_id()), lit(salts)))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_" + valueCol),
        sum(col("__pcnt")).as("cnt"))
  }
}
