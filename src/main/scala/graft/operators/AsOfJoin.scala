package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the most recent right row
  * with `rightTs <= leftTs` on the same key (ties: equal timestamps
  * match; among equal-ts right rows the greatest `rightTiebreak` wins).
  *
  * Physical shape: tag both sides, union, ONE shuffle on the key, one
  * in-partition sort, then `last(_, ignoreNulls)` over the ordered
  * window carries each right row's payload forward to the left rows it
  * covers. Compare the naive formulations: a range-theta join is a
  * nested-loop over every (left, right) key pair, and a
  * groupBy-max-then-join is two shuffles; this is the standard
  * union-window as-of shape (what time-series stores call ASOF JOIN) and
  * scales as a single sort-merge pass per key.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (others dropped)
    * @param rightTiebreak right column breaking equal-ts ties (max wins)
    * @param prefix        prefix applied to carried right column names
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String], rightTiebreak: String,
      prefix: String = "asof_"): DataFrame = {

    val carried = (rightPayload :+ rightTs).distinct
    val leftCols = left.columns.toSeq

    val l = carried.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__tag", lit(1))
        .withColumn("__tb", lit(null).cast("long"))) {
      (df, c) => df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rBase = right
      .withColumn("__ts", col(rightTs)).withColumn("__tag", lit(0))
      .withColumn("__tb", col(rightTiebreak).cast("long"))
    val r = leftCols.foldLeft(
      carried.foldLeft(rBase)((df, c) => df.withColumn(s"__r_$c", col(c)))
        .select((Seq(key, "__ts", "__tag", "__tb") ++ carried.map(c => s"__r_$c"))
          .map(col).toIndexedSeq: _*)) {
      (df, c) => if (c == key) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    // right rows sort before left at equal ts (tag 0 < 1), so equal-ts
    // matches are included; among equal-ts right rows, greater tiebreak
    // sorts later and wins the `last`.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__tag").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = carried.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"$prefix$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }

    filled.filter(col("__tag") === 1)
      .select((leftCols ++ carried.map(c => s"$prefix$c")).map(col).toIndexedSeq: _*)
  }

  /** Column helper: the carried right column name after the join. */
  def carried(prefix: String, c: String): Column = col(s"$prefix$c")
}
