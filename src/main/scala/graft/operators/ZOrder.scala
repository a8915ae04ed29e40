package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data-skipping.
  *
  * At 100 TB the dominant cost is the scan, and the dominant scan
  * optimization is skipping files/row-groups via min/max statistics.
  * Sorting the layout by ONE column gives perfect skipping on that column
  * and none on any other; interleaving the bits of several columns
  * (the Morton curve) gives good-but-not-perfect skipping on ALL of them
  * — every written file covers a small hyper-rectangle of the key space,
  * so its min/max ranges are narrow in every dimension. This is the same
  * layout idea Delta Lake's OPTIMIZE ZORDER BY and Iceberg's z-curve sort
  * order apply; here it is plain Spark: a straight-line shift/mask column
  * expression (whole-stage codegen'd, no UDF) + repartitionByRange +
  * sortWithinPartitions + write.
  *
  * Reference scope note: alxmancilla/parquet-demo controls layout only
  * via row-group size (examples/generate_big_parquet.py:96 row_group_size);
  * multi-dimensional clustering is [EXT] engine surface.
  */
object ZOrder {

  /** Morton code of two non-negative int columns, `bits` low bits each,
    * interleaved (a in even positions, b in odd).
    *
    * ONLY the low `bits` bits participate: values ≥ 2^bits alias onto
    * distant z-cells (data stays correct — the z-value is just a sort
    * key — but min/max file-skipping quality quietly degrades). For
    * columns with domains wider than 2^bits, pass `rescale = true` to
    * [[clusterWrite]]/[[clusterWriteN]] (maps each column's observed
    * [min,max] linearly onto [0, 2^bits)), or pre-bucket the column
    * yourself (e.g. `shiftright` to its top `bits` bits).
    */
  def zvalue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val ai = a.cast("int")
    val bi = b.cast("int")
    (0 until bits).map { k =>
      shiftleft(shiftright(ai, k).bitwiseAND(lit(1)).cast("bigint"), 2 * k) +
        shiftleft(shiftright(bi, k).bitwiseAND(lit(1)).cast("bigint"), 2 * k + 1)
    }.reduce(_ + _)
  }

  /** N-column Morton code: bit k of column j lands at output position
    * k * n + j (round-robin interleave). `zvalue2(a, b)` ==
    * `zvalueN(Seq(a, b))` by construction. Total bits must fit a Long.
    */
  def zvalueN(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits exceeds a Long")
    val n = cols.size
    val ints = cols.map(_.cast("int"))
    (for { k <- 0 until bits; (c, j) <- ints.zipWithIndex } yield
      shiftleft(shiftright(c, k).bitwiseAND(lit(1)).cast("bigint"), k * n + j)
    ).reduce(_ + _)
  }

  /** Cluster `df` by the Morton order of two int columns and write
    * `numFiles` parquet files: range-partition on the z-value (balanced
    * files whatever the key skew) and sort inside each partition so
    * row-group min/max stay tight too.
    *
    * `rescale = true` handles wide-domain columns (see [[zvalue2]]'s
    * truncation note): one extra min/max aggregate over `df`, then each
    * column is mapped linearly onto [0, 2^bits) before interleaving, so
    * locality is preserved instead of aliasing through the low bits.
    */
  def clusterWrite(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int, bits: Int = 16,
      rescale: Boolean = false): Unit =
    clusterWriteN(df, Seq(colA, colB), path, numFiles, bits, rescale)

  /** N-column variant of [[clusterWrite]]. */
  def clusterWriteN(df: DataFrame, cols: Seq[String],
      path: String, numFiles: Int, bits: Int = 16,
      rescale: Boolean = false): Unit = {
    val zcols: Seq[Column] =
      if (!rescale) cols.map(col)
      else {
        // One tiny agg pass (min+max per clustering column); the linear
        // map below is exact integer arithmetic on BIGINT — no doubles,
        // so the layout is deterministic across runs/partitionings.
        val row = df.agg(
          lit(0).as("_z"),
          cols.flatMap(c => Seq(min(col(c)).cast("bigint").as(s"_min_$c"),
            max(col(c)).cast("bigint").as(s"_max_$c"))): _*).collect().head
        val top = (1L << bits) - 1
        cols.map { c =>
          val lo = row.getAs[Long](s"_min_$c")
          val hi = row.getAs[Long](s"_max_$c")
          val span = math.max(1L, hi - lo)
          ((col(c).cast("bigint") - lit(lo)) * lit(top) / lit(span)).cast("int")
        }
      }
    df.withColumn("_zvalue", zvalueN(zcols, bits))
      .repartitionByRange(numFiles, col("_zvalue"))
      .sortWithinPartitions(col("_zvalue"))
      .drop("_zvalue")
      .write.mode("overwrite").parquet(path)
  }
}
