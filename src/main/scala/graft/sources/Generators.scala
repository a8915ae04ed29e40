package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic synthetic data generation (SURVEY §2.2 G1–G8), the
  * reference's only compute that produces new data.
  *
  * All generators are pure Column expressions over `spark.range(n)` —
  * chunked generation (reference: row-group loop,
  * examples/generate_parquet_from_ddl.py:117-205) maps to partitioning
  * (G8): each partition is one "chunk" and is generated independently on
  * its executor, so generation scales linearly with cores and never
  * materializes on the driver.
  *
  * Determinism: the reference seeds numpy (`RandomState(seed)`,
  * examples/generate_big_parquet.py:28) to get identical files per seed.
  * Spark's `rand(seed)` is per-partition and changes with partitioning,
  * so uniforms here are hash-derived (`xxhash64(id, seed)`), which is
  * partitioning-invariant: same (n, seed) ⇒ same rows on any cluster
  * layout (SURVEY §7.3).
  */
object Generators {

  private val M = 1000000007L

  /** G2: seeded uniform double in [0, 1), partitioning-invariant. */
  def uniform(id: Column, seed: Long, salt: Int): Column =
    pmod(xxhash64(id, lit(seed), lit(salt)), lit(M)).cast(DoubleType) / M

  /** G1: sequential ints (arange(n) + i — generate_big_parquet.py:42-43). */
  def seqInt(id: Column, i: Int): Column = id + lit(i)

  /** G3: low-cardinality strings ("prefix_" + idx % card —
    * generate_big_parquet.py:50-56).
    */
  def lowCardString(id: Column, prefix: String, card: Long): Column =
    concat(lit(prefix), pmod(id, lit(card)).cast(StringType))

  /** G4: cycling timestamps — base + (idx mod year-of-seconds) + i sec
    * (generate_big_parquet.py:59-64).
    */
  def cyclingTimestamp(id: Column, baseEpochSec: Long, i: Int): Column =
    timestamp_seconds(lit(baseEpochSec) + pmod(id, lit(31536000L)) + lit(i))

  /** G5: cycling dates — base + (idx mod 365) days
    * (generate_big_parquet.py:67-70).
    */
  def cyclingDate(id: Column, base: String): Column =
    date_add(lit(base).cast(DateType), pmod(id, lit(365)).cast(IntegerType))

  /** G6: alternating bools — idx % 2 == i % 2
    * (generate_big_parquet.py:73-74).
    */
  def alternatingBool(id: Column, i: Int): Column =
    pmod(id, lit(2)) === lit(i % 2)

  /** G7: integral decimal(38,10) of magnitude ≤ 1e16 —
    * randint(-1e6, 1e6) * 10^10 (generate_parquet_from_ddl.py:90-96).
    */
  def integralDecimal(id: Column, seed: Long, salt: Int): Column =
    ((pmod(xxhash64(id, lit(seed), lit(salt + 1000)), lit(2000001L)) - 1000000L)
      .cast(DecimalType(38, 10)) * lit(10000000000L))
      .cast(DecimalType(38, 10))

  /** The reference's wide table: 1M rows × 50 cols by default
    * (12 int64, 12 float64, 12 string, 6 timestamp, 4 date, 4 bool —
    * examples/generate_big_parquet.py:32-74, FIXTURES.md §A3).
    * `numPartitions` ≙ chunk count (G8).
    */
  def big50(spark: SparkSession, n: Long, seed: Long = 0L,
      numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, math.min(200, (n / 100000L).toInt)) // chunk_size=100k default
    val base = spark.range(0, n, 1, parts)
    val id = col("id")
    val card = math.max(1000L, n / 1000L)
    val baseEpoch = java.time.Instant.parse("2020-01-01T00:00:00Z").getEpochSecond
    val cols =
      (0 until 12).map(i => seqInt(id, i).as(s"i_$i")) ++
      (0 until 12).map(i => uniform(id, seed, i).as(s"f_$i")) ++
      (0 until 12).map(i => lowCardString(id, "str_", card).as(s"s_$i")) ++
      (0 until 6).map(i => cyclingTimestamp(id, baseEpoch, i).as(s"ts_$i")) ++
      (0 until 4).map(_ => cyclingDate(id, "2020-01-01")).zipWithIndex
        .map { case (c, i) => c.as(s"d_$i") } ++
      (0 until 4).map(i => alternatingBool(id, i).as(s"b_$i"))
    base.select(cols: _*)
  }

  /** A ddl53-shaped supply-chain table: same type census as the
    * reference's 53-col schema (21 string, 11 decimal(38,10), 8 int64,
    * 7 float32, 3 timestamp, 3 bool —
    * examples/generate_parquet_from_ddl.py:26-82, FIXTURES.md §A4).
    */
  def ddl53(spark: SparkSession, n: Long, seed: Long = 0L,
      numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, (n / 100000L).toInt.max(1))
    val base = spark.range(0, n, 1, parts)
    val id = col("id")
    val baseEpoch = java.time.Instant.parse("2020-01-01T00:00:00Z").getEpochSecond
    val cols =
      (0 until 21).map(i => lowCardString(id, s"v${i}_", 5L + (i * 997) % 4996).as(s"str_$i")) ++
      (0 until 11).map(i => integralDecimal(id, seed, i).as(s"dec_$i")) ++
      (0 until 8).map(i => seqInt(id, i).as(s"int_$i")) ++
      (0 until 7).map(i => uniform(id, seed, 100 + i).cast(FloatType).as(s"real_$i")) ++
      (0 until 3).map(i => cyclingTimestamp(id, baseEpoch, i).as(s"ts_$i")) ++
      (0 until 3).map(i => alternatingBool(id, i).as(s"bool_$i"))
    base.select(cols: _*)
  }
}
