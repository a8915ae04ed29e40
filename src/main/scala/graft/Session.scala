package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Settings chosen for cluster-scale behavior even when testing on
  * local[N]: AQE on (runtime re-planning, skew-join splitting,
  * partition coalescing), UTC session timezone (oracle parity, cf.
  * reference naive-UTC convention at src/parquet_demo/io.py:37-39),
  * shuffle partitions sized to the local core count rather than the
  * 200 default (on a real cluster this is set per-job to ~2-3x total
  * cores).
  */
object Session {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // native functions (vec_dot, vec_dist2, minhash_sig) on the SQL surface
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
