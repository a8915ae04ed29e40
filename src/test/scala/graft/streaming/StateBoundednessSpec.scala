package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming property convergence specs do NOT pin: state stays
  * BOUNDED by the watermark horizon. A stateful query whose state grows
  * with total input (instead of with the horizon) works in every
  * fixed-size test and OOMs in week 2 of production — so this spec feeds
  * the ST14 chained query (dedupWithinWatermark → tumbling agg) a month
  * of events as chronological micro-batches and asserts, from the
  * engine's own queryProgress metrics, that rows are actually EVICTED and
  * the peak live state is far below total rows ingested.
  */
class StateBoundednessSpec extends SparkSpec {

  test("ST14 state plateaus at the watermark horizon instead of growing with input") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val total = ev.count()
    val chunks = 8
    // chronological chunks with strictly increasing mtimes, so
    // maxFilesPerTrigger=1 replays the month as ordered micro-batches
    // and the watermark advances between them (event time is what
    // evicts state; arrival order only has to respect it roughly).
    val d = tmpDir("events-bounded")
    val base = System.currentTimeMillis()
    val ranked = ev.withColumn(
      "chunk", ntile(chunks).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"))))
    (1 to chunks).foreach { i =>
      val tmp = tmpDir(s"stage-bounded-$i")
      ranked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(d, f"chunk$i%02d.parquet")
      Files.copy(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(base - (chunks - i) * 10000L))
    }
    val streamed = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(d)
    val q = EventStreams.dedupThenTumbling(streamed)
      .writeStream.format("memory").queryName("bounded_chained")
      .outputMode("append").start()
    q.processAllAvailable()
    val progresses = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
    q.stop()

    // per-operator peak live state and total evictions across the run
    val byOp = progresses.flatMap(_.stateOperators)
      .groupBy(_.operatorName)
    assert(byOp.keySet.exists(_.contains("dedup")),
      s"expected a dedup state operator, got ${byOp.keySet}")
    byOp.foreach { case (op, metrics) =>
      val peak = metrics.map(_.numRowsTotal).max
      val removed = metrics.map(_.numRowsRemoved).sum
      // Eviction must actually happen (a month of data vs a 2h
      // watermark), and the peak must be far below total input — the
      // state a 100 TB stream holds is the horizon, not the history.
      assert(removed > 0, s"$op never evicted state rows")
      assert(peak < total / 2,
        s"$op peak state $peak grows with input ($total rows) — not bounded")
    }
  }
}
