package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Throughput + state-plateau soak for the ST14 chained pipeline
  * (dedupWithinWatermark → tumbling agg) at 10× the correctness
  * fixture's event volume (VERDICT r7 item 6).
  *
  * The convergence/boundedness specs prove the pipeline is CORRECT and
  * that state is horizon-bounded; this one measures what a capacity plan
  * needs: rows/sec through the chained stateful operators and the state
  * store's plateau (rows + bytes) per trigger, from the engine's own
  * StreamingQueryProgress. 10% of each replica's rows are injected twice
  * so the dedup stage does real work instead of passing everything
  * through.
  *
  * Defaults: sf0.01 events (10k rows) × 10 replicas = ~110k events
  * (incl. duplicates) in 16 chronological micro-batches. Env overrides
  * for the BASELINE.md soak at bigger volume:
  *   SPARK_GRAFT_SOAK_SRC  — source SF dir (default /root/testdata/sf0.01)
  *   SPARK_GRAFT_SOAK_MULT — replica count (default 10)
  */
class StreamingSoakSpec extends SparkSpec {

  test("ST14 soak at 10x volume: throughput recorded, state plateaus") {
    val src = sys.env.getOrElse("SPARK_GRAFT_SOAK_SRC", sf("sf0.01"))
    val mult = sys.env.getOrElse("SPARK_GRAFT_SOAK_MULT", "10").toInt
    val chunks = 16

    val ev = graft.Tables.load(spark, src, "events")
    // replica i shifts event_id/user_id into a disjoint key space; event
    // TIME is unchanged, so volume grows 10× while the watermark horizon
    // (what bounds state) stays fixed — exactly the load shape a busier
    // production topic has. 10% duplicate injection per replica gives the
    // dedup stage real evictions to do.
    val scaled = (0 until mult).map { i =>
      val r = ev.select(
        (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      r.unionByName(r.filter(pmod(col("event_id"), lit(10)) === 0))
    }.reduce(_.unionByName(_))

    val total = scaled.count()
    val uniques = scaled.select("event_id").distinct().count()
    assert(total > uniques, "duplicate injection must produce real dups")

    // chronological chunk files with increasing mtimes (same replay
    // harness as StateBoundednessSpec): maxFilesPerTrigger=1 turns the
    // corpus into ordered micro-batches and advances the watermark
    val d = tmpDir("events-soak")
    val base = System.currentTimeMillis()
    val ranked = scaled.withColumn(
      "chunk", ntile(chunks).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    (1 to chunks).foreach { i =>
      val tmp = tmpDir(s"stage-soak-$i")
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
    val t0 = System.nanoTime()
    val q = EventStreams.dedupThenTumbling(streamed)
      .writeStream.format("memory").queryName("soak_chained")
      .outputMode("append").start()
    q.processAllAvailable()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val progresses = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    q.stop()

    // every input row went through the chained operators
    val processed = progresses.map(_.numInputRows).sum
    assert(processed == total, s"processed $processed of $total rows")

    // ── throughput (the capacity number) ─────────────────────────────
    val busySec = progresses.map(_.batchDuration).sum / 1000.0
    val rps = processed / busySec
    info(f"soak: $processed rows in $busySec%.1f s busy ($wallSec%.1f s wall) " +
      f"across ${progresses.size} triggers = $rps%.0f rows/sec through dedup→window")

    // ── state plateau (rows + bytes, per operator) ───────────────────
    val stateful = progresses.filter(_.stateOperators.nonEmpty)
    val byOp = stateful.flatMap(_.stateOperators).groupBy(_.operatorName)
    assert(byOp.size >= 2, s"expected chained dedup+agg state ops, got ${byOp.keySet}")
    byOp.foreach { case (op, metrics) =>
      val rows = metrics.map(_.numRowsTotal)
      val peak = rows.max
      val peakMb = metrics.map(_.memoryUsedBytes).max / 1048576.0
      val removed = metrics.map(_.numRowsRemoved).sum
      info(f"soak: $op peak state = $peak rows / $peakMb%.1f MiB, evicted $removed rows")
      assert(removed > 0, s"$op never evicted state rows")
      // plateau: the horizon (2h watermark), not the history, bounds
      // live state — the tail of the run must not out-grow the body
      assert(peak < total / 5,
        s"$op peak state $peak grows with input ($total rows) — not bounded")
      val tail = rows.drop(rows.size * 3 / 4)
      val body = rows.take(rows.size * 3 / 4)
      assert(tail.max <= math.max(body.max * 3 / 2, 100),
        s"$op state still climbing at end of soak: body peak ${body.max}, " +
          s"tail peak ${tail.max}")
    }
  }
}
