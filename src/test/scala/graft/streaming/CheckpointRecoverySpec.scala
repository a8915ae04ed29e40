package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Exactly-once semantics across restarts: a checkpointed stream stopped
  * and restarted over a grown input directory must (a) process each file
  * exactly once — the restart resumes from the checkpoint, not from
  * scratch — and (b) converge the idempotent-upsert sink to the batch
  * answer. This is the engine's replacement for the reference's manual
  * retry advice (README.md:104-109).
  */
object CheckpointRecoverySpec {
  val batchRows = new ConcurrentLinkedQueue[Long]()
}

class CheckpointRecoverySpec extends SparkSpec {

  private def copyPart(src: String, destDir: String, n: Int): Unit = {
    val parts = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.take(n).foreach { f =>
      Files.copy(Paths.get(f.getPath), Paths.get(destDir, f.getName),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def runOnce(inDir: String, ckpt: String, sinkName: String): Unit = {
    val schema = graft.Tables.load(spark, sf(), "events").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CheckpointRecoverySpec.batchRows.add(batch.count())
        graft.sources.Ingest.bulkUpsert(batch, sinkName,
          pk = Seq("user_id", "event_type"))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("restart from checkpoint processes only new files; sink converges to batch answer") {
    val events = graft.Tables.load(spark, sf(), "events")
    val staged = tmpDir("ckpt-src")
    events.repartition(4).write.mode("overwrite").parquet(staged)

    val inDir = tmpDir("ckpt-in")
    val ckpt = tmpDir("ckpt-state")
    graft.sources.InMemorySink.clear("t_ckpt_sink")
    CheckpointRecoverySpec.batchRows.clear()

    // phase 1: two files visible
    copyPart(staged, inDir, 2)
    runOnce(inDir, ckpt, "t_ckpt_sink")
    val phase1 = CheckpointRecoverySpec.batchRows.size()
    val phase1Rows = {
      import scala.jdk.CollectionConverters._
      CheckpointRecoverySpec.batchRows.asScala.sum
    }
    assert(phase1 == 2, s"expected 2 micro-batches in phase 1, got $phase1")

    // phase 2: all four files visible, SAME checkpoint — restart must
    // pick up only the two new files
    copyPart(staged, inDir, 4)
    runOnce(inDir, ckpt, "t_ckpt_sink")
    import scala.jdk.CollectionConverters._
    val allRows = CheckpointRecoverySpec.batchRows.asScala.toSeq
    val total = events.count()
    assert(allRows.size == 4,
      s"restart reprocessed old files: ${allRows.size} micro-batches total")
    assert(allRows.sum == total,
      s"each row processed exactly once: got ${allRows.sum}, corpus $total")
    assert(phase1Rows < total, "phase 1 must not have seen the whole corpus")

    // sink state = batch answer (distinct upsert keys)
    val expectedKeys = events.select("user_id", "event_type").distinct().count()
    assert(graft.sources.InMemorySink("t_ckpt_sink").count() == expectedKeys)
  }
}
