package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{DocumentSourceV2, JsonlDirDescriptor}

/** Streaming DSv2 write integration (VERDICT r10 item 6): a checkpointed
  * file stream of documents flows through foreachBatch into the
  * `graft-docs` keyed upsert. Kill/restart contract under test:
  *  (1) kill after batch 1, restart with the same checkpoint → only NEW
  *      files are processed and the store converges to the batch answer
  *      (updates replace in place, new keys append, no duplicates);
  *  (2) a replayed micro-batch (the at-least-once crash window: kill
  *      between the sink write and the offset commit) re-applies as the
  *      SAME keyed upsert — store contents are unchanged, nothing
  *      duplicates.
  */
class StreamingUpsertRecoverySpec extends SparkSpec {

  private def feedFile(watch: String, i: Int, lo: Long, hi: Long,
      tag: String): Unit = {
    import spark.implicits._
    val stage = tmpDir(s"upsert-stage-$i")
    (lo to hi).map(k => (k, s"$tag $k", "xx", "gen", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val src = Files.list(Paths.get(stage))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val dst = Paths.get(watch, f"chunk$i%02d.parquet")
    Files.move(src, dst)
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    ()
  }

  private def runStream(watch: String, enc: String, ckpt: String): Unit = {
    val q = DocumentUpsertStream.start(
      DocumentStreams.readDocuments(spark, watch, maxFilesPerTrigger = 1),
      enc, ckpt, key = "doc_id")
    try q.processAllAvailable()
    finally q.stop() // the kill: stream dies between micro-batches
  }

  test("kill after batch 1, restart: store converges with no duplicate application") {
    val watch = tmpDir("upsert-watch")
    val storeDir = tmpDir("upsert-store") + "/store"
    val ckpt = tmpDir("upsert-ckpt")
    val enc = DocumentSourceV2.encodeDescriptor(JsonlDirDescriptor(storeDir))
    def store() = spark.read.format("graft-docs")
      .option("descriptor", enc).load()
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSorted

    // phase 1: docs 1–20 v1 → one micro-batch, then the stream is killed
    feedFile(watch, 0, 1L, 20L, "v1")
    runStream(watch, enc, ckpt)
    val after1 = store()
    assert(after1.map(_._1) == (1L to 20L) &&
      after1.forall { case (k, t) => t == s"v1 $k" },
      s"phase 1 store wrong: ${after1.take(5)}")

    // the at-least-once crash window: batch 1 re-applies verbatim (same
    // upsert, same keys) — contents must not change, nothing duplicates
    import spark.implicits._
    (1L to 20L).map(k => (k, s"v1 $k", "xx", "gen", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.format("graft-docs").option("descriptor", enc)
      .option("key", "doc_id").mode("append").save()
    assert(store() == after1, "replayed batch must be a no-op")

    // phase 2: docs 11–30 v2 (10 updates + 10 new), restart SAME ckpt —
    // committed offsets mean only the new file is read
    feedFile(watch, 1, 11L, 30L, "v2")
    runStream(watch, enc, ckpt)
    val after2 = store()
    assert(after2.map(_._1) == (1L to 30L),
      s"expected exactly keys 1..30, got ${after2.length} rows")
    after2.foreach { case (k, t) =>
      val want = if (k <= 10) s"v1 $k" else s"v2 $k"
      assert(t == want, s"key $k: got '$t', want '$want'")
    }
  }

  private implicit class Sortable(a: Array[(Long, String)]) {
    def toSorted: Seq[(Long, String)] = a.toSeq.sortBy(_._1)
  }
}
