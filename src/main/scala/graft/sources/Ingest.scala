package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

/** Batch ingest pipelines (SURVEY §2.1 S6, S7, S10).
  *
  * The reference's thread-pool + bounded-queue pipelining
  * (examples/ingest_parquet_to_mongo_bulk.py:144-157) is replaced by
  * Spark's task parallelism: `foreachPartition` runs one sink writer per
  * partition concurrently, and batching inside the partition bounds
  * memory exactly like `iter_batches(batch_size)` did. Metrics that the
  * reference collected per batch (rows/sec, write ms —
  * ingest_parquet_to_mongo_bulk.py:36-42) are Spark accumulators here so
  * they aggregate across executors.
  */
object Ingest {

  final case class Metrics(rows: Long, batches: Long, writeMs: Long) {
    def rowsPerSec: Double = if (writeMs == 0) 0.0 else rows * 1000.0 / writeMs
  }

  private def rowToMap(r: Row): Map[String, Any] =
    r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap

  /** S6: batched insert. `dryRun` mirrors the reference's preview mode
    * (prints ≤5 docs, no writes — ingest_parquet_to_mongo.py:83-89).
    */
  def ingest(df: DataFrame, sinkName: String, batchSize: Int = 1000,
      dryRun: Boolean = false): Metrics = {
    if (dryRun) {
      df.show(5, truncate = false)
      return Metrics(df.count(), 0, 0)
    }
    val sc = df.sparkSession.sparkContext
    val rowsAcc = sc.longAccumulator("ingest.rows")
    val batchAcc = sc.longAccumulator("ingest.batches")
    val msAcc = sc.longAccumulator("ingest.writeMs")
    df.foreachPartition { it: Iterator[Row] =>
      val sink = InMemorySink(sinkName)
      it.grouped(batchSize).foreach { batch =>
        val t0 = System.nanoTime()
        val n = sink.insertMany(batch.map(rowToMap))
        msAcc.add((System.nanoTime() - t0) / 1000000L)
        rowsAcc.add(n.toLong)
        batchAcc.add(1L)
      }
    }
    Metrics(rowsAcc.value, batchAcc.value, msAcc.value)
  }

  /** S7: idempotent keyed upsert — rerunning the same ingest leaves the
    * store unchanged, which is why the reference offers `--upsert` as its
    * retry-safety story (README.md:102).
    */
  def bulkUpsert(df: DataFrame, sinkName: String, pk: Seq[String],
      batchSize: Int = 10000): Metrics = {
    val sc = df.sparkSession.sparkContext
    val rowsAcc = sc.longAccumulator("upsert.rows")
    val batchAcc = sc.longAccumulator("upsert.batches")
    val msAcc = sc.longAccumulator("upsert.writeMs")
    df.foreachPartition { it: Iterator[Row] =>
      val sink = InMemorySink(sinkName)
      it.grouped(batchSize).foreach { batch =>
        val t0 = System.nanoTime()
        val (ins, repl) = sink.bulkUpsert(pk, batch.map(rowToMap))
        msAcc.add((System.nanoTime() - t0) / 1000000L)
        rowsAcc.add((ins + repl).toLong)
        batchAcc.add(1L)
      }
    }
    Metrics(rowsAcc.value, batchAcc.value, msAcc.value)
  }
}
