package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming side of the `graft-docs` DSv2 connector (S16's streaming
  * direction): micro-batches of documents flow through `foreachBatch`
  * into the connector's staged keyed upsert — the cluster-real form of
  * the reference's threaded parquet→store ingest loop
  * (examples/ingest_parquet_to_mongo_stream.py:130-160), which batches
  * rows into per-thread bulk upserts as files arrive.
  *
  * Exactly-once-per-key convergence across restarts comes from the two
  * layers composing:
  *  - the stream checkpoint replays AT-LEAST-once: after a crash the
  *    last possibly-uncommitted micro-batch re-runs with the SAME
  *    batchId and the same file set (file source offsets are the
  *    checkpoint);
  *  - the sink write is a keyed UPSERT (DocumentWriteV2): re-applying a
  *    batch replaces the same keys with the same values — convergent,
  *    never duplicating. Staged leftovers from a killed mid-flight
  *    write are swept by the store's next commit.
  * So the store converges to exactly the batch answer no matter where
  * the stream is killed (StreamingUpsertRecoverySpec kills between
  * batches and replays a batch manually).
  *
  * At 100 TB this is the production ingest topology: executors stage
  * partition-sized JSONL batches against the store from the shipped
  * descriptor (no driver state), the driver finalizes one keyed upsert
  * per micro-batch, and checkpoint offsets make restart safe.
  */
object DocumentUpsertStream {

  /** Start a checkpointed upsert stream: every micro-batch of `docs`
    * becomes one `graft-docs` keyed-upsert write.
    *
    * @param docs          streaming DataFrame (e.g.
    *                      [[DocumentStreams.readDocuments]])
    * @param descriptorB64 base64 [[graft.sources.RangedDescriptor]] of a
    *                      store implementing StagedDocumentWrite
    * @param checkpointDir durable checkpoint location — restart with the
    *                      SAME path to resume from committed offsets
    * @param key           upsert key field
    */
  def start(docs: DataFrame, descriptorB64: String, checkpointDir: String,
      key: String = "id"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.format("graft-docs")
          .option("descriptor", descriptorB64)
          .option("key", key)
          .mode("append")
          .save()
      }
      .start()
}
