package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

import graft.Tables

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (`fakeDecode*`): it derives metadata
  * purely from the byte length. Everything around it — the binary column,
  * schema, batch shape, partition-parallel decode via `mapPartitions` —
  * is real Spark plumbing that a codec drop-in would inherit unchanged.
  */
object MultimodalQueries {

  /** Output schema of the decode stage — what a real image decoder would
    * produce per row.
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType)))

  /** STUB — deterministic fake decode (no codecs in this environment).
    * A real implementation would parse the image header here; the Spark
    * contract (one row in, metadata out, executed partition-parallel) is
    * identical.
    */
  def fakeDecode(docId: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length
    Row(docId, n, n % 640, (n / 640) % 480 + 1,
      (n % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" })
  }

  /** Partition-parallel decode over a binary column — the mapPartitions
    * shape a Pandas-UDF / mapInPandas pipeline would use, minus the codec.
    */
  def decodeImages(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("doc_id"), col("payload")).rdd.mapPartitions {
      rows => rows.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  val defs: Seq[QueryDef] = Seq(

    // ── binary payload + metadata extraction (expression form) ──────
    QueryDef(
      "mm_binary_meta",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("payload", col("text").cast(BinaryType)) // opaque bytes
          .select(
            col("doc_id"),
            length(col("payload")).as("n_bytes"),
            (length(col("payload")) % 640).as("width"),
            (length(col("payload")) / 640 % 480 + 1).cast(IntegerType).as("height"),
            when(length(col("payload")) % 3 === 0, "png")
              .when(length(col("payload")) % 3 === 1, "jpeg")
              .otherwise("webp").as("format"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
          CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
          CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
          CAST(octet_length(encode(text)) // 640 % 480 + 1 AS INTEGER) AS height,
          CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
        FROM documents ORDER BY doc_id"""),
      doc = "Binary column + deterministic fake decode; codec is a stub by design."),

    // ── decode stage via mapPartitions (the codec drop-in seam) ──────
    QueryDef(
      "mm_decode_stub",
      (s, dir) =>
        decodeImages(
          Tables.load(s, dir, "documents")
            .withColumn("payload", col("text").cast(BinaryType)))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
          CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
          CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
          CAST(octet_length(encode(text)) // 640 % 480 + 1 AS INTEGER) AS height,
          CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
        FROM documents ORDER BY doc_id"""),
      doc = "Same metadata as mm_binary_meta but produced by the " +
        "partition-parallel mapPartitions decode stage — proves the " +
        "binary-column plumbing a real codec would drop into."),

    // ── content-addressable chunking of binary payloads ──────────────
    // How large media lands in a blob store at 100 TB: fixed-size byte
    // chunks, each addressed by its content hash (dedup + resumable
    // upload fall out of the addressing). Narrow generator pass, no
    // shuffle; chunk boundaries and hashes are byte-deterministic.
    QueryDef(
      "mm_chunk_binary",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("payload", col("text").cast(BinaryType))
          .withColumn("blen", length(col("payload")))
          .filter(col("blen") > 0)
          .select(col("doc_id"), col("blen"),
            posexplode(expr(
              "transform(sequence(0, cast(ceil(blen / 64.0) as int) - 1), i -> md5(substring(payload, i * 64 + 1, 64)))"))
              .as(Seq("chunk_idx", "chunk_md5")))
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH d AS (
          SELECT doc_id, text, octet_length(encode(text)) AS blen
          FROM documents WHERE octet_length(encode(text)) > 0)
        SELECT doc_id, blen, u.i AS chunk_idx,
          md5(substring(text, CAST(u.i * 64 + 1 AS BIGINT), 64)) AS chunk_md5
        FROM d, unnest(range(0, CAST(ceil(blen / 64.0) AS BIGINT))) u(i)
        ORDER BY doc_id, chunk_idx"""),
      doc = "64-byte chunks, md5-addressed. DuckDB has no BLOB substring, so " +
        "the oracle chunks the VARCHAR — equivalent because the fixture text " +
        "is pure ASCII (byte positions == char positions; verified: 0 " +
        "multi-byte docs at sf0.01)."),

    // ── frame-sampling shape: explode per-asset frame indexes ────────
    QueryDef(
      "mm_frame_sample",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("payload", col("text").cast(BinaryType))
          .withColumn("n_frames", (length(col("payload")) % 16 + 1))
          // sample every 4th frame — the video-pipeline batch shape
          .select(col("doc_id"), col("n_frames"),
            explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))
          .orderBy(col("doc_id"), col("frame_idx")),
      Some("""SELECT doc_id, CAST(n_frames AS INTEGER) AS n_frames,
          CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx
        FROM (SELECT doc_id, octet_length(encode(text)) % 16 + 1 AS n_frames FROM documents)
        ORDER BY doc_id, frame_idx"""))
  )
}
