package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Document-store source (SURVEY §2.1 S9) — the Mongo→Parquet direction.
  *
  * The reference fetches documents, renames the store's `_id` to a
  * string `id` column, infers a schema from the first document, and
  * writes parquet (examples/run_example.py:43-75, 168-199). Here the
  * store is behind a trait (no Mongo in this environment); the Spark
  * side — schema inference, row coercion, DataFrame construction — is
  * the real path a connector would feed.
  */
trait DocumentSource extends Serializable {
  def fetch(): Seq[Map[String, Any]]
}

/** Optional fast-path capability: the store hands back typed columns
  * directly (the pymongoarrow `find_arrow_all` analogue —
  * run_example.py:43-55). Schema comes from the store, not first-doc
  * inference, and no per-document map is materialized.
  */
trait ColumnarFetch { self: DocumentSource =>
  /** (schema, column-name → column values); all columns equal length. */
  def fetchColumnar(): (StructType, Map[String, Seq[Any]])
}

/** Optional mid-path capability: batched cursor iteration (the pandas
  * `DataFrame(list(cursor))`-in-chunks analogue — run_example.py:57-66).
  * Bounds driver memory when the store is large but not columnar-capable.
  */
trait BatchedFetch { self: DocumentSource =>
  def fetchBatches(batchSize: Int): Iterator[Seq[Map[String, Any]]]
}

object DocumentSource {

  /** A source view over a named in-memory sink store (tests + demos). */
  def inMemory(name: String): DocumentSource = new DocumentSource {
    def fetch(): Seq[Map[String, Any]] = InMemorySink(name).drain()
  }

  /** Fetch → rename `_id`→`id` (string) → infer schema from the FIRST
    * document (run_example.py:78-106 semantics) → DataFrame.
    */
  def toDF(spark: SparkSession, source: DocumentSource): DataFrame =
    fromDocs(spark, source.fetch())

  /** Which fetch path `toDFResilient` ended up on, for the caller's run
    * report (the reference logs its chosen path the same way).
    */
  final case class Fetched(df: DataFrame, path: String, degraded: Seq[String])

  /** Capability-probing fetch with graceful degradation, mirroring the
    * reference's chain: pymongoarrow `find_arrow_all` → pandas-over-cursor
    * → plain `find` (run_example.py:43-75). The fastest supported path is
    * tried first; a path that throws is recorded and the next one runs.
    * Every path converges on the same (`_id`→string `id`, §1.4-coerced)
    * DataFrame, so callers never see which rung served them.
    */
  def toDFResilient(spark: SparkSession, source: DocumentSource,
      batchSize: Int = 10000): Fetched = {
    val degraded = scala.collection.mutable.ArrayBuffer.empty[String]

    source match {
      case c: ColumnarFetch =>
        try {
          val (schema0, cols0) = c.fetchColumnar()
          // _id→id rename on schema AND columns; id forced to string
          val renamed = schema0.fields.map {
            case StructField("_id", _, n, m) => StructField("id", StringType, n, m)
            case f => f
          }
          val schema = normalizeIdField(StructType(renamed))
          val cols = cols0.map {
            case ("_id", vs) => "id" -> vs.map(String.valueOf(_: Any))
            case ("id", vs) => "id" -> vs.map(String.valueOf(_: Any))
            case kv => kv
          }
          val n = cols.headOption.map(_._2.size).getOrElse(0)
          require(cols.values.forall(_.size == n), "ragged columnar batch")
          // §1.4 coercion applies on this rung too — every rung must
          // converge on the same DataFrame, so a store handing back Int
          // where the schema says int64 (or datetimes for timestamp
          // fields) is normalized here, not rejected at action time.
          // Columns are resolved to IndexedSeq ONCE: positional access on
          // a linear Seq (a store returning Lists) would make the row
          // loop O(n²) per column, and the per-row Map lookups go too.
          val fields = schema.fields.toSeq
          val colArrs = fields.map(f => cols(f.name).toIndexedSeq)
          val rows = (0 until n).map { i =>
            org.apache.spark.sql.Row.fromSeq(
              fields.zip(colArrs).map { case (f, c) => TableIO.coerce(c(i), f.dataType) })
          }
          return Fetched(
            spark.createDataFrame(
              spark.sparkContext.parallelize(rows, math.max(1, n / 100000 + 1)),
              schema),
            "columnar", degraded.toSeq)
        } catch { case e: Exception =>
          degraded += s"columnar: ${Option(e.getMessage).getOrElse(e.getClass.getName)}"
        }
      case _ => ()
    }

    source match {
      case b: BatchedFetch =>
        try {
          // First batch drives schema inference (first-document semantics,
          // run_example.py:78-106); every batch is converted to coerced
          // Rows as it streams past, so only one batch of raw documents
          // is live at a time (the converted Rows — like the reference's
          // accumulated pandas chunks — are what the local DataFrame
          // construction inherently holds; a real connector would push
          // this into a DataSource so batches land on executors instead).
          val it = b.fetchBatches(batchSize)
          if (!it.hasNext)
            return Fetched(fromDocs(spark, Seq.empty), "cursor", degraded.toSeq)
          val first = it.next().map(renameId)
          val schema = normalizeIdField(SchemaInfer.inferSchema(first))
          val rows = Vector.newBuilder[org.apache.spark.sql.Row]
          rows ++= first.map(TableIO.toRow(schema, _))
          while (it.hasNext) rows ++= it.next().map(d => TableIO.toRow(schema, renameId(d)))
          val data = rows.result()
          return Fetched(
            spark.createDataFrame(
              spark.sparkContext.parallelize(data, math.max(1, data.size / 100000 + 1)),
              schema),
            "cursor", degraded.toSeq)
        } catch { case e: Exception =>
          degraded += s"cursor: ${Option(e.getMessage).getOrElse(e.getClass.getName)}"
        }
      case _ => ()
    }

    Fetched(fromDocs(spark, source.fetch()), "plain", degraded.toSeq)
  }

  private def renameId(d: Map[String, Any]): Map[String, Any] =
    d.get("_id") match {
      case Some(v) => d - "_id" + ("id" -> String.valueOf(v))
      case None => d
    }

  private def fromDocs(spark: SparkSession, raw: Seq[Map[String, Any]]): DataFrame = {
    val docs = raw.map(renameId)
    val schema = normalizeIdField(SchemaInfer.inferSchema(docs))
    val rows = docs.map(TableIO.toRow(schema, _))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 100000 + 1)),
      schema)
  }

  /** `id` is always a string after the `_id` rename (run_example.py:72-75),
    * even when the store's ids are numeric.
    */
  private def normalizeIdField(schema: StructType): StructType =
    StructType(schema.fields.map {
      case StructField("id", _, n, m) => StructField("id", StringType, n, m)
      case f => f
    })
}
