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

object DocumentSource {

  /** A source view over a named in-memory sink store (tests + demos). */
  def inMemory(name: String): DocumentSource = new DocumentSource {
    def fetch(): Seq[Map[String, Any]] = InMemorySink(name).drain()
  }

  /** Fetch → rename `_id`→`id` (string) → infer schema from the FIRST
    * document (run_example.py:78-106 semantics) → DataFrame.
    */
  def toDF(spark: SparkSession, source: DocumentSource): DataFrame = {
    val docs = source.fetch().map { d =>
      d.get("_id") match {
        case Some(v) => d - "_id" + ("id" -> String.valueOf(v))
        case None => d
      }
    }
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
