package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Top capability of the document-source ladder: server-side RANGE
  * addressing — a stable total order with (start, count) reads, which is
  * what a real store connector gets from range/shard cursors or split
  * vectors (the Mongo connector's partitioner does exactly this). This
  * is the capability that unlocks the DataSource V2 read path below:
  * each Spark partition fetches ITS OWN range on an executor, so driver
  * memory is O(1) in the dataset — the structural fix for the cursor
  * rung's driver-side Row accumulation (see the note in
  * [[DocumentSource.toDFResilient]]).
  */
trait RangedFetch { self: DocumentSource =>
  /** Total documents in the store's stable order. */
  def total(): Int
  /** Documents [start, start+count) of that order. Called from executor
    * tasks — implementations must be thread-safe.
    */
  def fetchRange(start: Int, count: Int): Seq[Map[String, Any]]
}

/** Name → source registry resolved at READ time, per JVM. The DSv2 scan
  * ships only (name, range) to tasks; in local mode tasks resolve the
  * same in-process object, and on a real cluster a wire connector would
  * resolve a CLIENT from serializable connection options here — the
  * registry is the seam where that client factory plugs in.
  */
object DocumentSourceRegistry {
  private val sources = new ConcurrentHashMap[String, DocumentSource with RangedFetch]()

  def register(name: String, src: DocumentSource with RangedFetch): Unit =
    sources.put(name, src)

  def apply(name: String): DocumentSource with RangedFetch = {
    val s = sources.get(name)
    require(s != null, s"no ranged document source registered as '$name'")
    s
  }

  def remove(name: String): Unit = { sources.remove(name); () }
}

/** DataSource V2 batch read over a [[RangedFetch]] document store:
  * `spark.read.format("graft-docs").option("source", name).load()`.
  *
  * Options:
  *  - `source` (required): [[DocumentSourceRegistry]] name
  *  - `batch-size` (default 10000): documents per input partition — the
  *    DSv2 analogue of the reference CLIs' `--batch-size`
  *  - `limit` (optional): cap on fetched documents, applied at PARTITION
  *    PLANNING time (ranges past the cap are never created, the
  *    server-side shape of run_example.py:152's `--limit`)
  *
  * Semantics match every other rung: `_id`→string `id` rename, schema
  * from the FIRST document, §1.4 value coercion per row. The scan plans
  * ceil(min(total, limit)/batch) partitions; each task converts its own
  * range straight to InternalRows — nothing dataset-sized ever
  * materializes on the driver, and the fetch parallelism is the Spark
  * task parallelism (the reference's `--max-workers` thread pool,
  * without the pool).
  */
class DocumentSourceV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-docs"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocumentSourceV2.inferredSchema(
      options.get("source"),
      DocumentSourceV2.batchSize(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val source = properties.get("source")
    require(source != null, "option 'source' is required (a DocumentSourceRegistry name)")
    new DocumentSourceV2.DocsTable(source, schema, properties)
  }
}

object DocumentSourceV2 {

  private def batchSize(options: CaseInsensitiveStringMap): Int = {
    val b = options.getInt("batch-size", 10000)
    require(b > 0, s"batch-size must be > 0, got $b")
    b
  }

  /** First-document schema inference through the shared rename/normalize
    * path — only the first batch is pulled, never the whole store.
    */
  private def inferredSchema(source: String, batch: Int): StructType = {
    require(source != null, "option 'source' is required (a DocumentSourceRegistry name)")
    val store = DocumentSourceRegistry(source)
    val first = store.fetchRange(0, math.min(batch, math.max(store.total(), 1)))
      .map(DocumentSource.renameId)
    DocumentSource.normalizeIdSchema(SchemaInfer.inferSchema(first))
  }

  private final class DocsTable(source: String, tableSchema: StructType,
      properties: java.util.Map[String, String]) extends Table with SupportsRead {
    override def name(): String = s"graft-docs:$source"
    override def schema(): StructType = tableSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
      // DataFrameReader options arrive via getTable's properties on the
      // inferSchema path; merge both so either wiring works
      val merged = new java.util.HashMap[String, String](properties)
      merged.putAll(options)
      val opts = new CaseInsensitiveStringMap(merged)
      val limit = if (opts.containsKey("limit")) opts.getInt("limit", Int.MaxValue)
        else Int.MaxValue
      require(limit >= 0, s"limit must be >= 0, got $limit")
      new DocsScan(source, tableSchema, batchSize(opts), limit)
    }
  }

  private final class DocsScan(source: String, scanSchema: StructType,
      batch: Int, limit: Int) extends ScanBuilder with Scan with Batch {
    override def build(): Scan = this
    override def readSchema(): StructType = scanSchema
    override def description(): String =
      s"graft-docs source=$source batch=$batch" +
        (if (limit != Int.MaxValue) s" limit=$limit" else "")
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      // the limit caps the PLANNED ranges — documents past it are never
      // requested from the store, let alone shipped
      val n = math.min(DocumentSourceRegistry(source).total(), limit)
      (0 until n by batch)
        .map(s => DocsRange(source, s, math.min(batch, n - s)): InputPartition)
        .toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new DocsReaderFactory(scanSchema)
  }

  private final case class DocsRange(source: String, start: Int, len: Int)
      extends InputPartition

  private final class DocsReaderFactory(schema: StructType)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val range = p.asInstanceOf[DocsRange]
      new PartitionReader[InternalRow] {
        private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
        // the range fetch happens HERE, inside the task — this iterator
        // is the only copy of these documents anywhere in the job
        private lazy val docs = DocumentSourceRegistry(range.source)
          .fetchRange(range.start, range.len).iterator
        private var current: InternalRow = _
        override def next(): Boolean =
          if (docs.hasNext) {
            val d = DocumentSource.renameId(docs.next())
            current = toCatalyst(TableIO.toRow(schema, d)).asInstanceOf[InternalRow]
            true
          } else false
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
  }
}
