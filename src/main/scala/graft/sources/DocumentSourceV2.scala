package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
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
  *
  * Stability contract: `total()` and the document ORDER must be stable
  * for the lifetime of a read. The scan captures `total()` ONCE at scan
  * build, so planning and execution agree within one action; a store
  * mutated between two actions is re-planned, but one mutated DURING an
  * action yields range contents the contract does not define.
  */
trait RangedFetch { self: DocumentSource =>
  /** Total documents in the store's stable order. */
  def total(): Int
  /** Documents [start, start+count) of that order. Called from executor
    * tasks — implementations must be thread-safe.
    */
  def fetchRange(start: Int, count: Int): Seq[Map[String, Any]]
  /** Serializable recipe for re-opening this store on an EXECUTOR —
    * the connection-options shape a wire connector ships to tasks
    * (host/collection/credentials; here a directory path). Stores that
    * provide one get the cluster-real DSv2 path: tasks resolve the
    * store from the shipped descriptor alone, with no driver-JVM state.
    * Stores that return None fall back to the JVM-local
    * [[DocumentSourceRegistry]], which only works when driver and
    * executors share a process (local mode).
    */
  def descriptor: Option[RangedDescriptor] = None
}

/** Serializable recipe for constructing a [[RangedFetch]] client inside
  * an executor task. Implementations must be self-contained: `open()`
  * may only rely on state carried by the descriptor itself (paths,
  * connection options) — never on driver-JVM objects. `open()` is called
  * once per partition reader; implementations should make it cheap or
  * internally cached.
  */
trait RangedDescriptor extends Serializable {
  def open(): DocumentSource with RangedFetch
}

/** Name → source registry, per JVM — the LOCAL-MODE fallback for ranged
  * stores that cannot describe themselves serializably (closures over
  * test fixtures). On a real cluster executor tasks run in other JVMs
  * where this registry is empty, so the DSv2 scan only uses it when the
  * store offers no [[RangedDescriptor]].
  *
  * Lifecycle: `registerAnonymous` names are minted from a process-wide
  * counter (collision-free) and returned to the caller via
  * [[DocumentSource.Fetched.registryName]]; the registry holds a strong
  * reference until the caller `remove`s the name after materializing
  * the DataFrame.
  */
object DocumentSourceRegistry {
  private val sources = new ConcurrentHashMap[String, DocumentSource with RangedFetch]()
  private val anonIds = new AtomicLong()

  def register(name: String, src: DocumentSource with RangedFetch): Unit =
    sources.put(name, src)

  /** Register under a fresh counter-minted name; returns the name. */
  def registerAnonymous(src: DocumentSource with RangedFetch): String = {
    val name = s"resilient-${anonIds.incrementAndGet()}"
    register(name, src)
    name
  }

  def apply(name: String): DocumentSource with RangedFetch = {
    val s = sources.get(name)
    require(s != null, s"no ranged document source registered as '$name'")
    s
  }

  def remove(name: String): Unit = { sources.remove(name); () }

  /** Currently registered names (diagnostics + leak checks in specs). */
  def names: Set[String] = {
    import scala.jdk.CollectionConverters._
    sources.keySet().asScala.toSet
  }
}

/** DataSource V2 batch read over a [[RangedFetch]] document store:
  * `spark.read.format("graft-docs").option(...)`.
  *
  * Options (exactly one of `descriptor` / `source` is required):
  *  - `descriptor`: base64 of a java-serialized [[RangedDescriptor]]
  *    (see [[DocumentSourceV2.encodeDescriptor]]) — the CLUSTER-REAL
  *    path: each task deserializes the descriptor from its own
  *    `InputPartition` and opens the store itself, so no driver-JVM
  *    state is consulted anywhere in the scan
  *  - `source`: [[DocumentSourceRegistry]] name — local-mode fallback
  *    for stores without a descriptor
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
    DocumentSourceV2.inferredSchema(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new DocumentSourceV2.DocsTable(
      DocumentSourceV2.resolverFrom(new CaseInsensitiveStringMap(properties)),
      schema, properties)
}

object DocumentSourceV2 {

  /** Serialize a descriptor for the `descriptor` reader option. DSv2
    * options are strings, so the descriptor rides as base64 — the same
    * envelope a wire connector uses for its connection-options blob.
    */
  def encodeDescriptor(d: RangedDescriptor): String = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    try oos.writeObject(d) finally oos.close()
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  private def decodeDescriptor(s: String): RangedDescriptor = {
    val in = new ObjectInputStream(
      new ByteArrayInputStream(java.util.Base64.getDecoder.decode(s)))
    try in.readObject().asInstanceOf[RangedDescriptor] finally in.close()
  }

  /** How a scan (and each of its tasks) reaches the store. Serializable:
    * one of these rides inside every [[DocsRange]] shipped to a task.
    */
  private[sources] sealed trait DocsResolver extends Serializable {
    def open(): DocumentSource with RangedFetch
    def describe: String
  }
  /** Cluster-real: the descriptor is self-contained, tasks need no
    * driver-JVM state.
    */
  private[sources] final case class ByDescriptor(d: RangedDescriptor)
      extends DocsResolver {
    def open(): DocumentSource with RangedFetch = d.open()
    def describe: String = s"descriptor=${d.getClass.getSimpleName}"
  }
  /** Local-mode fallback: resolves the per-JVM registry — documented as
    * driver-and-executors-share-a-JVM only.
    */
  private[sources] final case class ByRegistry(name: String)
      extends DocsResolver {
    def open(): DocumentSource with RangedFetch = DocumentSourceRegistry(name)
    def describe: String = s"source=$name"
  }

  private def resolverFrom(options: CaseInsensitiveStringMap): DocsResolver = {
    val desc = Option(options.get("descriptor"))
    val name = Option(options.get("source"))
    (desc, name) match {
      case (Some(d), _) => ByDescriptor(decodeDescriptor(d))
      case (None, Some(n)) => ByRegistry(n)
      case (None, None) => throw new IllegalArgumentException(
        "one of options 'descriptor' (base64 RangedDescriptor) or " +
          "'source' (DocumentSourceRegistry name) is required")
    }
  }

  private def batchSize(options: CaseInsensitiveStringMap): Int = {
    val b = options.getInt("batch-size", 10000)
    require(b > 0, s"batch-size must be > 0, got $b")
    b
  }

  /** First-document schema inference through the shared rename/normalize
    * path — only the first batch is pulled, never the whole store. An
    * EMPTY store infers an empty schema (zero planned ranges → empty
    * DataFrame, the ladder's contract) unless `write-schema` (a DDL
    * string) names one. Writes never consult this — the provider's
    * `supportsExternalMetadata` hands the df's schema straight to
    * `getTable`, so a fresh store accepts its first write with no
    * inference and no options.
    */
  private def inferredSchema(options: CaseInsensitiveStringMap): StructType = {
    val explicit = Option(options.get("write-schema")).map(StructType.fromDDL)
    val resolver = resolverFrom(options)
    val store = resolver.open()
    if (store.total() == 0 && explicit.isDefined) explicit.get
    else {
      val first = store.fetchRange(0, math.min(batchSize(options),
        math.max(store.total(), 1))).map(DocumentSource.renameId)
      DocumentSource.normalizeIdSchema(SchemaInfer.inferSchema(first))
    }
  }

  private final class DocsTable(resolver: DocsResolver, tableSchema: StructType,
      properties: java.util.Map[String, String])
      extends Table with SupportsRead with SupportsWrite {
    override def name(): String = s"graft-docs:${resolver.describe}"
    override def schema(): StructType = tableSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

    /** Writes need a store reachable from EXECUTOR tasks, so only the
      * descriptor route qualifies — a registry name is driver-JVM state
      * by definition (and the write must also survive the commit, which
      * re-opens the store on the driver).
      */
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      resolver match {
        case ByDescriptor(d) => new DocumentWriteV2.DocsWriteBuilder(d, info)
        case ByRegistry(n) => throw new IllegalArgumentException(
          s"graft-docs writes require the 'descriptor' option (registry " +
            s"source '$n' is driver-JVM state; tasks could not reach it " +
            "on a real cluster)")
      }
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
      // DataFrameReader options arrive via getTable's properties on the
      // inferSchema path; merge both so either wiring works
      val merged = new java.util.HashMap[String, String](properties)
      merged.putAll(options)
      val opts = new CaseInsensitiveStringMap(merged)
      val limit = if (opts.containsKey("limit")) opts.getInt("limit", Int.MaxValue)
        else Int.MaxValue
      require(limit >= 0, s"limit must be >= 0, got $limit")
      new DocsScan(resolver, tableSchema, batchSize(opts), limit)
    }
  }

  private final class DocsScan(resolver: DocsResolver, scanSchema: StructType,
      batch: Int, limit: Int) extends ScanBuilder with Scan with Batch {
    override def build(): Scan = this
    override def readSchema(): StructType = scanSchema
    override def description(): String =
      s"graft-docs ${resolver.describe} batch=$batch" +
        (if (limit != Int.MaxValue) s" limit=$limit" else "")
    override def toBatch: Batch = this

    // total is captured ONCE per scan, so partition planning and task
    // execution agree even if the store grows between load() and the
    // action (the RangedFetch stability contract covers order; this
    // pins the size)
    private lazy val totalAtBuild = math.min(resolver.open().total(), limit)

    override def planInputPartitions(): Array[InputPartition] = {
      // the limit caps the PLANNED ranges — documents past it are never
      // requested from the store, let alone shipped
      val n = totalAtBuild
      (0 until n by batch)
        .map(s => DocsRange(resolver, s, math.min(batch, n - s)): InputPartition)
        .toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new DocsReaderFactory(scanSchema)
  }

  /** The unit shipped to a task: the resolver IS the partition's route
    * to the store — with a [[ByDescriptor]] resolver the range is fully
    * self-contained and deserializes into any JVM.
    */
  private final case class DocsRange(resolver: DocsResolver, start: Int, len: Int)
      extends InputPartition

  private final class DocsReaderFactory(schema: StructType)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val range = p.asInstanceOf[DocsRange]
      new PartitionReader[InternalRow] {
        private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
        // the range fetch happens HERE, inside the task — this iterator
        // is the only copy of these documents anywhere in the job, and
        // the store is opened from the range's own resolver (descriptor
        // path: zero driver-JVM state)
        private lazy val docs = range.resolver.open()
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
