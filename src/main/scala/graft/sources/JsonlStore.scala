package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

/** Directory-of-JSONL document store — the concrete, file-backed
  * [[RangedFetch]] whose [[RangedDescriptor]] is just a path. This is
  * the shape a wire connector's connection-options factory takes
  * (host/collection → here, a directory): everything a task needs to
  * open the store rides in the serializable descriptor, so the DSv2
  * scan works across JVM boundaries with no driver-side registry.
  *
  * Layout: `part-NNNNN.jsonl` files, one JSON document per line; the
  * store's stable order is (file name ascending, line number). `total()`
  * and `fetchRange` follow from per-file line counts, indexed once per
  * open — a real store serves these from server-side counts/offsets
  * instead of a line scan, but the range SEMANTICS are identical.
  *
  * JSON ↔ document typing follows the engine's §1.4/first-doc rules:
  * integral numbers → Long (int64), fractional → Double, booleans stay
  * Boolean (schema inference types them int64 via the bool-is-int rule,
  * run_example.py:93), everything else → String.
  */
object JsonlStore {

  // ObjectMapper is thread-safe once configured; shared per JVM
  private val mapper = new ObjectMapper()

  /** Write documents as a JSONL directory readable by
    * [[JsonlDocumentStore]]; `maxPerFile` bounds lines per part file
    * (the chunked-write shape of SURVEY §2.1 S4).
    */
  def write(dir: String, docs: Seq[Map[String, Any]], maxPerFile: Int = 10000): Unit = {
    require(maxPerFile > 0, s"maxPerFile must be > 0, got $maxPerFile")
    val d = Paths.get(dir)
    Files.createDirectories(d)
    docs.grouped(maxPerFile).zipWithIndex.foreach { case (chunk, i) =>
      val lines = chunk.map(m => mapper.writeValueAsString(toJava(m)))
      Files.write(d.resolve(f"part-$i%05d.jsonl"),
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    }
  }

  /** One document → one JSON line (the staging writer's row format). */
  private[sources] def toJsonLine(doc: Map[String, Any]): String =
    mapper.writeValueAsString(toJava(doc))

  private def toJava(v: Any): Any = v match {
    case m: Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, x) => out.put(String.valueOf(k), toJava(x)) }
      out
    case s: Seq[_] =>
      val out = new java.util.ArrayList[Any](s.size)
      s.foreach(x => out.add(toJava(x)))
      out
    case other => other
  }

  /** JSON value → the document-value domain SchemaInfer/TableIO.coerce
    * understand (integral → Long, fractional → Double).
    */
  private[sources] def fromJson(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, x) => String.valueOf(k) -> fromJson(x) }.toMap
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.map(fromJson).toSeq
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
    case bi: java.math.BigInteger => bi.longValue()
    case d: java.lang.Double => d.doubleValue()
    case f: java.lang.Float => f.doubleValue()
    case bd: java.math.BigDecimal => bd.doubleValue()
    case other => other // String, Boolean, null pass through
  }

  private[sources] def parseLine(line: String): Map[String, Any] =
    fromJson(mapper.readValue(line, classOf[java.util.Map[_, _]]))
      .asInstanceOf[Map[String, Any]]
}

/** Write half of a document-store connector: EXECUTOR tasks stream their
  * partition's documents into store-side staging (a wire connector's
  * buffered bulk writes), the DRIVER applies the staged batches as one
  * keyed upsert at commit (the connector's transaction finalize). Task
  * retries are safe by construction — only the tokens of COMMITTED tasks
  * reach `commitUpsert`, and everything else in the write's staging area
  * is discarded there.
  */
trait StagedDocumentWrite { self: DocumentSource =>

  /** Open a streaming staged batch for one task attempt. `taskToken`
    * must be unique per attempt (partitionId + taskId); the returned
    * writer is single-threaded, used from exactly one task.
    */
  def openStagedBatch(writeId: String, taskToken: String): StagedBatchWriter

  /** Apply the staged batches named by `tokens` (in order) as a keyed
    * upsert: existing documents keep their stable-order position and are
    * replaced in place on key match (last writer wins across tokens);
    * new keys append in token order. `truncate` drops the existing
    * contents first (overwrite mode). Cleans the write's whole staging
    * area, including leftovers from failed attempts. Returns
    * (inserted, updated, totalAfter).
    */
  def commitUpsert(writeId: String, keyField: String, tokens: Seq[String],
      truncate: Boolean): (Long, Long, Long)

  /** Discard every staged batch of this write. */
  def abortWrite(writeId: String): Unit
}

/** Streaming writer for one task's staged batch. */
trait StagedBatchWriter {
  def add(doc: Map[String, Any]): Unit
  /** Finish and return the batch's token for the commit message. */
  def finish(): String
  /** Best-effort cleanup of this attempt's staging. */
  def abort(): Unit
}

/** The serializable recipe: a path is all a task needs. */
final case class JsonlDirDescriptor(dir: String) extends RangedDescriptor {
  def open(): DocumentSource with RangedFetch = new JsonlDocumentStore(dir)
}

/** See [[JsonlStore]] for the layout and typing rules. Thread-safe:
  * `fetchRange` opens its own reader per call, and the file index is
  * built once under lazy-val initialization.
  */
final class JsonlDocumentStore(dir: String)
    extends DocumentSource with RangedFetch with StagedDocumentWrite {

  override def descriptor: Option[RangedDescriptor] = Some(JsonlDirDescriptor(dir))

  /** (file, lineCount) in stable (file-name) order. A wire connector
    * gets these from server-side counts; here it is one line scan per
    * open. A missing directory is an ERROR on the read side (a typo'd
    * path must not read as an empty store); the WRITE side never hits
    * this on a fresh store — staging creates the directory before any
    * index access, so first-write-into-nothing works.
    */
  private lazy val index: Seq[(File, Int)] = {
    val d = new File(dir)
    require(d.isDirectory, s"not a JSONL store directory: $dir")
    d.listFiles((_, n) => n.endsWith(".jsonl")).sortBy(_.getName).toSeq
      .map { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try f -> src.getLines().count(_.nonEmpty) finally src.close()
      }
  }

  def total(): Int = index.map(_._2).sum

  def fetchRange(start: Int, count: Int): Seq[Map[String, Any]] = {
    require(start >= 0 && count >= 0, s"bad range ($start, $count)")
    val out = Seq.newBuilder[Map[String, Any]]
    var skip = start
    var remaining = count
    val files = index.iterator
    while (remaining > 0 && files.hasNext) {
      val (f, n) = files.next()
      if (skip >= n) skip -= n
      else {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try {
          val it = src.getLines().filter(_.nonEmpty).drop(skip)
          skip = 0
          while (remaining > 0 && it.hasNext) {
            out += JsonlStore.parseLine(it.next())
            remaining -= 1
          }
        } finally src.close()
      }
    }
    out.result()
  }

  def fetch(): Seq[Map[String, Any]] = fetchRange(0, total())

  // ── StagedDocumentWrite: task-side staging, driver-side upsert ─────
  // Staging lives under `<dir>/.staging-<writeId>/<token>.jsonl`; the
  // part-file index above only matches `*.jsonl` in the TOP directory,
  // so in-flight writes are invisible to concurrent reads. The commit
  // swap (delete old parts, move new ones in) is not atomic across
  // files — the single-writer contract a directory store can offer; a
  // wire store gets atomicity from its server's transaction instead.

  private def stagingDir(writeId: String) =
    Paths.get(dir, s".staging-$writeId")

  override def openStagedBatch(writeId: String, taskToken: String): StagedBatchWriter = {
    val sd = stagingDir(writeId)
    Files.createDirectories(sd)
    val target = sd.resolve(s"$taskToken.jsonl")
    val out = Files.newBufferedWriter(target, StandardCharsets.UTF_8)
    new StagedBatchWriter {
      def add(doc: Map[String, Any]): Unit = {
        out.write(JsonlStore.toJsonLine(doc)); out.write('\n')
      }
      def finish(): String = { out.close(); s"$taskToken.jsonl" }
      def abort(): Unit = {
        try out.close() catch { case _: Throwable => () }
        try Files.deleteIfExists(target) catch { case _: Throwable => () }
        ()
      }
    }
  }

  override def commitUpsert(writeId: String, keyField: String,
      tokens: Seq[String], truncate: Boolean): (Long, Long, Long) = {
    val sd = stagingDir(writeId)
    def readStaged(token: String): Seq[Map[String, Any]] = {
      val src = scala.io.Source.fromFile(sd.resolve(token).toFile, "UTF-8")
      try src.getLines().filter(_.nonEmpty).map(JsonlStore.parseLine).toList
      finally src.close()
    }
    def keyOf(doc: Map[String, Any], origin: String): Any = {
      val k = doc.getOrElse(keyField,
        throw new IllegalArgumentException(
          s"upsert key '$keyField' missing in a document from $origin"))
      require(k != null, s"upsert key '$keyField' is null in a document from $origin")
      k
    }
    // LinkedHashMap IS the upsert semantics: existing docs seed the
    // order, key matches replace in place, new keys append — the same
    // observable contract as the reference's ordered bulk upsert
    val merged = scala.collection.mutable.LinkedHashMap[Any, Map[String, Any]]()
    if (!truncate)
      fetch().foreach(d => merged.put(keyOf(d, "the existing store"), d))
    val existingKeys = merged.keySet.toSet
    val insertedKeys = scala.collection.mutable.Set[Any]()
    val updatedKeys = scala.collection.mutable.Set[Any]()
    tokens.foreach { token =>
      readStaged(token).foreach { d =>
        val k = keyOf(d, s"staged batch $token")
        if (existingKeys(k)) updatedKeys += k else insertedKeys += k
        merged.put(k, d)
      }
    }
    val inserted = insertedKeys.size.toLong
    val updated = updatedKeys.size.toLong
    // swap: fresh part files replace the old set (old tail files beyond
    // the new count are deleted too — the rewrite renumbers from zero)
    val oldParts = Option(new File(dir).listFiles((_, n) => n.endsWith(".jsonl")))
      .map(_.toSeq).getOrElse(Seq.empty)
    oldParts.foreach(f => Files.deleteIfExists(f.toPath))
    JsonlStore.write(dir, merged.values.toSeq)
    abortWrite(writeId) // staging cleanup, incl. failed-attempt leftovers
    (inserted, updated, merged.size.toLong)
  }

  override def abortWrite(writeId: String): Unit = {
    val sd = stagingDir(writeId)
    if (Files.isDirectory(sd)) {
      Option(sd.toFile.listFiles()).foreach(_.foreach(f =>
        try Files.deleteIfExists(f.toPath) catch { case _: Throwable => () }))
      try Files.deleteIfExists(sd) catch { case _: Throwable => () }
    }
    ()
  }
}
