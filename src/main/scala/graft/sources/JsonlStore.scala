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

/** The serializable recipe: a path is all a task needs. */
final case class JsonlDirDescriptor(dir: String) extends RangedDescriptor {
  def open(): DocumentSource with RangedFetch = new JsonlDocumentStore(dir)
}

/** See [[JsonlStore]] for the layout and typing rules. Thread-safe:
  * `fetchRange` opens its own reader per call, and the file index is
  * built once under lazy-val initialization.
  */
final class JsonlDocumentStore(dir: String) extends DocumentSource with RangedFetch {

  override def descriptor: Option[RangedDescriptor] = Some(JsonlDirDescriptor(dir))

  /** (file, lineCount) in stable (file-name) order. A wire connector
    * gets these from server-side counts; here it is one line scan per
    * open.
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
}
