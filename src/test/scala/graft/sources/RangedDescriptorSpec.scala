package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.SparkSpec

/** The cluster-real half of S15: a [[RangedDescriptor]] carried inside
  * every `InputPartition` lets a task open the store from serializable
  * state alone — this spec proves the read consults NO driver-JVM state
  * (the registry stays empty throughout) and that the descriptor
  * survives a java-serialization round trip, i.e. would deserialize in
  * an executor JVM that has never seen the driver's objects.
  */
class RangedDescriptorSpec extends SparkSpec {

  private def mkStore(n: Int): (String, JsonlDocumentStore) = {
    val dir = Files.createTempDirectory("graft_jsonl").toFile.getAbsolutePath
    val docs = (1 to n).map(i => Map[String, Any](
      "_id" -> i.toLong, "name" -> s"d$i", "score" -> i * 0.5, "flag" -> (i % 2 == 0)))
    JsonlStore.write(dir, docs, maxPerFile = 100)
    (dir, new JsonlDocumentStore(dir))
  }

  private def javaRoundTrip[A <: AnyRef](a: A): A = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(a); oos.close()
    val in = new ObjectInputStream(new ByteArrayInputStream(bos.toByteArray))
    try in.readObject().asInstanceOf[A] finally in.close()
  }

  test("JSONL store round-trips: order, line-count total, ranged fetch, typing") {
    val (_, store) = mkStore(250)
    assert(store.total() == 250)
    val r = store.fetchRange(95, 10) // spans the part-00000/part-00001 boundary
    assert(r.size == 10)
    assert(r.head("_id") == 96L && r.last("_id") == 105L)
    assert(r.head("name") == "d96")
    assert(r.head("score") == 48.0)
    assert(r.head("flag") == true)
    // range past the end truncates, empty range is empty
    assert(store.fetchRange(245, 100).size == 5)
    assert(store.fetchRange(0, 0).isEmpty)
  }

  test("descriptor-backed DSv2 read touches no driver-JVM state (registry empty throughout)") {
    val (_, store) = mkStore(500)
    val before = DocumentSourceRegistry.names
    val got = DocumentSource.toDFResilient(spark, store, batchSize = 120)
    assert(got.path == "ranged", s"expected descriptor rung, got ${got.path}")
    assert(got.registryName.isEmpty, "descriptor path must not register anything")
    assert(DocumentSourceRegistry.names == before)
    // partition-granular executor fetches: ceil(500/120) = 5 ranges
    assert(got.df.rdd.getNumPartitions == 5)
    assert(got.df.count() == 500)
    assert(DocumentSourceRegistry.names == before, "action must not register either")
    // rung semantics converge with the rest of the ladder
    assert(got.df.schema("id").dataType == StringType)
    assert(got.df.schema("score").dataType == DoubleType)
    assert(got.df.schema("flag").dataType == LongType) // bool-is-int rule
    val byId = got.df.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("96").getAs[String]("name") == "d96")
    assert(byId("96").getAs[Long]("flag") == 1L)
    assert(byId("497").getAs[Double]("score") == 248.5)
    // limit still caps planned ranges
    val capped = DocumentSource.toDFResilient(spark, store, batchSize = 120, limit = 130)
    assert(capped.path == "ranged" && capped.df.count() == 130)
    assert(capped.df.rdd.getNumPartitions == 2) // 120 + 10
  }

  test("the descriptor is self-contained: a java-serialized copy opens the store in isolation") {
    val (dir, store) = mkStore(40)
    // simulate the executor side: the descriptor crosses a JVM boundary
    // as bytes and must open the store with nothing else in scope
    val shipped = javaRoundTrip(JsonlDirDescriptor(dir): RangedDescriptor)
    val remote = shipped.open()
    assert(remote.total() == 40)
    assert(remote.fetchRange(10, 5) == store.fetchRange(10, 5))
    // the base64 envelope the scan options carry decodes the same way
    val enc = DocumentSourceV2.encodeDescriptor(JsonlDirDescriptor(dir))
    val df = spark.read.format("graft-docs")
      .option("descriptor", enc).option("batch-size", 16).load()
    assert(df.count() == 40)
  }

  test("edge cases: empty store reads as empty, ragged docs follow first-doc schema") {
    // empty directory → total 0, zero planned ranges, empty DataFrame
    val empty = Files.createTempDirectory("graft_jsonl_empty").toFile.getAbsolutePath
    JsonlStore.write(empty, Seq.empty)
    val es = new JsonlDocumentStore(empty)
    assert(es.total() == 0 && es.fetch().isEmpty)
    val got = DocumentSource.toDFResilient(spark, es)
    assert(got.path == "ranged" && got.df.count() == 0)
    // ragged documents: schema comes from the FIRST doc (run_example.py
    // semantics) — extra keys in later docs are dropped, missing keys
    // read as null, matching every other rung
    val ragged = Files.createTempDirectory("graft_jsonl_ragged").toFile.getAbsolutePath
    JsonlStore.write(ragged, Seq(
      Map[String, Any]("_id" -> 1L, "a" -> 10L, "b" -> "x"),
      Map[String, Any]("_id" -> 2L, "a" -> 20L, "b" -> "y", "extra" -> 99L),
      Map[String, Any]("_id" -> 3L, "b" -> "z")))
    val rs = DocumentSource.toDFResilient(spark, new JsonlDocumentStore(ragged))
    assert(rs.path == "ranged")
    assert(rs.df.columns.sorted.toSeq == Seq("a", "b", "id"))
    val rows = rs.df.collect().map(r =>
      r.getAs[String]("id") -> (Option(r.get(r.fieldIndex("a"))), r.getAs[String]("b"))).toMap
    assert(rows("2") == (Some(20L), "y")) // extra key dropped, no error
    assert(rows("3") == (None, "z"))      // missing key → null
  }

  test("a store whose descriptor fails at open() degrades at load(), not at first action") {
    // descriptor open() throws (bad dir) but the store's own fetch works:
    // the ranged rung degrades and the chain continues to plain
    val docs = (1 to 7).map(i => Map[String, Any]("_id" -> i.toLong, "v" -> i.toLong))
    val store = new DocumentSource with RangedFetch {
      def fetch(): Seq[Map[String, Any]] = docs
      def total(): Int = docs.size
      def fetchRange(start: Int, count: Int): Seq[Map[String, Any]] =
        docs.slice(start, start + count)
      override def descriptor: Option[RangedDescriptor] =
        Some(JsonlDirDescriptor("/nonexistent/graft_jsonl_missing"))
    }
    val before = DocumentSourceRegistry.names
    val got = DocumentSource.toDFResilient(spark, store)
    assert(got.path == "plain")
    assert(got.degraded.exists(_.startsWith("ranged:")))
    assert(got.df.count() == 7)
    assert(DocumentSourceRegistry.names == before)
  }
}
