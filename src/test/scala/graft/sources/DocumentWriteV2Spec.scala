package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSv2 write path: `df.write.format("graft-docs")` as a keyed upsert
  * into a [[StagedDocumentWrite]] store. The cluster-real contract under
  * test: tasks reach the store ONLY through the serializable descriptor
  * (the registry stays empty for the whole round trip), writes stream
  * through store-side staging, and the commit applies upsert-by-key —
  * so re-running a write converges instead of duplicating, the
  * reference's bulk-upsert idempotency (bulk.py:108-113).
  */
class DocumentWriteV2Spec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft_w2_").resolve("store").toString

  private def enc(dir: String): String =
    DocumentSourceV2.encodeDescriptor(JsonlDirDescriptor(dir))

  private def readBack(dir: String) =
    spark.read.format("graft-docs").option("descriptor", enc(dir)).load()

  test("round trip: DSv2 write into a fresh store, DSv2 read back, registry empty throughout") {
    val dir = freshDir()
    val before = DocumentSourceRegistry.names
    import spark.implicits._
    val df = (1 to 2500).map(i => (i.toLong, s"doc $i", i * 0.5, i % 2 == 0))
      .toDF("id", "name", "score", "flag")
    // no schema option anywhere: supportsExternalMetadata ships the
    // df's schema to getTable, so a FRESH store needs no inference
    df.write.format("graft-docs")
      .option("descriptor", enc(dir))
      .mode("append").save()

    val back = readBack(dir)
    assert(back.count() == 2500)
    // multiple part files (JsonlStore default 10000/file caps at 1) is
    // not the point — the ROWS must round-trip exactly; id reads back as
    // the ladder's string id
    val r7 = back.filter(col("id") === "7").collect().head
    assert(r7.getAs[String]("name") == "doc 7")
    assert(r7.getAs[Double]("score") == 3.5)
    assert(DocumentSourceRegistry.names == before,
      "the write or read leaked driver-JVM registry state")
  }

  test("append mode is a keyed upsert: matches replace in place, new keys append, rerun is idempotent") {
    val dir = freshDir()
    JsonlStore.write(dir, (1 to 10).map(i =>
      Map[String, Any]("id" -> i.toLong, "name" -> s"old $i")))

    import spark.implicits._
    val upsert = Seq((3L, "new 3"), (7L, "new 7"), (11L, "new 11"))
      .toDF("id", "name")
    def runWrite(): Unit = upsert.write.format("graft-docs")
      .option("descriptor", enc(dir)).option("key", "id")
      .mode("append").save()

    runWrite()
    val store = new JsonlDocumentStore(dir)
    val docs = store.fetch()
    assert(docs.size == 11, "2 updates + 1 insert over 10 existing")
    // in-place replacement preserves the store's stable order
    assert(docs.map(_("id")) == (1L to 11L).toSeq)
    assert(docs(2)("name") == "new 3" && docs(6)("name") == "new 7")
    assert(docs(0)("name") == "old 1")
    assert(docs(10)("name") == "new 11")

    runWrite() // identical rerun — the reference's re-ingest scenario
    val again = new JsonlDocumentStore(dir).fetch()
    assert(again == docs, "upsert rerun must converge, not duplicate")
  }

  test("overwrite mode truncates before the upsert") {
    val dir = freshDir()
    JsonlStore.write(dir, (1 to 100).map(i =>
      Map[String, Any]("id" -> i.toLong, "name" -> s"old $i")))
    import spark.implicits._
    Seq((1L, "only 1"), (200L, "only 200")).toDF("id", "name")
      .write.format("graft-docs").option("descriptor", enc(dir))
      .mode("overwrite").save()
    val docs = new JsonlDocumentStore(dir).fetch()
    assert(docs.map(_("id")) == Seq(1L, 200L))
    assert(docs.head("name") == "only 1")
  }

  test("reading an empty store: empty DataFrame by default, write-schema names the columns") {
    val dir = freshDir()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    assert(readBack(dir).count() == 0)
    val df = spark.read.format("graft-docs")
      .option("descriptor", enc(dir))
      .option("write-schema", "id BIGINT, name STRING").load()
    assert(df.count() == 0 && df.schema.fieldNames.toSeq == Seq("id", "name"))
  }

  test("registry-backed sources reject writes (driver-JVM state cannot reach tasks)") {
    val dir = freshDir()
    JsonlStore.write(dir, Seq(Map[String, Any]("id" -> 1L, "name" -> "x")))
    DocumentSourceRegistry.register("w2_reject", new JsonlDocumentStore(dir))
    try {
      import spark.implicits._
      val e = intercept[Exception] {
        Seq((2L, "y")).toDF("id", "name").write.format("graft-docs")
          .option("source", "w2_reject").mode("append").save()
      }
      assert(e.getMessage.contains("descriptor"))
    } finally DocumentSourceRegistry.remove("w2_reject")
  }

  test("aborted staging leftovers are invisible to reads and swept by the next commit") {
    val dir = freshDir()
    JsonlStore.write(dir, Seq(Map[String, Any]("id" -> 1L, "name" -> "x")))
    val store = new JsonlDocumentStore(dir)
    // simulate a failed attempt: staged but never committed
    val w = store.openStagedBatch("deadwrite", "p00000-t99")
    w.add(Map("id" -> 999L, "name" -> "ghost"))
    w.finish()
    assert(new JsonlDocumentStore(dir).total() == 1,
      "staging must not be visible to the range index")
    // a real write against the same store still sees only committed data
    import spark.implicits._
    Seq((2L, "y")).toDF("id", "name").write.format("graft-docs")
      .option("descriptor", enc(dir)).mode("append").save()
    val docs = new JsonlDocumentStore(dir).fetch()
    assert(docs.map(_("id")) == Seq(1L, 2L))
    store.abortWrite("deadwrite") // cleanup of the simulated write's area
  }

  test("typed values cross the write boundary with the documented mapping") {
    val dir = freshDir()
    import spark.implicits._
    val df = Seq((1L, java.sql.Timestamp.from(java.time.Instant.parse("2001-02-03T04:05:06Z")),
        java.sql.Date.valueOf("2001-02-03"), BigDecimal("12.3456789"), true))
      .toDF("id", "ts", "d", "dec", "flag")
    df.write.format("graft-docs").option("descriptor", enc(dir))
      .option("write-schema", df.schema.toDDL).mode("append").save()
    val doc = new JsonlDocumentStore(dir).fetch().head
    assert(doc("ts") == "2001-02-03T04:05:06Z")
    assert(doc("d") == "2001-02-03")
    assert(doc("dec").asInstanceOf[String].startsWith("12.345678"))
    assert(doc("flag") == true)
    assert(doc("id") == 1L)
  }
}
