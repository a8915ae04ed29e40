package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.types.StringType

import graft.SparkSpec

/** DSv2 ranged read path: `spark.read.format("graft-docs")` over a
  * [[RangedFetch]] store. What distinguishes it from the driver-side
  * rungs — and what this spec pins — is WHERE the data moves: every
  * document range is requested by a task, one range per input partition,
  * and nothing dataset-sized crosses the driver.
  */
class DocumentSourceV2Spec extends SparkSpec {

  /** Ranged store recording every (start, len) request, so the spec can
    * prove partition-granular access (thread-safe: tasks call it
    * concurrently).
    */
  private class RangedStore(n: Int) extends DocumentSource with RangedFetch {
    val calls = new ConcurrentLinkedQueue[(Int, Int)]()
    private val docs = (1 to n).map(i =>
      Map[String, Any]("_id" -> i.toLong, "name" -> s"d$i", "score" -> i * 0.5))
    def fetch(): Seq[Map[String, Any]] = docs
    def total(): Int = docs.size
    def fetchRange(start: Int, count: Int): Seq[Map[String, Any]] = {
      calls.add((start, count))
      docs.slice(start, start + count)
    }
  }

  test("graft-docs reads a ranged store with one executor-side fetch per partition") {
    val store = new RangedStore(2500)
    DocumentSourceRegistry.register("v2_basic", store)
    try {
      val df = spark.read.format("graft-docs")
        .option("source", "v2_basic").option("batch-size", 400).load()
      // ceil(2500/400) = 7 planned ranges
      assert(df.rdd.getNumPartitions == 7)
      assert(df.count() == 2500)
      // rung semantics match the rest of the ladder: _id -> string id
      assert(df.schema("id").dataType == StringType)
      val byId = df.collect().map(r => r.getAs[String]("id") -> r).toMap
      assert(byId("7").getAs[String]("name") == "d7")
      assert(byId("2500").getAs[Double]("score") == 1250.0)
      // every data fetch was range-granular: no call asked for more than
      // one batch, and the union of ranges covers the store exactly once
      import scala.jdk.CollectionConverters._
      val dataCalls = store.calls.asScala.toSeq.filterNot(_ == (0, 400)) ++
        Seq((0, 400)) // schema inference reuses the first range
      assert(dataCalls.forall(_._2 <= 400), s"oversized fetch: ${store.calls}")
      val covered = dataCalls.distinct.sortBy(_._1)
      assert(covered.map(_._2).sum == 2500, s"ranges $covered don't tile the store")
    } finally DocumentSourceRegistry.remove("v2_basic")
  }

  test("limit option caps planned ranges server-side (documents past it never requested)") {
    val store = new RangedStore(10000)
    DocumentSourceRegistry.register("v2_limit", store)
    try {
      val df = spark.read.format("graft-docs")
        .option("source", "v2_limit").option("batch-size", 300)
        .option("limit", 700).load()
      assert(df.count() == 700)
      assert(df.rdd.getNumPartitions == 3) // 300+300+100
      import scala.jdk.CollectionConverters._
      val maxTouched = store.calls.asScala.map { case (s, l) => s + l }.max
      assert(maxTouched <= 700,
        s"store was asked past the limit: ${store.calls}")
    } finally DocumentSourceRegistry.remove("v2_limit")
  }

  test("toDFResilient prefers the ranged rung and converges with the plain rung") {
    val store = new RangedStore(500)
    val got = DocumentSource.toDFResilient(spark, store, batchSize = 128)
    // descriptor-less store: registry fallback, honestly labeled local
    assert(got.path == "ranged-local", s"expected ranged-local rung, got ${got.path}")
    assert(got.degraded.isEmpty)
    // the registration is named for cleanup, counter-minted (no collisions)
    assert(got.registryName.isDefined)
    assert(DocumentSourceRegistry.names.contains(got.registryName.get))
    val plain = DocumentSource.toDF(spark, store)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "name", "score").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(canon(got.df) == canon(plain))
    DocumentSourceRegistry.remove(got.registryName.get)
    assert(!DocumentSourceRegistry.names.contains(got.registryName.get))
    // the limit flows through the resilient entry too
    val capped = DocumentSource.toDFResilient(spark, store, batchSize = 128, limit = 50)
    assert(capped.path == "ranged-local" && capped.df.count() == 50)
    // distinct registrations get distinct names
    assert(capped.registryName != got.registryName)
    capped.registryName.foreach(DocumentSourceRegistry.remove)
  }

  test("a store that lies about the ranged capability degrades at load(), not at first action") {
    val store = new DocumentSource with RangedFetch {
      private val docs = (1 to 5).map(i => Map[String, Any]("_id" -> i.toLong, "v" -> i.toLong))
      def fetch(): Seq[Map[String, Any]] = docs
      def total(): Int = docs.size
      def fetchRange(start: Int, count: Int): Seq[Map[String, Any]] =
        throw new RuntimeException("range cursor unsupported after all")
    }
    val before = DocumentSourceRegistry.names
    val got = DocumentSource.toDFResilient(spark, store)
    assert(got.path == "plain")
    assert(got.degraded.exists(_.startsWith("ranged:")))
    assert(got.df.count() == 5)
    // the failed rung's anonymous registration must not leak
    assert(DocumentSourceRegistry.names == before)
  }
}
