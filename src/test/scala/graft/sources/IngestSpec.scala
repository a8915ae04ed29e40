package graft.sources

import graft.SparkSpec

class IngestSpec extends SparkSpec {

  test("S6 batched insert lands every row and counts batches") {
    InMemorySink.clear("t_insert")
    val df = Generators.big50(spark, 2500, numPartitions = 4)
      .select("i_0", "s_0", "f_0")
    val m = Ingest.ingest(df, "t_insert", batchSize = 100)
    assert(m.rows == 2500)
    assert(m.batches >= 25) // ≥ rows/batchSize, split across partitions
    assert(InMemorySink("t_insert").count() == 2500)
  }

  test("S7 keyed upsert is idempotent — the retry-safety contract (README.md:102)") {
    InMemorySink.clear("t_upsert")
    val df = Generators.ddl53(spark, 1000, numPartitions = 2)
      .select("int_0", "str_0", "dec_0")
    val m1 = Ingest.bulkUpsert(df, "t_upsert", pk = Seq("int_0"))
    assert(m1.rows == 1000)
    assert(InMemorySink("t_upsert").count() == 1000)
    // second run replaces, never duplicates
    Ingest.bulkUpsert(df, "t_upsert", pk = Seq("int_0"))
    assert(InMemorySink("t_upsert").count() == 1000)
  }

  test("S10 dry run writes nothing") {
    InMemorySink.clear("t_dry")
    val df = Generators.big50(spark, 50).select("i_0")
    val m = Ingest.ingest(df, "t_dry", dryRun = true)
    assert(m.rows == 50)
    assert(InMemorySink("t_dry").count() == 0)
  }
}
