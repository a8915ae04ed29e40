package graft.sources

import org.apache.spark.sql.types.{LongType, StringType}

import graft.SparkSpec

/** S9: document source → DataFrame with the reference's `_id`→`id`
  * string rename and first-doc schema inference (run_example.py:43-75).
  */
class DocumentSourceSpec extends SparkSpec {

  test("S9 fetches documents, renames _id to string id, infers schema") {
    InMemorySink.clear("t_source")
    val sink = InMemorySink("t_source")
    sink.insertMany(Seq(
      Map("_id" -> 7L, "name" -> "alice", "score" -> 9.5),
      Map("_id" -> 8L, "name" -> "bob", "score" -> 7.25),
      Map("_id" -> 9L, "name" -> "carol"))) // missing score ⇒ null

    val df = DocumentSource.toDF(spark, DocumentSource.inMemory("t_source"))
    assert(df.schema("id").dataType == StringType)
    assert(df.schema("score").dataType.typeName == "double")
    assert(df.count() == 3)
    val byId = df.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("7").getAs[String]("name") == "alice")
    assert(byId("9").isNullAt(byId("9").fieldIndex("score")))
  }

  test("S9 round-trip: sink → source → DataFrame → parquet → read") {
    InMemorySink.clear("t_source_rt")
    InMemorySink("t_source_rt").insertMany(
      (1 to 50).map(i => Map[String, Any]("_id" -> i.toLong, "v" -> i * 2L)))
    val df = DocumentSource.toDF(spark, DocumentSource.inMemory("t_source_rt"))
    val path = tmpDir("s9") + "/docs.parquet"
    TableIO.write(df, path)
    val back = TableIO.read(spark, path)
    assert(back.count() == 50)
    assert(back.schema("v").dataType == LongType)
  }
}
