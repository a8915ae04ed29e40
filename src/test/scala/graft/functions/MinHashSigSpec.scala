package graft.functions

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries.{A, B, K, P}

/** The one-pass native signature must equal the K-pass declarative form
  * (which is what the DuckDB oracle computes) element-for-element.
  */
class MinHashSigSpec extends SparkSpec {

  private def declarativeSig = expr((0 until K).map { i =>
    s"array_min(transform(hs, h -> (${A(i)}L * h + ${B(i)}L) % ${P}L))"
  }.mkString("array(", ", ", ")"))

  private def nativeSig =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(col("hs")), A, B, P))

  test("native one-pass signature equals the K-pass declarative form") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Seq(0L, 1L, 42L, P - 1L, 123456789L),
      Seq(987654321L),
      Seq.range(0L, 200L)
    ).toDF("hs")
    val rows = df.select(nativeSig.as("native"), declarativeSig.as("decl")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("empty input yields null signature") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq.empty[Long]).toDF("hs")
    assert(df.select(nativeSig).collect().head.isNullAt(0))
  }

  test("signature on fixture shingle hashes matches declarative form") {
    val hs = graft.Tables.load(spark, sf(), "documents")
      .withColumn("toks", split(lower(col("text")), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles", array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")))
      .withColumn("hs", expr(
        s"transform(shingles, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % ${P}L)"))
      .select(col("hs"))
    val rows = hs.select(nativeSig.as("native"), declarativeSig.as("decl")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }
}
