package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.VectorOps

/** The native codegen'd folds must be bit-identical to the built-in
  * `aggregate(zip_with(...))` composition they replaced (that composition
  * is the declared semantics, and the DuckDB oracle mirrors it).
  */
class VectorExpressionsSpec extends SparkSpec {

  private def builtinDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def builtinDist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  private lazy val vecs = {
    val s = spark
    import s.implicits._
    Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, -0.6)),
      (Seq(1e-9, 1e9, -1e-9), Seq(1e9, 1e-9, 1e9))
    ).toDF("a", "b")
  }

  test("vec_dot matches the built-in fold bit-exactly") {
    val rows = vecs.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      builtinDot(col("a"), col("b")).as("builtin")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_dist2 matches the built-in fold bit-exactly") {
    val rows = vecs.select(
      VectorOps.dist2(col("a"), col("b")).as("native"),
      builtinDist2(col("a"), col("b")).as("builtin")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null array and null element propagate to null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), None: Option[Seq[Option[Double]]]),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0))))
    ).toDF("a", "b")
    val rows = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    // filter pushes the expression into a non-codegen context too; both
    // paths must agree on the same data.
    val n = vecs.filter(VectorOps.dot(col("a"), col("b")) > lit(-1e18)).count()
    assert(n == 3)
  }

  test("dot on fixture embeddings equals built-in on sf0.001") {
    val emb = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val rows = emb.select(
      VectorOps.dot(col("v"), col("v")).as("native"),
      builtinDot(col("v"), col("v")).as("builtin")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
