package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted join/agg must be result-identical to the plain forms on a
  * deliberately skewed dataset (90% of rows share one key).
  */
class SaltingSpec extends SparkSpec {

  private lazy val skewed = {
    // 10k rows, 90% on key 0, the rest uniform over 1..99
    spark.range(0, 10000)
      .withColumn("k", when(col("id") % 10 =!= 0, lit(0L))
        .otherwise(pmod(col("id"), lit(99L)) + 1))
      .withColumn("v", col("id") * 2)
      .repartition(8)
  }

  private lazy val dim = spark.range(0, 100).select(
    col("id").as("k"), concat(lit("dim_"), col("id")).as("label"))

  test("saltedJoin equals the plain equi-join on a skewed key") {
    val plain = skewed.join(dim, Seq("k")).agg(
      count(lit(1)).as("n"), sum(col("v")).as("s")).collect().head
    val salted = Salting.saltedJoin(skewed, dim, "k", salts = 8).agg(
      count(lit(1)).as("n"), sum(col("v")).as("s")).collect().head
    assert(plain.getLong(0) == salted.getLong(0))
    assert(plain.getLong(1) == salted.getLong(1))
  }

  test("saltedJoin left-outer keeps unmatched big-side rows exactly once") {
    val missing = skewed.withColumn("k", col("k") + 1000) // no dim matches
    val out = Salting.saltedJoin(missing, dim, "k", salts = 4, joinType = "left")
    assert(out.count() == missing.count())
    assert(out.filter(col("label").isNotNull).count() == 0)
  }

  test("saltedSumCount equals the plain groupBy aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
      .orderBy(col("k")).collect()
    val salted = Salting.saltedSumCount(skewed, "k", "v", salts = 8)
      .orderBy(col("k")).collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getLong(0) == s.getLong(0))
      assert(p.getLong(1) == s.getLong(1))
      assert(p.getLong(2) == s.getLong(2))
    }
  }
}
