package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec

class GeneratorsSpec extends SparkSpec {

  test("big50 has the reference's 50-column shape (FIXTURES §A3)") {
    val df = Generators.big50(spark, 1000)
    val byType = df.schema.fields.groupBy(_.dataType).view.mapValues(_.length).toMap
    assert(df.schema.length == 50)
    assert(byType(LongType) == 12)
    assert(byType(DoubleType) == 12)
    assert(byType(StringType) == 12)
    assert(byType(TimestampType) == 6)
    assert(byType(DateType) == 4)
    assert(byType(BooleanType) == 4)
    assert(df.count() == 1000)
  }

  test("ddl53 has the reference's 53-column type census (FIXTURES §A4)") {
    val df = Generators.ddl53(spark, 500)
    val byType = df.schema.fields.groupBy(_.dataType).view.mapValues(_.length).toMap
    assert(df.schema.length == 53)
    assert(byType(StringType) == 21)
    assert(byType(DecimalType(38, 10)) == 11)
    assert(byType(LongType) == 8)
    assert(byType(FloatType) == 7)
    assert(byType(TimestampType) == 3)
    assert(byType(BooleanType) == 3)
  }

  test("same seed ⇒ identical rows regardless of partitioning (SURVEY §7.3)") {
    val a = Generators.big50(spark, 2000, seed = 7, numPartitions = 1)
      .orderBy("i_0").collect()
    val b = Generators.big50(spark, 2000, seed = 7, numPartitions = 16)
      .orderBy("i_0").collect()
    assert(a.sameElements(b))
  }

  test("different seed ⇒ different uniforms") {
    val a = Generators.big50(spark, 100, seed = 1).select("f_0").collect().map(_.getDouble(0))
    val b = Generators.big50(spark, 100, seed = 2).select("f_0").collect().map(_.getDouble(0))
    assert(!a.sameElements(b))
  }

  test("generator value laws: uniforms in [0,1), decimals integral ≤1e16, bools alternate") {
    val df = Generators.big50(spark, 500, seed = 3)
    import org.apache.spark.sql.functions._
    assert(df.filter(col("f_0") < 0.0 || col("f_0") >= 1.0).count() == 0)
    assert(df.filter(col("b_0") =!= (col("i_0") % 2 === 0)).count() == 0)
    val dec = Generators.ddl53(spark, 200).select("dec_0").collect()
      .map(_.getDecimal(0))
    assert(dec.forall(d => d.abs.compareTo(new java.math.BigDecimal("1e16")) <= 0))
    assert(dec.forall(d => d.remainder(new java.math.BigDecimal(10000000000L)).signum == 0))
  }
}
