package graft.sources

import java.time.{Instant, LocalDate}

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._

import graft.SparkSpec

/** SURVEY §5.2.3: property-based round-trip of the §1.4 coercion layer —
  * any generated row set written through TableIO.writeRows must read back
  * value-equal (nulls, missing keys, every supported type). Uses plain
  * ScalaCheck generators with fixed seeds (deterministic CI).
  */
class CoercionPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("s", StringType),
    StructField("d", DoubleType),
    StructField("ts", TimestampType),
    StructField("dt", DateType),
    StructField("dec", DecimalType(38, 10))))

  // micros range well inside the reference's generated data (±~50 years)
  private val genTs: Gen[Instant] =
    Gen.choose(-1577923200000000L, 2524608000000000L)
      .map(us => Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))
  private val genDate: Gen[LocalDate] =
    Gen.choose(-20000L, 20000L).map(LocalDate.ofEpochDay)
  private val genDec: Gen[BigDecimal] =
    Gen.choose(-1000000L, 1000000L).map(n => BigDecimal(n) * BigDecimal(10).pow(10))

  private val genRow: Gen[Map[String, Any]] = for {
    k <- Gen.choose(Long.MinValue, Long.MaxValue)
    s <- Gen.option(Gen.alphaNumStr)
    d <- Gen.option(Gen.choose(-1e12, 1e12))
    ts <- Gen.option(genTs)
    dt <- Gen.option(genDate)
    dec <- Gen.option(genDec)
    dropKeys <- Gen.someOf(Seq("s", "d", "ts", "dt", "dec")) // missing ⇒ null
  } yield {
    val full = Map[String, Any]("k" -> k) ++
      s.map("s" -> _) ++ d.map("d" -> _) ++ ts.map("ts" -> _) ++
      dt.map("dt" -> _) ++ dec.map("dec" -> _)
    full -- dropKeys
  }

  test("writeRows ⇒ read round-trips any generated row set (io.py:7-75 semantics)") {
    val rowsGen = Gen.listOfN(20, genRow)
    (1 to 10).foreach { trial =>
      val rows = rowsGen.pureApply(Gen.Parameters.default, Seed(42L + trial))
      val path = tmpDir("prop-roundtrip") + "/t.parquet"
      TableIO.writeRows(spark, path, schema, rows)
      val back = TableIO.read(spark, path).collect()
      assert(back.length == rows.length)
      val gotKeys = back.map(r => r.getAs[Long]("k")).sorted
      val expKeys = rows.map(_("k").asInstanceOf[Long]).sorted.toArray
      assert(gotKeys.sameElements(expKeys))
      // value-level spot check on a keyed lookup (k is unique w.h.p.)
      val byKey = back.map(r => r.getAs[Long]("k") -> r).toMap
      rows.foreach { m =>
        val r = byKey(m("k").asInstanceOf[Long])
        m.get("ts").foreach(ts => assert(r.getAs[java.sql.Timestamp]("ts").toInstant == ts))
        m.get("dt").foreach(dt => assert(r.getAs[java.sql.Date]("dt").toLocalDate == dt))
        m.get("dec").foreach(dec => assert(
          BigDecimal(r.getAs[java.math.BigDecimal]("dec")) == dec))
        if (!m.contains("s")) assert(r.isNullAt(r.fieldIndex("s")))
      }
    }
  }
}
