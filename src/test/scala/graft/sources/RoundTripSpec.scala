package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Parquet write→read round-trip for every §1.2 type (SURVEY §5.2.1),
  * mirroring the reference's tests/test_io.py and tests/test_datetime.py.
  */
class RoundTripSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ratio", FloatType),
    StructField("flag", BooleanType),
    StructField("ts", TimestampType),
    StructField("d", DateType),
    StructField("amount", DecimalType(38, 10))))

  private val ts = java.time.Instant.parse("2023-01-02T03:04:05.123456Z")
  private val d = java.time.LocalDate.of(2023, 1, 2)

  test("full-width round trip preserves values exactly") {
    val rows = Seq(
      Map[String, Any]("id" -> 1L, "name" -> "Alice", "score" -> 9.5,
        "ratio" -> 0.25f, "flag" -> true, "ts" -> ts, "d" -> d,
        "amount" -> BigDecimal("12345.6789")),
      Map[String, Any]("id" -> 2L, "name" -> "Bob", "score" -> 7.3,
        "ratio" -> 0.5f, "flag" -> false, "ts" -> ts, "d" -> d,
        "amount" -> BigDecimal("-1.0000000001")))
    val path = tmpDir("roundtrip") + "/t.parquet"
    TableIO.writeRows(spark, path, schema, rows)
    val back = TableIO.read(spark, path).orderBy("id").collect()
    assert(back.length == 2)
    val r = back(0)
    assert(r.getAs[Long]("id") == 1L)
    assert(r.getAs[String]("name") == "Alice")
    assert(r.getAs[Double]("score") == 9.5)
    assert(r.getAs[Float]("ratio") == 0.25f)
    assert(r.getAs[Boolean]("flag"))
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant == ts)
    assert(r.getAs[java.sql.Date]("d").toLocalDate == d)
    assert(r.getAs[java.math.BigDecimal]("amount")
      .compareTo(new java.math.BigDecimal("12345.6789")) == 0)
  }

  test("CSV / JSON / ORC round-trips preserve the full-width row set") {
    val rows = Seq(
      Map[String, Any]("id" -> 1L, "name" -> "Alice", "score" -> 9.5,
        "ratio" -> 0.25f, "flag" -> true, "ts" -> ts, "d" -> d,
        "amount" -> BigDecimal("12345.6789")),
      Map[String, Any]("id" -> 2L, "name" -> "Bob", "score" -> 0.1,
        "ratio" -> 0.5f, "flag" -> false, "ts" -> ts, "d" -> d,
        "amount" -> BigDecimal("-1.0000000001")))
    val base = tmpDir("formats")
    TableIO.writeRows(spark, base + "/p.parquet", schema, rows)
    val df = TableIO.read(spark, base + "/p.parquet")

    TableIO.writeCsv(df, base + "/t.csv")
    TableIO.writeJson(df, base + "/t.json")
    TableIO.writeOrc(df, base + "/t.orc")

    val expected = df.orderBy("id").collect().toSeq
    val viaCsv = TableIO.readCsv(spark, base + "/t.csv", schema).orderBy("id").collect().toSeq
    val viaJson = TableIO.readJson(spark, base + "/t.json", schema).orderBy("id").collect().toSeq
    val viaOrc = TableIO.readOrc(spark, base + "/t.orc").orderBy("id").collect().toSeq
    assert(viaCsv == expected, s"csv: $viaCsv != $expected")
    assert(viaJson == expected, s"json: $viaJson != $expected")
    assert(viaOrc == expected, s"orc: $viaOrc != $expected")
  }

  test("missing keys become nulls (io.py:19 semantics)") {
    val rows = Seq(
      Map[String, Any]("id" -> 1L, "name" -> "only-two-fields"),
      Map[String, Any]("id" -> 2L, "score" -> 1.5))
    val path = tmpDir("nulls") + "/t.parquet"
    TableIO.writeRows(spark, path, schema, rows)
    val back = TableIO.read(spark, path).orderBy("id").collect()
    assert(back(0).isNullAt(back(0).fieldIndex("score")))
    assert(back(1).isNullAt(back(1).fieldIndex("name")))
    assert(back(1).isNullAt(back(1).fieldIndex("ts")))
  }

  test("integer epoch values pass through timestamp/date coercion (io.py:49-50)") {
    val rows = Seq(Map[String, Any](
      "id" -> 1L,
      "ts" -> 1672628645123456L, // epoch micros
      "d" -> 19359)) // epoch days
    val path = tmpDir("epoch") + "/t.parquet"
    TableIO.writeRows(spark, path, schema, rows)
    val r = TableIO.read(spark, path).collect()(0)
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.ofEpochSecond(1672628645L, 123456000L))
    assert(r.getAs[java.sql.Date]("d").toLocalDate ==
      java.time.LocalDate.ofEpochDay(19359L))
  }

  test("timestamp_ntz round-trips naive datetimes (reference naive-UTC convention)") {
    val ntzSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts_ntz", TimestampNTZType)))
    val naive = java.time.LocalDateTime.of(2023, 1, 2, 3, 4, 5, 123456000)
    val rows = Seq(
      Map[String, Any]("id" -> 1L, "ts_ntz" -> naive),
      Map[String, Any]("id" -> 2L, "ts_ntz" -> ts), // Instant treated as UTC wall-clock
      Map[String, Any]("id" -> 3L, "ts_ntz" -> 1672628645123456L)) // epoch micros
    val path = tmpDir("ntz") + "/t.parquet"
    TableIO.writeRows(spark, path, ntzSchema, rows)
    val back = TableIO.read(spark, path).orderBy("id").collect()
    assert(back(0).getAs[java.time.LocalDateTime]("ts_ntz") == naive)
    assert(back(1).getAs[java.time.LocalDateTime]("ts_ntz") ==
      java.time.LocalDateTime.ofInstant(ts, java.time.ZoneOffset.UTC))
    assert(back(2).getAs[java.time.LocalDateTime]("ts_ntz") ==
      java.time.LocalDateTime.of(2023, 1, 2, 3, 4, 5, 123456000))
  }

  test("tz-aware datetimes normalize to UTC (io.py:37-42)") {
    val zoned = java.time.ZonedDateTime.of(2023, 6, 1, 12, 0, 0, 0,
      java.time.ZoneId.of("America/New_York"))
    val rows = Seq(Map[String, Any]("id" -> 1L, "ts" -> zoned.toInstant))
    val path = tmpDir("tz") + "/t.parquet"
    TableIO.writeRows(spark, path, schema, rows)
    val r = TableIO.read(spark, path).collect()(0)
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.parse("2023-06-01T16:00:00Z"))
  }

  test("compact rewrites a many-small-file table into the target file count, losslessly") {
    import org.apache.spark.sql.functions._
    val inDir = tmpDir("compact-in")
    val outDir = tmpDir("compact-out")
    // 64 tiny files
    spark.range(64L * 1000).withColumn("v", col("id") * 2)
      .repartition(64).write.mode("overwrite").parquet(inDir)
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(inDir) == 64)
    val totalBytes = new java.io.File(inDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = totalBytes / 4 // aim for ~4 files
    val planned = TableIO.compact(spark, inDir, outDir, target)
    val got = parquetFiles(outDir)
    assert(got == planned.toInt, s"planned $planned files, wrote $got")
    assert(got <= 6, s"expected ~4-5 compacted files, got $got")
    // lossless: same rows
    val a = spark.read.parquet(inDir).agg(count(lit(1)), sum(col("v"))).collect().head
    val b = spark.read.parquet(outDir).agg(count(lit(1)), sum(col("v"))).collect().head
    assert(a == b)
  }

  // Note: CSV "malformed" = structural failure with MORE tokens than the
  // schema; under-count rows are null-padded and uncastable values are
  // nulled — both kept in every mode.
  test("malformed CSV rows: PERMISSIVE nulls them with corrupt-record capture, DROPMALFORMED drops them") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("csv-malformed")
    val f = new java.io.File(dir, "rows.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,score")
    w.println("1,1.5")
    w.println("oops,1.5,extra,extra2") // too many fields = structurally malformed
    w.println("3,2.5")
    w.close()
    val base = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    // PERMISSIVE (default): bad row survives with nulls + raw text captured
    val withCorrupt = StructType(base.fields :+ StructField("_corrupt_record", StringType))
    val permissive = spark.read.schema(withCorrupt)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    assert(permissive.count() == 3)
    val bad = permissive.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").startsWith("oops"))
    permissive.unpersist()
    // DROPMALFORMED: bad row silently removed
    val dropped = spark.read.schema(base)
      .option("header", "true").option("mode", "DROPMALFORMED").csv(dir)
    // collect(), not count(): count() prunes every column, so the parser
    // never reads the surplus tokens and nothing registers as malformed —
    // the classic csv columnPruning gotcha.
    assert(dropped.collect().length == 2)
  }

  test("schema evolution: mergeSchema unifies files written with added columns") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("evolve")
    spark.range(3).select(col("id"), lit("v1").as("tag"))
      .write.parquet(dir + "/p=1")
    spark.range(3, 6).select(col("id"), lit("v2").as("tag"),
        (col("id") * 2).as("added"))
      .write.parquet(dir + "/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("added", "id", "p", "tag"))
    assert(merged.count() == 6)
    // old files surface the new column as null
    assert(merged.filter(col("p") === 1 && col("added").isNull).count() == 3)
    assert(merged.filter(col("p") === 2 && col("added").isNotNull).count() == 3)
    // without mergeSchema the footer of one file wins — column may be absent
    val unmerged = spark.read.parquet(dir)
    assert(unmerged.count() == 6)
  }
}
