package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** First-doc inference semantics (examples/run_example.py:78-106). */
class SchemaInferSpec extends AnyFunSuite {

  test("maps python-analog types from the FIRST doc only") {
    val docs = Seq(
      Map[String, Any]("i" -> 1, "f" -> 1.5,
        "dt" -> java.time.LocalDateTime.of(2023, 1, 1, 0, 0),
        "d" -> java.time.LocalDate.of(2023, 1, 1), "s" -> "x"),
      // second doc has different types — must be ignored
      Map[String, Any]("i" -> "not-an-int", "f" -> 1, "dt" -> 1, "d" -> 1, "s" -> 1))
    val s = SchemaInfer.inferSchema(docs)
    assert(s("i").dataType == LongType)
    assert(s("f").dataType == DoubleType)
    assert(s("dt").dataType == TimestampType)
    assert(s("d").dataType == DateType)
    assert(s("s").dataType == StringType)
  }

  test("bool infers as int64 — the bool-is-int quirk (run_example.py:93)") {
    val s = SchemaInfer.inferSchema(Seq(Map("b" -> true)))
    assert(s("b").dataType == LongType)
  }

  test("datetime checked before date (run_example.py:98-102)") {
    val s = SchemaInfer.inferSchema(Seq(Map(
      "dt" -> java.time.LocalDateTime.of(2023, 1, 1, 2, 3))))
    assert(s("dt").dataType == TimestampType)
  }

  test("empty input yields empty schema (run_example.py:84-85)") {
    assert(SchemaInfer.inferSchema(Nil).isEmpty)
  }

  test("unknown types fall back to string (run_example.py:103-104)") {
    val s = SchemaInfer.inferSchema(Seq(Map("x" -> List(1, 2, 3))))
    assert(s("x").dataType == StringType)
  }
}
