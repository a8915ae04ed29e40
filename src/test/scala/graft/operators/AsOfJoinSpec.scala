package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of picks the latest right row at or before each left ts") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row → null
      (4L, 30L, ts("2024-01-01 10:00:00"))  // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00")),
      (101L, 10L, ts("2024-01-01 10:00:00")), // equal ts: matches left #1
      (102L, 10L, ts("2024-01-01 11:00:00")),
      (103L, 20L, ts("2024-01-01 09:30:00")),
      (104L, 10L, ts("2024-01-01 10:00:00"))  // equal-ts tie: higher id wins
    ).toDF("event_id", "user_id", "ts")

    val out = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Seq("event_id"), "event_id")
      .select(col("event_id"), col("asof_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out(1L) == 104L) // equal ts included, max event_id tiebreak
    assert(out(2L) == 102L) // strictly latest ≤ 12:00
    assert(out(3L) == -1L)  // nothing at or before 09:00
    assert(out(4L) == -1L)  // key absent on the right
  }

  test("plan has one shuffle on the key, no nested-loop join") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((2L, 10L, ts("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val df = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
      Seq("event_id"), "event_id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }
}
