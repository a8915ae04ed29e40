package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One observed per-user transition (the stream emits raw transition
  * events; counting/normalizing is the consumer's rollup, exactly the
  * batch twin's split of work).
  */
case class TransRow(userId: Long, tsMicros: Long, eventId: Long,
    eventType: String)
case class Transition(fromType: String, toType: String)

/** ST19 — streaming event-type transitions: the online counterpart of
  * the batch `ev_transition_matrix`. State per user is ONE string (the
  * last event type) — O(|users|) state; every arriving event emits the
  * (last → current) transition and replaces the state. In-batch rows
  * process in the batch twin's exact (ts, event_id) order, so ts-ordered
  * replay is bit-identical to the batch lag window;
  * StreamingTransitionConvergenceSpec pins the aggregated stream ≡
  * `ev_transition_matrix` counts and multi-batch RocksDB replay ≡
  * single-batch (the last-type state carries across batches).
  */
object TransitionStream {

  class TransitionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TransRow, Transition] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var last: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[String]("last_type",
        org.apache.spark.sql.Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TransRow],
        timerValues: TimerValues): Iterator[Transition] = {
      val out = scala.collection.mutable.ArrayBuffer[Transition]()
      rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
        if (last.exists()) out += Transition(last.get(), r.eventType)
        last.update(r.eventType)
      }
      out.iterator
    }
  }

  /** events stream (ts: TimestampType) → raw per-user transitions. */
  def transitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsMicros"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"))
      .as[TransRow]
      .groupByKey(_.userId)
      .transformWithState(new TransitionProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
