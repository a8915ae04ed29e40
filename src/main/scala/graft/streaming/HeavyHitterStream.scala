package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One SpaceSaving counter update (or eviction tombstone: est = -1). */
case class HhUpdate(eventType: String, userId: Long, est: Long, err: Long)

/** ST20 — streaming heavy hitters via SpaceSaving (Metwally, Agrawal &
  * El Abbadi 2005): per event_type, a fixed table of `Capacity`
  * (user → (est, err)) counters answers "which users dominate this
  * stream?" in O(Capacity) state — the index-sized alternative to the
  * unbounded exact rollup. Update rule: resident user increments; a new
  * user takes a free slot at (1, 0); with the table full, the MINIMUM
  * counter (min est, max user tiebreak — deterministic) is evicted and
  * the newcomer inherits (min+1, min). Guarantees (paper §3): est − err
  * ≤ true ≤ est, and every user with true count > N/Capacity is
  * resident. The stream emits every counter change plus an eviction
  * tombstone (est = −1), so "last emission per (type, user), tombstones
  * dropped" reconstructs the live table at any cut —
  * StreamingHeavyHitterSpec checks the guarantees against the exact
  * batch twin `ev_heavy_hitters` and multi-batch RocksDB replay ≡
  * single-batch.
  */
object HeavyHitterStream {

  val Capacity = 8

  class HeavyHitterProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, EvUserRow, HhUpdate] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TimerValues, TTLConfig}

    @transient private var counters: MapState[Long, (Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[Long, (Long, Long)]("ss_counters",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[EvUserRow],
        timerValues: TimerValues): Iterator[HhUpdate] = {
      val out = scala.collection.mutable.ArrayBuffer[HhUpdate]()
      rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
        val cur = if (counters.containsKey(r.userId))
          Option(counters.getValue(r.userId)) else None
        cur match {
          case Some((est, err)) =>
            counters.updateValue(r.userId, (est + 1, err))
            out += HhUpdate(key, r.userId, est + 1, err)
          case None =>
            val all = counters.iterator().toSeq
            if (all.size < Capacity) {
              counters.updateValue(r.userId, (1L, 0L))
              out += HhUpdate(key, r.userId, 1L, 0L)
            } else {
              // evict deterministically: min est, then LARGEST user id
              // (prefers keeping earlier-established residents on ties)
              val (evictU, (minEst, _)) =
                all.minBy { case (u, (e, _)) => (e, -u) }
              counters.removeKey(evictU)
              out += HhUpdate(key, evictU, -1L, -1L)
              counters.updateValue(r.userId, (minEst + 1, minEst))
              out += HhUpdate(key, r.userId, minEst + 1, minEst)
            }
        }
      }
      out.iterator
    }
  }

  /** events stream (ts: TimestampType) → per-type SpaceSaving counter
    * updates (+ eviction tombstones).
    */
  def heavyHitters(events: DataFrame): Dataset[HhUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("event_type").as("eventType"),
        unix_micros(col("ts")).as("tsMicros"),
        col("event_id").as("eventId"),
        col("user_id").as("userId"))
      .as[EvUserRow]
      .groupByKey(_.eventType)
      .transformWithState(new HeavyHitterProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

case class EvUserRow(eventType: String, tsMicros: Long, eventId: Long,
    userId: Long)
