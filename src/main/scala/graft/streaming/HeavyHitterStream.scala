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

  /** @param capacity counter-table size (the paper's m): guarantees hold
    *   for any user with true count > N/capacity; the declared query
    *   binds the default `Capacity` = 8 (the batch twin's setting), a
    *   deployment sizes it to the tail it must resolve (spec'd at 64).
    */
  class HeavyHitterProcessor(capacity: Int = Capacity)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, EvUserRow, HhUpdate] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TimerValues, TTLConfig}

    // validate at CONSTRUCTION, not inside the serialized task: with
    // capacity = 0 the full-table eviction branch would minBy an empty
    // table and throw from inside a streaming batch
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

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
      // ONE state scan per handleInputRows call: the local table mirrors
      // the store and the two update in lockstep, so a miss-event costs
      // an in-memory minBy instead of a per-event RocksDB iterator — at
      // Capacity = 8 the difference is noise, at a deployment's
      // capacity = 10⁴ it is the difference between O(C) memory reads
      // and O(C) store scans PER EVENT
      val table = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      counters.iterator().foreach { case (u, v) => table.update(u, v) }
      rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
        table.get(r.userId) match {
          case Some((est, err)) =>
            table.update(r.userId, (est + 1, err))
            counters.updateValue(r.userId, (est + 1, err))
            out += HhUpdate(key, r.userId, est + 1, err)
          case None =>
            if (table.size < capacity) {
              table.update(r.userId, (1L, 0L))
              counters.updateValue(r.userId, (1L, 0L))
              out += HhUpdate(key, r.userId, 1L, 0L)
            } else {
              // evict deterministically: min est, then LARGEST user id —
              // an ARBITRARY deterministic tie-break (user id carries no
              // arrival-order information; any total order on ties keeps
              // the paper's guarantees and makes replay bit-identical)
              val (evictU, (minEst, _)) =
                table.minBy { case (u, (e, _)) => (e, -u) }
              table.remove(evictU)
              counters.removeKey(evictU)
              out += HhUpdate(key, evictU, -1L, -1L)
              table.update(r.userId, (minEst + 1, minEst))
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
  def heavyHitters(events: DataFrame,
      capacity: Int = Capacity): Dataset[HhUpdate] = {
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
      .transformWithState(new HeavyHitterProcessor(capacity), TimeMode.None(),
        OutputMode.Append())
  }
}

case class EvUserRow(eventType: String, tsMicros: Long, eventId: Long,
    userId: Long)
