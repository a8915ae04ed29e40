package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time row entering the stateful rate monitor. */
case class EvRow(eventType: String, tsMicros: Long)

/** One closed hour bucket's verdict: the bucket's count scored against
  * the trailing ≤6 OBSERVED buckets of its type (`z` needs ≥ 3 of
  * them, matching the batch twin `ev_rate_anomaly`'s tn ≥ 3 rule).
  */
case class RateVerdict(eventType: String, wsMicros: Long, n: Long,
    trailMu: Option[Double], z: Option[Double], isAnomaly: Boolean)

/** ST17 — streaming event-rate anomaly: the online counterpart of the
  * batch `ev_rate_anomaly` query. State per event_type is ONE open
  * (hour, count) bucket plus a ring of the last ≤6 closed bucket
  * counts; an arriving event either increments the open bucket or
  * ROLLS IT OVER — the closed bucket is scored against the ring
  * (identical arithmetic to the batch window: μ = s1/tn,
  * σ² = (s2 − s1²/tn)/(tn−1), z = round((n−μ)/√σ², 6), verdict needs
  * tn ≥ 3) and then appended to it. Verdict-on-close is the honest
  * online semantics: the stream's verdicts equal the batch rows for
  * every bucket except each type's still-open LAST one
  * (StreamingRateAnomalyConvergenceSpec pins exactly that, plus
  * multi-batch replay ≡ single-batch through RocksDB state).
  *
  * Scale note: state is O(|event_types| × 7) longs — index-sized, not
  * corpus-sized; each micro-batch touches each type's state once per
  * arriving partition row. Gap hours are absent buckets (the batch
  * twin's declared observed-bucket frame), so the ring holds observed
  * closes, never zero-filled spine hours.
  */
object RateAnomalyStream {

  val HourMicros: Long = 3600L * 1000 * 1000
  val TrailLen = 6
  val MinTrail = 3
  val ZThreshold = 3.0

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Score a closed bucket of `n` events against the trailing counts —
    * the batch query's exact arithmetic, shared by the spec's oracle
    * replay.
    */
  def score(n: Long, trail: Seq[Long]): (Option[Double], Option[Double], Boolean) = {
    val tn = trail.length
    if (tn == 0) (None, None, false)
    else {
      val s1 = trail.sum
      val s2 = trail.map(c => c * c).sum
      val mu = s1.toDouble / tn
      val va = if (tn > 1) (s2 - s1.toDouble * s1 / tn) / (tn - 1) else 0.0
      val z = if (tn >= MinTrail && va > 0) Some(r6((n - mu) / math.sqrt(va)))
        else None
      (Some(r6(mu)), z, z.exists(v => math.abs(v) > ZThreshold))
    }
  }

  class RateAnomalyProcessor(
      droppedLate: Option[org.apache.spark.util.LongAccumulator] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, EvRow, RateVerdict] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var open: ValueState[(Long, Long)] = _
    @transient private var trail: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[(Long, Long)]("open_bucket",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
      trail = getHandle.getListState[Long]("trail_counts",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[EvRow],
        timerValues: TimerValues): Iterator[RateVerdict] = {
      val out = scala.collection.mutable.ArrayBuffer[RateVerdict]()
      rows.toSeq.sortBy(_.tsMicros).foreach { r =>
        val hour = r.tsMicros - java.lang.Math.floorMod(r.tsMicros, HourMicros)
        val cur = if (open.exists()) Option(open.get()) else None
        cur match {
          case Some((h, c)) if h == hour => open.update((h, c + 1))
          case Some((h, _)) if hour < h =>
            // a late event for an already-closed bucket: dropped, the
            // same verdict a watermarked windowed agg would reach — but
            // COUNTED, so divergence from the batch twin is observable
            // (the accumulator surfaces in the Spark UI / REST metrics)
            droppedLate.foreach(_.add(1L))
          case Some((h, c)) =>
            // hour > h: close, score, ring-append
            val ring = trail.get().toSeq
            val (mu, z, anom) = score(c, ring)
            out += RateVerdict(key, h, c, mu, z, anom)
            trail.put(((ring :+ c).takeRight(TrailLen)).toArray)
            open.update((hour, 1L))
          case None => open.update((hour, 1L))
        }
      }
      out.iterator
    }
  }

  /** events stream (ts: TimestampType) → per-type closed-bucket
    * verdicts. Registers a named `LongAccumulator`
    * ("graft.rate_anomaly.dropped_late") that counts late events for
    * already-closed buckets — the one silent divergence path vs the
    * batch twin; returned alongside the stream for callers/tests that
    * want to assert on it. The counter is AT-LEAST-ONCE, not
    * exactly-once: task retries, speculative execution, and micro-batch
    * re-execution each re-add their partition's increments, so it can
    * over-count under failure/replay — an alerting signal ("late data is
    * arriving"), not an exact ledger; tests that need the exact count
    * derive it from the data (batch-vs-stream verdict diff), never from
    * the accumulator.
    */
  def rateAnomaly(events: DataFrame): Dataset[RateVerdict] =
    rateAnomalyWithMetrics(events)._1

  def rateAnomalyWithMetrics(events: DataFrame)
      : (Dataset[RateVerdict], org.apache.spark.util.LongAccumulator) = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val dropped = spark.sparkContext.longAccumulator(
      "graft.rate_anomaly.dropped_late")
    val ds = events
      .select(col("event_type").as("eventType"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[EvRow]
      .groupByKey(_.eventType)
      .transformWithState(new RateAnomalyProcessor(Some(dropped)),
        TimeMode.None(), OutputMode.Append())
    (ds, dropped)
  }
}
