package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One closed hour bucket's CUSUM verdict: the running one-sided
  * statistic after folding this bucket's standardized deviation in.
  */
case class CusumVerdict(eventType: String, wsMicros: Long, n: Long,
    cusum: Double, isAlarm: Boolean)

/** ST18 — streaming CUSUM change-point monitor: the online counterpart
  * of the batch `ev_cusum_trailing` query. State per event_type is ONE
  * open (hour, count) bucket, a ring of the last ≤ 6 closed bucket
  * counts (the trailing baseline — the only standardization an online
  * monitor can hold), and the running statistic S as an UNSCALED
  * 9-dp-fixed-point Long. On bucket close: z from the ring's exact
  * integer s1/s2 (the ev_rate_anomaly arithmetic), y = round9(z − k)
  * (0 when the ring holds < 3 buckets or σ² = 0), then the Lindley
  * recursion S ← max(0, S + y) in exact fixed-point — bit-identical to
  * the batch twin's DECIMAL reflection closed form, because both fold
  * the identical exact y sequence. StreamingCusumConvergenceSpec pins
  * stream ≡ batch rows minus each type's still-open last bucket, and
  * multi-batch RocksDB replay ≡ single-batch.
  *
  * Scale note: state is O(|event_types| × 9) longs — index-sized.
  * Late events for closed buckets are dropped AND counted (the
  * RateAnomalyStream discipline) so divergence from the batch twin is
  * observable.
  */
object CusumStream {

  val HourMicros: Long = 3600L * 1000 * 1000
  val TrailLen = 6
  val MinTrail = 3
  /** Must match Round13Queries.CusumK / CusumH. */
  val CusumK = 0.5
  val CusumH = 4.0

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** y = round((n − μ)/σ − k, 9) as an unscaled 9-dp Long — the batch
    * query's exact DECIMAL(28,9) term; 0 when the trailing ring can't
    * standardize. Shared with the spec's oracle replay.
    */
  def yUnscaled(n: Long, trail: Seq[Long]): Long = {
    val tn = trail.length
    if (tn < MinTrail) 0L
    else {
      val s1 = trail.sum
      val s2 = trail.map(c => c * c).sum
      val mu = s1.toDouble / tn
      val va = (s2 - s1.toDouble * s1 / tn) / (tn - 1)
      if (va <= 0) 0L
      else java.math.BigDecimal.valueOf((n - mu) / math.sqrt(va) - CusumK)
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
  }

  class CusumProcessor(
      droppedLate: Option[org.apache.spark.util.LongAccumulator] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, EvRow, CusumVerdict] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var open: ValueState[(Long, Long)] = _
    @transient private var trail: ListState[Long] = _
    @transient private var stat: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[(Long, Long)]("open_bucket",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
      trail = getHandle.getListState[Long]("trail_counts",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      stat = getHandle.getValueState[Long]("cusum_unscaled",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    private def close(h: Long, c: Long,
        out: scala.collection.mutable.ArrayBuffer[CusumVerdict],
        key: String): Unit = {
      val ring = trail.get().toSeq
      val s0 = if (stat.exists()) stat.get() else 0L
      val s1 = math.max(0L, s0 + yUnscaled(c, ring))
      val disp = r6(new java.math.BigDecimal(
        java.math.BigInteger.valueOf(s1), 9).doubleValue())
      out += CusumVerdict(key, h, c, disp, disp > CusumH)
      trail.put(((ring :+ c).takeRight(TrailLen)).toArray)
      stat.update(s1)
    }

    override def handleInputRows(key: String, rows: Iterator[EvRow],
        timerValues: TimerValues): Iterator[CusumVerdict] = {
      val out = scala.collection.mutable.ArrayBuffer[CusumVerdict]()
      rows.toSeq.sortBy(_.tsMicros).foreach { r =>
        val hour = r.tsMicros - java.lang.Math.floorMod(r.tsMicros, HourMicros)
        val cur = if (open.exists()) Option(open.get()) else None
        cur match {
          case Some((h, c)) if h == hour => open.update((h, c + 1))
          case Some((h, _)) if hour < h =>
            droppedLate.foreach(_.add(1L))
          case Some((h, c)) =>
            close(h, c, out, key)
            open.update((hour, 1L))
          case None => open.update((hour, 1L))
        }
      }
      out.iterator
    }
  }

  /** events stream (ts: TimestampType) → per-type closed-bucket CUSUM
    * verdicts, plus the dropped-late accumulator.
    */
  def cusum(events: DataFrame): Dataset[CusumVerdict] =
    cusumWithMetrics(events)._1

  def cusumWithMetrics(events: DataFrame)
      : (Dataset[CusumVerdict], org.apache.spark.util.LongAccumulator) = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val dropped = spark.sparkContext.longAccumulator(
      "graft.cusum.dropped_late")
    val ds = events
      .select(col("event_type").as("eventType"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[EvRow]
      .groupByKey(_.eventType)
      .transformWithState(new CusumProcessor(Some(dropped)),
        TimeMode.None(), OutputMode.Append())
    (ds, dropped)
  }
}
