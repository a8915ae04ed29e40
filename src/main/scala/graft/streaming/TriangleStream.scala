package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** One id-oriented edge arrival (src < dst — the orientation a stream
  * can compute AT ARRIVAL, no degree table needed), with a
  * monotonically-orderable sequence tag the SPECS use to cut the
  * fixture into micro-batches (the capped-insert rule itself is
  * arrival-order independent, so in-batch processing never consults
  * it).
  */
case class OrientedEdge(src: Long, dst: Long, seq: Long)

/** A node's current capped out-neighbor set (sorted ascending). "Last
  * emission per src" reconstructs the full capped unipartite graph at
  * any cut — the ST20/ST21 tombstone-free reconstruct-from-emissions
  * contract.
  */
case class CappedAdj(src: Long, dsts: Seq[Long])

/** ST26 — streaming degree-capped triangle/adjacency state (round 16):
  * the online counterpart of `graph_triangles_capped`, closing the
  * unipartite gap next to ST21's bipartite capped graph. State per node
  * is its cap smallest DISTINCT out-neighbors under id orientation —
  * O(cap) longs per node; without the cap a hub node's state (and its
  * per-arrival wedge fan-out) grows with its degree, and the degree
  * orientation `graph_triangles` uses to bound that is unavailable
  * online (degrees are only known after the stream ends).
  *
  * The insert rule (ignore if present; insert if room or smaller than
  * the current max, evicting the max) maintains "the cap smallest
  * distinct out-neighbors so far", so the FINAL state is a pure
  * function of the input SET — arrival-order independent, and equal by
  * construction to the batch cap rule (per node keep the TriCap
  * smallest dst ids). StreamingTriangleSpec pins: final reconstructed
  * adjacency ≡ the batch capped edge set, the closed-wedge triangle
  * rollup over it ≡ the declared `graph_triangles_capped` row, and
  * multi-batch RocksDB replay ≡ single-batch with cross-batch
  * evictions proven exercised. Triangle COUNTING over the
  * reconstructed state is the consumer's (batch) rollup — emitting
  * incremental triangle deltas would need retractions whenever an
  * eviction rewrites history, the same at-least-once trap ST21
  * documents.
  */
object TriangleStream {

  class CappedAdjProcessor(cap: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, OrientedEdge, CappedAdj] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

    require(cap >= 1, s"cap must be >= 1, got $cap")

    @transient private var adj: ValueState[Seq[Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      adj = getHandle.getValueState[Seq[Long]]("capped_adj",
        ExpressionEncoder[Seq[Long]](), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[OrientedEdge],
        timerValues: TimerValues): Iterator[CappedAdj] = {
      var s = if (adj.exists()) adj.get() else Seq.empty[Long]
      var changed = false
      // Iterated lazily: the capped-insert rule is arrival-order
      // independent (final state = the cap smallest distinct dsts of
      // the input set), so materializing/sorting the micro-batch would
      // buy nothing and cost memory on hot keys.
      rows.foreach { r =>
        val d = r.dst
        if (!s.contains(d) && (s.size < cap || d < s.last)) {
          s = (s :+ d).sorted.take(cap)
          changed = true
        }
      }
      if (changed) {
        adj.update(s)
        // one snapshot per (node, batch): the contract is
        // last-emission reconstruction, not per-arrival deltas
        Iterator.single(CappedAdj(key, s))
      } else Iterator.empty
    }
  }

  /** id-oriented edge stream (src, dst, seq) → capped-adjacency snapshots. */
  def cappedAdjacency(edges: DataFrame, cap: Int): Dataset[CappedAdj] = {
    val spark = edges.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    edges
      .select(col("src"), col("dst"), col("seq"))
      .as[OrientedEdge]
      .groupByKey(_.src)
      .transformWithState(new CappedAdjProcessor(cap), TimeMode.None(),
        OutputMode.Append())
  }
}
