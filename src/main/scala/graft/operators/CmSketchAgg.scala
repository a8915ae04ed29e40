package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a typed `Aggregator` (SURVEY §2.5): Cormode &
  * Muthukrishnan 2005 — frequency estimation under bounded memory, the
  * missing member of the sketch family next to KMV (cardinality),
  * bottom-k (rank/quantiles) and SpaceSaving (top-k). The summary is a
  * d×w integer matrix; each input increments one cell per row
  * (positions packed into the input long by the caller, so the md5
  * hashing stays in codegen'd built-ins — ONE md5 per occurrence, the
  * four 32-bit chunks of the digest are the d hash functions). The
  * estimate for a key is the MIN of its d cells — never below the true
  * count (every cell holds true + non-negative collision mass), within
  * ε·N with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Like the other sketches here it is a DETERMINISTIC, merge-order-
  * independent pure function of the input multiset (cell-wise integer
  * sums), so the declared query is hash-green against a DuckDB replay
  * of the same bucket sums — no bounds-only oracle needed. Merge law:
  * cell-wise addition (spec-pinned, CmSketchSpec).
  *
  * Scale shape: d·w longs of state per group whatever the token volume
  * or vocabulary; map-side combine ships one matrix per group per
  * partition. The exact rollup this replaces is a vocabulary-sized
  * (group, token) exchange.
  */
case class CmSketchAgg(d: Int, w: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d, w=$w")
  // capacity check in INTEGER math: w^d ≤ Long.MaxValue/2, folded with
  // a per-step overflow guard (a Double pow rounds near the Long
  // boundary, so an overflowing geometry could sneak past it and
  // corrupt packed positions)
  require({
    val cap = Long.MaxValue / 2
    var acc = 1L; var j = 0; var ok = true
    while (ok && j < d) { ok = acc <= cap / w; if (ok) acc *= w; j += 1 }
    ok
  }, s"packed positions overflow: w^d = $w^$d exceeds Long range")

  override def zero: Array[Long] = new Array[Long](d * w)

  /** One occurrence: `packed` holds the d bucket positions in base w
    * (p0 + w·p1 + w²·p2 + …), computed by the caller from the md5 of
    * the key — unpack and increment one cell per row, in place (the
    * Aggregator contract permits buffer mutation).
    */
  override def reduce(buf: Array[Long], packed: Long): Array[Long] = {
    var rest = packed
    var j = 0
    while (j < d) {
      buf(j * w + (rest % w).toInt) += 1L
      rest /= w
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CmSketchAgg {
  /** Point estimate for a key with packed positions `packed`: the min
    * of its d cells — ≥ the true count always (pinned in CmSketchSpec).
    */
  def estimate(sketch: Array[Long], d: Int, w: Int, packed: Long): Long = {
    var best = Long.MaxValue
    var rest = packed
    var j = 0
    while (j < d) {
      val c = sketch(j * w + (rest % w).toInt)
      if (c < best) best = c
      rest /= w
      j += 1
    }
    best
  }
}
