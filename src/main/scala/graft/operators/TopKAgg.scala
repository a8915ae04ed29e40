package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory per-group top-k as a typed `Aggregator` (SURVEY §2.5).
  *
  * The window-function form (`row_number() OVER (PARTITION BY g ORDER BY
  * v) <= k`) shuffles and sorts EVERY row of the group; this aggregator
  * keeps a k-element buffer per group and merges map-side, so each
  * partition ships at most k rows per group across the exchange — the
  * shape that survives a hot group with billions of rows. Ordering is
  * (value desc, tag asc), matching the deterministic tiebreak the
  * declared q19 query uses.
  */
case class TopKAgg(k: Int)
    extends Aggregator[TopKAgg.In, Seq[TopKAgg.In], Seq[TopKAgg.In]] {
  import TopKAgg.{In, ordering}

  require(k > 0, "k must be positive")

  override def zero: Seq[In] = Nil

  override def reduce(buf: Seq[In], x: In): Seq[In] =
    if (buf.size < k) (buf :+ x).sorted(ordering)
    else if (ordering.compare(x, buf.last) < 0) (buf.init :+ x).sorted(ordering)
    else buf

  override def merge(a: Seq[In], b: Seq[In]): Seq[In] =
    (a ++ b).sorted(ordering).take(k)

  override def finish(buf: Seq[In]): Seq[In] = buf

  override def bufferEncoder: Encoder[Seq[In]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[In]] = ExpressionEncoder()
}

object TopKAgg {
  /** (value, tag): tag is the deterministic tiebreak / row identity. */
  final case class In(value: Double, tag: Long)

  /** value desc, tag asc — identical to q19's window ordering. */
  val ordering: Ordering[In] =
    Ordering.by[In, (Double, Long)](x => (-x.value, x.tag))
}
