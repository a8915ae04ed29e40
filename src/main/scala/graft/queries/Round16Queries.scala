package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Layouts
import Round13bQueries.{KcoreK, KcorePeels, kcoreSql, nodeStr}

/** Round-16 batch: the last graph operator whose scale story assumed a
  * broadcastable node set, re-expressed in the co-partitioned
  * discipline the rest of the family already follows (R10b/R14b) —
  *
  *  - graph_kcore_partitioned: k-core peeling with ZERO edge-side
  *    re-exchanges. The broadcast form's peel round is a degree rollup
  *    plus TWO node-sized broadcast semi-joins (one per endpoint);
  *    co-partitioning can kill the src-side one, but a dst-keyed
  *    semi-join would still re-shuffle the edge list every round. The
  *    twin avoids dst joins entirely by exploiting the edge list's
  *    SYMMETRY (both orientations are present): a node's degree inside
  *    the surviving subgraph equals the number of SURVIVING SOURCES
  *    pointing at it —
  *
  *      deg_i(v) = #{u ∈ K_{i−1} : (u,v) ∈ E} = #{u ∈ K_{i−1} : (v,u) ∈ E}
  *
  *    so each round is: survivors shuffle-hash-joined into the
  *    persisted HashPartitioning(src) edge layout (node-sized exchange,
  *    edge side reads its cached blocks in place), then ONE
  *    map-side-combined groupBy(dst) rollup (shuffle volume bounded by
  *    distinct-dst-per-partition, i.e. node-sized — never the edge
  *    list). Peeling is monotone (survivor sets only shrink, so a
  *    peeled node's surviving-neighbor count can never climb back over
  *    k), which is why the filter needs no membership check against the
  *    previous round. Exact integer counting makes the twin
  *    bit-identical to graph_kcore — the oracle is shared verbatim.
  *
  * Scale shape vs graph_kcore: per peel the broadcast form ships the
  * full surviving-node set to every executor twice; the twin's network
  * cost per peel is two node-sized hash shuffles and the edge list
  * never moves after the one up-front layout shuffle. At 100 TB (edge
  * lists of 10¹¹+ rows, node sets past the broadcast budget) the twin
  * is the only viable plan; on the fixture both agree to the row.
  */
object Round16Queries {

  import org.apache.spark.sql.DataFrame

  /** One co-partitioned peel: survivors `kPrev` (a `src` column)
    * shuffle-hash into the persisted edge layout, surviving-source
    * counts roll up per dst, threshold filter. Exposed so Round16Spec
    * can pin the round plan (ShuffledHashJoin, edge side reads its
    * cached blocks with zero re-exchange).
    */
  private[graft] def peelRound(e0: DataFrame, kPrev: DataFrame): DataFrame =
    e0.join(kPrev.hint("shuffle_hash"), "src")
      .groupBy(col("dst")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= KcoreK)
      .select(col("dst").as("src"))

  val defs: Seq[QueryDef] = Seq(

    // ── co-partitioned k-core peeling ────────────────────────────────
    QueryDef(
      "graph_kcore_partitioned",
      (s, dir) => {
        val ePart = RetrievalQueries.transactionEdges(s, dir, partitioned = true)
        val e0 = ePart.select(col("src"), col("dst")) // narrow: keeps the layout
        try {
          // round 1: the full-graph degree rollup — the grouping key IS
          // the persisted partitioning key, so this aggregates in place
          // (no exchange at all)
          val k1 = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= KcoreK)
            .select(col("src"))
          // rounds 2..KcorePeels: count surviving SOURCES per dst
          val kN = (2 to KcorePeels).foldLeft(k1) { (kPrev, _) =>
            peelRound(e0, kPrev)
          }
          // final projection: degrees inside the surviving subgraph,
          // restricted to survivors (a peeled node can retain surviving
          // neighbors; it must not appear in the output)
          e0.join(kN.hint("shuffle_hash"), "src")
            .groupBy(col("dst").as("node")).agg(count(lit(1)).as("deg"))
            .join(kN.withColumnRenamed("src", "node").hint("shuffle_hash"),
              Seq("node"), "semi")
            .select(expr(nodeStr).as("node"), col("deg"))
            .orderBy(col("node"))
            .localCheckpoint(true)
        } finally ePart.unpersist(false)
      },
      Some(kcoreSql),
      doc = s"k-core peeling (k=$KcoreK, $KcorePeels rounds), " +
        "co-partitioned form: survivors shuffle-hash into the persisted " +
        "HashPartitioning(src) edge layout and degrees come off ONE " +
        "map-side-combined groupBy(dst) per round (edge symmetry: " +
        "surviving-source count = surviving-neighbor count) — zero " +
        "edge-side re-exchanges, no node-sized broadcast; bit-identical " +
        "to graph_kcore (shared oracle)."),
  )
}
