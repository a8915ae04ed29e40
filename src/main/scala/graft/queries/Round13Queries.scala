package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** Round-13 batch: graph communities, sequential monitoring, corpus
  * statistics, privacy, and the kNN graph —
  *
  *  - LABEL PROPAGATION communities (Raghavan et al. 2007): synchronous
  *    most-frequent-neighbor-label rounds over the transaction graph —
  *    the density-community lens next to the connectivity-only CC;
  *  - CUSUM change-point detection (Page 1954), global- and
  *    trailing-baseline forms. The recursion S_t = max(0, S_{t-1}+y_t)
  *    is evaluated CLOSED-FORM via the Lindley/reflection identity
  *    S_t = C_t − min(0, min_{j≤t} C_j) — two window passes, no
  *    iteration, exact DECIMAL cumsums;
  *  - ZIPF-LAW fit (slope + R² of the log-log rank/frequency line) per
  *    language — the corpus-health diagnostic next to text_ngram_freq;
  *  - LOG-ODDS-RATIO with an informative Dirichlet prior (Monroe,
  *    Colaresi & Quinn 2008): the z-scored keyword comparison of one
  *    source against the rest of the corpus;
  *  - l-DIVERSITY audit (Machanavajjhala et al. 2007): distinct
  *    sensitive values per quasi-identifier cell — the release check
  *    k-anonymity misses (a cell can hold ≥ k rows all from one user);
  *  - the sign-LSH kNN GRAPH: per-vector top-k neighbors among
  *    multiprobe bucket-mates — the build step ahead of graph-based
  *    ANN serving and graph-side corpus analyses.
  *
  * Reference scope note: alxmancilla/parquet-demo has no analytics
  * surface (src/parquet_demo/io.py:21-66 is type coercion + ETL
  * batching); this file is [EXT] like all of SURVEY §2.7.
  */
object Round13Queries {

  import SimilarityQueries.{NBits, hyperplaneSet}

  /** Two independent sign-LSH tables for the kNN graph (family offsets
    * unused by every other LSH consumer): union-of-tables is the
    * standard recall amplifier when every vector is a query — Hamming-1
    * multiprobe on ONE table left recall at ~0.15 on the near-random
    * fixture, two tables clear ~0.3 at 2× candidate cost. Width
    * parameterized for the bits~log2(n) scale rule (the
    * dedup_embedding_ann_scaled discipline): candidates grow as
    * n²/2^bits per table, so widening the signature with the corpus
    * holds per-bucket load — and probe cost — constant.
    */
  def knnTables(bits: Int): Seq[Seq[Seq[Double]]] =
    Seq(hyperplaneSet(11, bits), hyperplaneSet(12, bits))

  /** Production-width signature for the scaled kNN twin (2^12 buckets —
    * the log2 rule's setting for the ×26–×50 probe corpora).
    */
  val KnnScaledBits = 12

  /** Synchronous label-propagation rounds (fixed — both engines replay
    * the identical unrolled recursion; bipartite graphs can oscillate,
    * so a fixed round count IS the declared semantics, not a
    * convergence claim).
    */
  val LpaIters = 4

  /** CUSUM reference value k (in σ units) and decision threshold h. */
  val CusumK = 0.5
  val CusumH = 4.0

  /** l-diversity threshold: a QI cell needs ≥ L distinct users. */
  val LDiversity = 3

  /** kNN graph degree. */
  val KnnK = 5

  /** Monroe-prior total pseudo-count and report size. */
  val OddsAlpha0 = 500.0
  val OddsMinCount = 10
  val OddsTopK = 25

  /** Cosine threshold for semantic-cluster edges (2σ of the fixture's
    * near-random cosine distribution — the pipe_decontaminate_semantic
    * calibration).
    */
  val SemClusterTau = 0.25

  /** Heaps-law prefix snapshot count. */
  val HeapsCuts = 10

  private val nodeStr =
    "IF(node % 2 = 0, concat('c', node div 2), concat('s', node div 2))"
  private val lblStr =
    "IF(lbl % 2 = 0, concat('c', lbl div 2), concat('s', lbl div 2))"

  private def tokenized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .transform(graft.operators.Layouts.spread)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(lower(col("text")), " ")).as("tok"))

  private val tokenizedDuck =
    """(SELECT doc_id, lang, source, unnest(string_split(lower(text), ' ')) AS tok
       FROM documents)"""

  private[queries] def vectors(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))

  private[queries] val vectorsDuck =
    """vecs AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       nvecs AS (
         SELECT vec_id, v, %s AS nrm FROM vecs)""".format(VectorOps.duckNorm("v"))

  /** Shared hourly (event_type, ws, n) rollup — the ev_rate_anomaly
    * series (one map-side-combinable shuffle collapses the corpus;
    * everything downstream is |types|·|hours|-sized).
    */
  private def hourlyCounts(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))

  private val hourlyDuck =
    """counts AS (
         SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
           count(*) AS n
         FROM events GROUP BY 1, 2)"""

  /** CUSUM closed form over a per-type y series: C = cumsum(y),
    * S = C − min(0, min-prefix(C)) — the Lindley recursion
    * S_t = max(0, S_{t-1} + y_t) without iteration. `y` must be an
    * exact DECIMAL(28,9) column so both cumulative windows are exact
    * integer arithmetic; the one double appears in the final display
    * cast.
    */
  private def cusumCols(df: DataFrame): DataFrame = {
    val wAll = Window.partitionBy(col("event_type")).orderBy(col("ws"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("cs", sum(col("y")).over(wAll))
      .withColumn("mn", least(min(col("cs")).over(wAll),
        lit(BigDecimal(0)).cast(DecimalType(38, 9))))
      // subtract at DECIMAL(30,9): a (38,9)−(38,9) difference needs
      // precision 39, and Spark's precision-loss rule would silently
      // round the result to scale 8 — the narrower operands keep the
      // exact 9-dp value (|C| is bounded by #buckets·|y|, nowhere near
      // 10^21), and match DuckDB's scale-preserving subtraction
      .withColumn("cusum", round((col("cs").cast(DecimalType(30, 9))
        - col("mn").cast(DecimalType(30, 9))).cast(DoubleType), 6))
      .withColumn("is_alarm", col("cusum") > CusumH)
  }

  /** Final LPA label table (node, lbl) after LpaIters synchronous
    * rounds — shared by graph_label_prop(+_partitioned) and
    * graph_modularity(+_partitioned).
    *
    * @param bcast join strategy for the per-round edges ⋈ labels join:
    *   `true` broadcasts the node-sized label table (fixture-fast,
    *   assumes nodes ≪ broadcast budget); `false` is the R6
    *   co-partitioned layout — edges checkpointed hash-partitioned on
    *   `src`, each round shuffle-hash-joins the label table into that
    *   fixed layout (the edge side never re-exchanges) and
    *   localCheckpoints the round result (the pagerank_partitioned
    *   discipline: at scale, materialized rounds beat one deep nested
    *   plan — ×50 probe measured 127.7 s nested vs ~38 s
    *   checkpoint-at-a-time). Bit-identical label tables either way
    *   (exact integer counts, deterministic min-label argmax).
    */
  private[graft] def lpaFinal(s: SparkSession, dir: String,
      bcast: Boolean = true): (DataFrame, DataFrame) = {
    val edges = RetrievalQueries.transactionEdges(s, dir, partitioned = !bcast)
    val l0 = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    val fin = (1 to LpaIters).foldLeft(l0) { (l, i) =>
      val next = lpaRound(edges, l, bcast)
      if (bcast) next
      else {
        // localCheckpoint is EAGER: once round i's blocks exist, round
        // i−1's node-sized blocks are dead weight for the rest of the
        // job (round i's plan scans its OWN rdd, no lineage back), and
        // neither clearCache() nor Dataset.unpersist releases them —
        // the blocks belong to the checkpointed RDD, which the cache
        // manager never sees. Free that RDD directly. Round 0 (l0) is
        // plain lineage: skip.
        val cp = next.localCheckpoint()
        if (i > 1) graft.operators.Layouts.releaseCheckpoint(l)
        cp
      }
    }
    (edges, fin)
  }

  /** One synchronous LPA round: edges ⋈ labels (broadcast or
    * co-partitioned shuffle-hash into the edges' checkpointed layout —
    * the edge side never re-exchanges), one (node, lbl) count shuffle,
    * node-partitioned argmax window. Exposed so the spec can pin the
    * bcast=false round plan (exactly 3 exchanges: label side, count
    * rollup, argmax window — none above the edge scan).
    */
  private[graft] def lpaRound(edges: DataFrame, l: DataFrame,
      bcast: Boolean): DataFrame = {
    val wArg = Window.partitionBy(col("node"))
      .orderBy(col("c").desc, col("lbl").asc)
    val lbls = l.withColumnRenamed("node", "src")
    val joined =
      if (bcast) edges.join(broadcast(lbls), "src")
      else edges.join(lbls.hint("shuffle_hash"), "src")
    joined
      .select(col("dst").as("node"), col("lbl"))
      .groupBy(col("node"), col("lbl"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .select(col("node"), col("lbl"))
  }

  /** The (node, community, community_size) projection over a final LPA
    * label table — shared by both graph_label_prop forms.
    */
  private[queries] def lpaProject(fin: DataFrame): DataFrame = {
    val wc = Window.partitionBy(col("lbl"))
    fin
      .withColumn("community_size", count(lit(1)).over(wc))
      .select(expr(nodeStr).as("node"), expr(lblStr).as("community"),
        col("community_size"))
      .orderBy(col("node"))
  }

  /** Newman-Girvan modularity of the LPA partition — shared plan for
    * graph_modularity (broadcast label joins) and
    * graph_modularity_partitioned (shuffle-hash label joins over the
    * src-partitioned edge layout; no node-sized broadcast anywhere).
    * Exact integer counting in both forms ⇒ bit-identical output.
    */
  private[graft] def modularityPlan(s: SparkSession, dir: String,
      bcast: Boolean): DataFrame = {
    val (edges, fin0) = lpaFinal(s, dir, bcast)
    // four consumers below (e_in twice, K_c, node count) — cut the
    // 4-round LPA lineage once; the label table is node-sized. The
    // bcast=false path already returns a checkpointed final round —
    // don't copy its blocks a second time.
    val fin = if (bcast) fin0.localCheckpoint() else fin0
    def lblJoin(df: DataFrame, lbls: DataFrame, key: String): DataFrame =
      if (bcast) df.join(broadcast(lbls), key)
      else df.join(lbls.hint("shuffle_hash"), key)
    val deg = edges.select(col("src").as("node"), col("deg")).distinct()
    val eIn = lblJoin(
      lblJoin(edges, fin.select(col("node").as("src"), col("lbl").as("la")), "src"),
      fin.select(col("node").as("dst"), col("lbl").as("lb")), "dst")
      .filter(col("la") === col("lb"))
      .agg(count(lit(1)).as("e_in"))
    val kc = lblJoin(deg, fin, "node")
      .groupBy(col("lbl")).agg(sum(col("deg")).as("kc"))
    val sk = kc.agg(
      count(lit(1)).as("n_communities"),
      sum((col("kc") * col("kc")).cast(DecimalType(38, 0))).as("sk2"))
    val nn = fin.agg(count(lit(1)).as("n_nodes"))
    val ee = edges.agg(count(lit(1)).as("e"))
    val out = nn.crossJoin(broadcast(sk)).crossJoin(broadcast(eIn))
      .crossJoin(broadcast(ee))
      .select(col("n_nodes"), col("n_communities"),
        expr("e div 2").as("m_edges"),
        round(expr(
          "CAST(e_in AS DOUBLE) / e - CAST(sk2 AS DOUBLE) / (CAST(e AS DOUBLE) * e)"), 6)
          .as("modularity"))
    if (bcast) out
    else {
      // materialize the 1-row result, then release the persisted edge
      // layout the rollups above consumed (CacheHygieneSpec policy)
      val mat = out.localCheckpoint()
      graft.operators.Layouts.releaseCheckpoint(edges)
      mat
    }
  }

  /** Shared oracle for graph_label_prop and graph_label_prop_partitioned
    * (bit-identical label tables by construction).
    */
  private[queries] def lpaSql: String =
    s"""WITH $lpaDuckCtes
        SELECT
          CASE WHEN node % 2 = 0 THEN 'c' || (node // 2)
               ELSE 's' || (node // 2) END AS node,
          CASE WHEN lbl % 2 = 0 THEN 'c' || (lbl // 2)
               ELSE 's' || (lbl // 2) END AS community,
          count(*) OVER (PARTITION BY lbl) AS community_size
        FROM l$LpaIters
        ORDER BY node"""

  /** Shared oracle for graph_modularity and graph_modularity_partitioned. */
  private[queries] def modularitySql: String =
    s"""WITH $lpaDuckCtes,
        deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
        e_in_t AS (
          SELECT count(*) AS e_in
          FROM edges e
          JOIN l$LpaIters a ON e.src = a.node
          JOIN l$LpaIters b ON e.dst = b.node
          WHERE a.lbl = b.lbl),
        kc AS (
          SELECT l.lbl, sum(deg) AS kc
          FROM deg d JOIN l$LpaIters l ON d.node = l.node
          GROUP BY l.lbl),
        sk AS (
          SELECT count(*) AS n_communities, sum(kc * kc) AS sk2 FROM kc),
        nn AS (SELECT count(*) AS n_nodes FROM l$LpaIters),
        ee AS (SELECT count(*) AS e FROM edges)
      SELECT n_nodes, n_communities, e // 2 AS m_edges,
        round(CAST(e_in AS DOUBLE) / e - CAST(sk2 AS DOUBLE) / (CAST(e AS DOUBLE) * e), 6)
          AS modularity
      FROM nn CROSS JOIN sk CROSS JOIN e_in_t CROSS JOIN ee"""

  /** The LPA rounds + edge CTEs shared by both graph oracles. */
  private def lpaDuckCtes: String = {
    val rounds = (1 to LpaIters).map { i =>
      s"""l$i AS (
         SELECT node, lbl FROM (
           SELECT e.dst AS node, l.lbl, count(*) AS c,
             row_number() OVER (PARTITION BY e.dst
               ORDER BY count(*) DESC, l.lbl ASC) AS rn
           FROM edges e JOIN l${i - 1} l ON e.src = l.node
           GROUP BY e.dst, l.lbl) WHERE rn = 1)"""
    }.mkString(",\n")
    s"""pairs AS (
        SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL
        SELECT b AS src, a AS dst FROM pairs),
      l0 AS (
        SELECT node, node AS lbl
        FROM (SELECT DISTINCT src AS node FROM edges)),
      $rounds"""
  }

  /** The two-table multiprobe kNN graph (vec_id, rank, neighbor_id,
    * cosine) — shared by sim_knn_graph and sim_semantic_clusters.
    * Materialized (localCheckpoint) so the corpus-bucket cache releases
    * before the caller composes further stages.
    */
  private[graft] def knnGraph(s: SparkSession, dir: String,
      bits: Int = NBits): DataFrame = {
    val (res, all) = knnGraphPlan(s, dir, bits)
    try res.localCheckpoint(true)
    finally all.unpersist(false)
  }

  /** Materializing form over a caller-prepared corpus (see
    * [[knnGraphPlanFrom]]).
    */
  private[graft] def knnGraphFrom(base: DataFrame,
      bits: Int = NBits): DataFrame = {
    val (res, all) = knnGraphPlanFrom(base, bits)
    try res.localCheckpoint(true)
    finally all.unpersist(false)
  }

  /** The un-materialized kNN pipeline plus its persisted bucket stage —
    * `knnGraph` checkpoints it (so composing consumers read blocks, not
    * lineage); Plans dumps this form, since the checkpointed result's
    * plan is a bare RDD scan.
    */
  private[graft] def knnGraphPlan(s: SparkSession, dir: String,
      bits: Int = NBits): (DataFrame, DataFrame) =
    knnGraphPlanFrom(vectors(s, dir), bits)

  /** The same pipeline over a caller-prepared (vec_id, v, nrm) corpus —
    * the round-20 shared-prepared-corpus seam: the declared rows pass
    * the raw scan (plan unchanged), the graph-recall audit threads ONE
    * persisted corpus through every build it prices (the
    * sim_index_recall discipline).
    */
  private[graft] def knnGraphPlanFrom(base: DataFrame,
      bits: Int = NBits): (DataFrame, DataFrame) = {
    val s = base.sparkSession
    val tables = knnTables(bits)
    def bucketCol(t: Int) = (0 until bits).map { b =>
      when(VectorOps.dot(col("v"), typedLit(tables(t)(b))) >= 0.0,
        lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    val all = base
      .withColumn("b0", bucketCol(0)).withColumn("b1", bucketCol(1))
      .transform(graft.operators.Layouts.spread)
      .persist()
    // per table: own bucket + the `bits` Hamming-1 flips; the table
    // index is folded into the join key so tables never cross-match
    def probeCol(bc: String, t: Int) = array(
      ((col(bc) + lit(t << bits)) +: (0 until bits).map(b =>
        col(bc).bitwiseXOR(lit(1 << b)) + lit(t << bits))): _*)
    // score IN-BUCKET, narrow and codegen'd, BEFORE the pair dedup: a
    // pair found by several probes/tables scores identically each time,
    // so max() dedups it and the (query, neighbor) shuffle carries 8
    // bytes of cosine instead of two 64-dim vectors — the first draft
    // shuffled first(v)/first(qv) per candidate and went quadratic in
    // shuffle BYTES (×10 probe: 241 s, ×26: out of disk); this form
    // re-scores duplicate candidates (cheap in-row math) to keep the
    // one wide-payload stage out of the plan entirely
    val cand = Seq(("b0", 0), ("b1", 1)).map { case (bc, t) =>
      val corpus = all.select(col("vec_id"), col("v"), col("nrm"),
        (col(bc) + lit(t << bits)).as("bucket"))
      val q = all.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), explode(probeCol(bc, t)).as("bucket"))
      corpus.join(q.hint("shuffle_hash"), Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(VectorOps.cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6)
            .as("cosine"))
    }.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cosine")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val res = cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnK)
      .select(col("query_id").as("vec_id"), col("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("vec_id"), col("rank"))
    (res, all)
  }

  /** kNN graph → τ-edges → connected components, width-parameterized —
    * shared by sim_semantic_clusters (fixture 8-bit index) and
    * sim_semantic_clusters_scaled (bits = KnnScaledBits, the log2-n
    * production width). The cluster stage is identical either way: the
    * bits parameter only changes which kNN build feeds it — and with it
    * whether candidate volume stays ~n·k as the corpus grows.
    */
  private[queries] def semanticClusters(s: SparkSession, dir: String,
      bits: Int = NBits): DataFrame =
    clusterStage(s, dir, knnGraph(s, dir, bits))

  /** τ-edges → shared CC → singleton fill over ANY materialized kNN
    * graph (vec_id, rank, neighbor_id, cosine) — the stage every
    * sim_semantic_clusters variant shares; only the kNN build feeding
    * it changes (8-bit fixture, 12-bit scaled, round-16 auto width).
    */
  private[queries] def clusterStage(s: SparkSession, dir: String,
      knnGraph: DataFrame): DataFrame = {
    val knn = knnGraph
      .filter(col("cosine") >= SemClusterTau)
      .select(col("vec_id"), col("neighbor_id"))
    val labels = graft.operators.ConnectedComponents.run(knn)
    val all = vectors(s, dir).select(col("vec_id"))
    val wc = Window.partitionBy(col("cluster_id"))
    all
      .join(labels.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("vec_id")))
      .withColumn("cluster_size", count(lit(1)).over(wc))
      .select(col("cluster_id"), col("vec_id"), col("cluster_size"))
      .orderBy(col("cluster_id"), col("vec_id"))
  }

  /** Canonical undirected τ-edge projection of a materialized kNN graph
    * (vec_id, rank, neighbor_id, cosine): exactly the edge set
    * `clusterStage` resolves with CC, as (least, greatest) pairs. The
    * cosine is direction-independent (same rounded expression both
    * ways), so the max() is a dedup, not a choice. These edge rows are
    * the HASH-GREEN half of the semantic-cluster oracle split (SURVEY
    * §5 note 14): the closure itself is replayed by a Scala union-find
    * in the specs, because DuckDB's recursive-CTE reachability is
    * quadratic in cluster size (measured 117–351 s PER VARIANT at
    * sf0.01 — it was the round-16 gate's timeout).
    */
  private[queries] def tauEdges(knnGraph: DataFrame): DataFrame =
    knnGraph
      .filter(col("cosine") >= SemClusterTau)
      .select(least(col("vec_id"), col("neighbor_id")).as("vec_a"),
        greatest(col("vec_id"), col("neighbor_id")).as("vec_b"),
        col("cosine"))
      .groupBy(col("vec_a"), col("vec_b"))
      .agg(max(col("cosine")).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))

  /** τ-edge oracle over ANY kNN CTE chain ending in `ranked` — the
    * non-recursive replacement for the retired reachability-closure
    * oracle (shared by the fixture, scaled, and auto-width variants).
    */
  private[graft] def tauEdgesSqlOver(knnCtes: String): String =
    s"""WITH $knnCtes,
        knn AS (
          SELECT query_id, neighbor_id, cosine FROM ranked
          WHERE rank <= $KnnK AND cosine >= $SemClusterTau)
      SELECT least(query_id, neighbor_id) AS vec_a,
        greatest(query_id, neighbor_id) AS vec_b,
        max(cosine) AS cosine
      FROM knn GROUP BY 1, 2 ORDER BY 1, 2"""

  /** The τ-edge oracle at a given signature width. */
  private[queries] def tauEdgesSql(bits: Int = NBits): String =
    tauEdgesSqlOver(knnDuckCtes(bits))

  /** The full kNN-graph oracle statement at `bits` as a named builder —
    * the declared rows (fixture and scaled) AND the round-19 recall
    * audit nest this IDENTICAL statement (one definition, no drift).
    */
  private[graft] def knnGraphDuckSql(bits: Int = NBits): String =
    s"""WITH ${knnDuckCtes(bits)}
      SELECT query_id AS vec_id, rank, neighbor_id, cosine FROM ranked
      WHERE rank <= $KnnK ORDER BY vec_id, rank"""

  /** The kNN-graph oracle CTE chain, ending in `ranked` (query_id,
    * neighbor_id, cosine, rank) — shared by both consumers.
    */
  private def knnDuckCtes(bits: Int = NBits): String = {
    val tables = knnTables(bits)
    def bucketSql(t: Int) = (0 until bits).map { b =>
      val lits = tables(t)(b).mkString("[", ", ", "]")
      s"(CASE WHEN ${VectorOps.duckDot("v", lits)} >= 0.0 THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")
    def probes(t: Int) = (0 to bits).map {
      case 0 => s"b$t + ${t << bits}"
      case b => s"xor(b$t, ${1 << (b - 1)}) + ${t << bits}"
    }.mkString("[", ", ", "]")
    s"""$vectorsDuck,
      bucketed AS (
        SELECT vec_id, v, nrm, ${bucketSql(0)} AS b0, ${bucketSql(1)} AS b1
        FROM nvecs),
      corpus AS (
        SELECT vec_id, v, nrm, b0 AS bucket FROM bucketed
        UNION ALL
        SELECT vec_id, v, nrm, b1 + ${1 << bits} AS bucket FROM bucketed),
      q AS (
        SELECT vec_id AS query_id, unnest(${probes(0)}) AS bucket
        FROM bucketed
        UNION ALL
        SELECT vec_id AS query_id, unnest(${probes(1)}) AS bucket
        FROM bucketed),
      cand AS (
        SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
        FROM corpus a JOIN q ON a.bucket = q.bucket
          AND a.vec_id <> q.query_id),
      sims AS (
        SELECT c.query_id, c.neighbor_id,
          round(${VectorOps.duckDot("a.v", "b.v")} / (a.nrm * b.nrm), 6) AS cosine
        FROM cand c
        JOIN nvecs b ON b.vec_id = c.query_id
        JOIN nvecs a ON a.vec_id = c.neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM sims)"""
  }

  val defs: Seq[QueryDef] = Seq(

    // ── label-propagation communities (Raghavan et al. 2007) ─────────
    // The density lens on the transaction graph: CC answers "connected
    // at all?", LPA answers "which tightly-co-ordering block?". Each
    // synchronous round: every node adopts its neighbors' most frequent
    // label (tie → smallest label id). Per round: edges ⋈ broadcast
    // labels (the graph_pagerank shape — the label table is node-sized)
    // + ONE groupBy(node, lbl) shuffle + a node-partitioned argmax
    // window on the label-bounded aggregate. The checkpointed edge list
    // is shared with every other graph op; the co-partitioned rankJoin
    // form applies verbatim when the node table outgrows broadcast.
    QueryDef(
      "graph_label_prop",
      (s, dir) => lpaProject(lpaFinal(s, dir)._2),
      Some(lpaSql),
      doc = s"Label propagation ($LpaIters synchronous rounds, " +
        "most-frequent-neighbor label, min-label ties): per round one " +
        "edges x broadcast-labels join + one (node, lbl) count shuffle " +
        "+ a node-partitioned argmax window; shared checkpointed edge " +
        "list; the co-partitioned rank-join form applies when the node " +
        "table outgrows broadcast."),

    // ── CUSUM change-point, global baseline (Page 1954) ──────────────
    // Standardize each type's hourly counts against the type's WHOLE
    // series (exact integer s1/s2 → μ, σ), y = z − k, then the
    // reflection closed form — a drift in the level makes S ramp where
    // a z-threshold (ev_rate_anomaly) only fires on single-bucket
    // spikes. Everything after the one (type, hour) rollup is
    // aggregated-series-sized; the two stacked windows run on the SAME
    // (event_type, ws)-sorted partitioning — one sort, no extra
    // exchange.
    QueryDef(
      "ev_cusum",
      (s, dir) => {
        val wTyp = Window.partitionBy(col("event_type"))
        val st = hourlyCounts(s, dir)
          .withColumn("tn", count(lit(1)).over(wTyp))
          .withColumn("s1", sum(col("n")).over(wTyp))
          .withColumn("s2", sum(col("n") * col("n")).over(wTyp))
          .withColumn("mu", col("s1").cast(DoubleType) / col("tn"))
          .withColumn("va", expr(
            "CASE WHEN tn > 1 THEN (s2 - CAST(s1 AS DOUBLE) * s1 / tn) / (tn - 1) ELSE 0.0 END"))
          .withColumn("y", expr(
            s"CAST(round(CASE WHEN tn >= 3 AND va > 0 " +
              s"THEN (n - mu) / sqrt(va) - $CusumK ELSE 0.0 END, 9) AS DECIMAL(28,9))"))
        cusumCols(st)
          .select(col("ws"), col("event_type"), col("n"), col("cusum"),
            col("is_alarm"))
          .orderBy(col("event_type"), col("ws"))
      },
      Some(s"""WITH $hourlyDuck,
          st AS (
            SELECT ws, event_type, n,
              count(*) OVER t AS tn,
              sum(n) OVER t AS s1,
              sum(n * n) OVER t AS s2
            FROM counts
            WINDOW t AS (PARTITION BY event_type)),
          ys AS (
            SELECT ws, event_type, n,
              CAST(round(CASE WHEN tn >= 3 AND
                  (CASE WHEN tn > 1 THEN (s2 - CAST(s1 AS DOUBLE) * s1 / tn) / (tn - 1) ELSE 0.0 END) > 0
                THEN (n - CAST(s1 AS DOUBLE) / tn) /
                  sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / tn) / (tn - 1)) - $CusumK
                ELSE 0.0 END, 9) AS DECIMAL(28,9)) AS y
            FROM st),
          cum AS (
            SELECT ws, event_type, n,
              sum(y) OVER w AS cs
            FROM ys
            WINDOW w AS (PARTITION BY event_type ORDER BY ws
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          refl AS (
            SELECT ws, event_type, n, cs,
              least(min(cs) OVER w, CAST(0 AS DECIMAL(38,9))) AS mn
            FROM cum
            WINDOW w AS (PARTITION BY event_type ORDER BY ws
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          SELECT ws, event_type, n,
            round(CAST(CAST(cs AS DECIMAL(30,9)) - CAST(mn AS DECIMAL(30,9)) AS DOUBLE), 6) AS cusum,
            round(CAST(CAST(cs AS DECIMAL(30,9)) - CAST(mn AS DECIMAL(30,9)) AS DOUBLE), 6) > $CusumH AS is_alarm
          FROM refl
          ORDER BY event_type, ws"""),
      doc = "One-sided CUSUM (Page 1954) on hourly event rates, global " +
        "baseline: S_t = max(0, S_{t-1} + z_t - k) evaluated closed-form " +
        "as C_t - min(0, prefix-min C) — two exact-DECIMAL window passes " +
        "over the aggregated series, no iteration."),

    // ── CUSUM, trailing baseline — the streaming twin's semantics ────
    // Same closed form, but z standardizes against the trailing ≤ 6
    // OBSERVED buckets (the ev_rate_anomaly frame), which is the state
    // an ONLINE monitor can actually hold: graft.streaming.CusumStream
    // replays exactly this arithmetic per closed bucket
    // (StreamingCusumConvergenceSpec pins stream ≡ these rows minus
    // each type's still-open last bucket).
    QueryDef(
      "ev_cusum_trailing",
      (s, dir) => {
        val wTrail = Window.partitionBy(col("event_type")).orderBy(col("ws"))
          .rowsBetween(-6, -1)
        val st = hourlyCounts(s, dir)
          .withColumn("tn", count(col("n")).over(wTrail))
          .withColumn("s1", sum(col("n")).over(wTrail))
          .withColumn("s2", sum(col("n") * col("n")).over(wTrail))
          .withColumn("mu", col("s1").cast(DoubleType) / col("tn"))
          .withColumn("va", expr(
            "CASE WHEN tn > 1 THEN (s2 - CAST(s1 AS DOUBLE) * s1 / tn) / (tn - 1) ELSE 0.0 END"))
          .withColumn("y", expr(
            s"CAST(round(CASE WHEN tn >= 3 AND va > 0 " +
              s"THEN (n - mu) / sqrt(va) - $CusumK ELSE 0.0 END, 9) AS DECIMAL(28,9))"))
        cusumCols(st)
          .select(col("ws"), col("event_type"), col("n"), col("cusum"),
            col("is_alarm"))
          .orderBy(col("event_type"), col("ws"))
      },
      Some(s"""WITH $hourlyDuck,
          st AS (
            SELECT ws, event_type, n,
              count(n) OVER t AS tn,
              sum(n) OVER t AS s1,
              sum(n * n) OVER t AS s2
            FROM counts
            WINDOW t AS (PARTITION BY event_type ORDER BY ws
              ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)),
          ys AS (
            SELECT ws, event_type, n,
              CAST(round(CASE WHEN tn >= 3 AND
                  (CASE WHEN tn > 1 THEN (s2 - CAST(s1 AS DOUBLE) * s1 / tn) / (tn - 1) ELSE 0.0 END) > 0
                THEN (n - CAST(s1 AS DOUBLE) / tn) /
                  sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / tn) / (tn - 1)) - $CusumK
                ELSE 0.0 END, 9) AS DECIMAL(28,9)) AS y
            FROM st),
          cum AS (
            SELECT ws, event_type, n,
              sum(y) OVER w AS cs
            FROM ys
            WINDOW w AS (PARTITION BY event_type ORDER BY ws
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          refl AS (
            SELECT ws, event_type, n, cs,
              least(min(cs) OVER w, CAST(0 AS DECIMAL(38,9))) AS mn
            FROM cum
            WINDOW w AS (PARTITION BY event_type ORDER BY ws
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          SELECT ws, event_type, n,
            round(CAST(CAST(cs AS DECIMAL(30,9)) - CAST(mn AS DECIMAL(30,9)) AS DOUBLE), 6) AS cusum,
            round(CAST(CAST(cs AS DECIMAL(30,9)) - CAST(mn AS DECIMAL(30,9)) AS DOUBLE), 6) > $CusumH AS is_alarm
          FROM refl
          ORDER BY event_type, ws"""),
      doc = "Trailing-baseline CUSUM: z against the trailing <= 6 " +
        "observed buckets (the state an online monitor holds), same " +
        "reflection closed form; batch twin of streaming CusumStream."),

    // ── Zipf-law fit per language (Zipf 1949) ────────────────────────
    // slope/R² of ln(freq) ~ ln(rank) over the per-language vocabulary:
    // natural text sits near slope −1; a corpus whose slope drifts flat
    // (templated/boilerplate text) or steep (tiny vocab) fails the
    // health check. One token-count shuffle (vocab-sized output), one
    // per-language rank window over the VOCAB (Heaps-bounded, not the
    // corpus), then exact DECIMAL sums of 9-dp-rounded log terms — the
    // regression scalars are bit-reproducible at any partitioning;
    // doubles appear only in the final slope/R² display math.
    QueryDef(
      "text_zipf_fit",
      (s, dir) => {
        val wRank = Window.partitionBy(col("lang"))
          .orderBy(col("cnt").desc, col("tok").asc)
        val terms = tokenized(s, dir)
          .groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rnk", row_number().over(wRank))
          .withColumn("x", expr("ln(CAST(rnk AS DOUBLE))"))
          .withColumn("yv", expr("ln(CAST(cnt AS DOUBLE))"))
          .select(col("lang"),
            expr("CAST(round(x, 9) AS DECIMAL(28,9))").as("xr"),
            expr("CAST(round(yv, 9) AS DECIMAL(28,9))").as("yr"),
            expr("CAST(round(x * x, 9) AS DECIMAL(28,9))").as("xx"),
            expr("CAST(round(x * yv, 9) AS DECIMAL(28,9))").as("xy"),
            expr("CAST(round(yv * yv, 9) AS DECIMAL(28,9))").as("yy"))
        terms
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_terms"),
            sum(col("xr")).as("sx"), sum(col("yr")).as("sy"),
            sum(col("xx")).as("sxx"), sum(col("xy")).as("sxy"),
            sum(col("yy")).as("syy"))
          .withColumn("slope", round(expr(
            """(n_terms * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (n_terms * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 6))
          .withColumn("r2", round(expr(
            """((n_terms * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                * (n_terms * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
               / ((n_terms * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (n_terms * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""), 6))
          .select(col("lang"), col("n_terms"), col("slope"), col("r2"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH cnts AS (
          SELECT lang, tok, count(*) AS cnt FROM $tokenizedDuck
          GROUP BY lang, tok),
        ranked AS (
          SELECT lang, cnt,
            row_number() OVER (PARTITION BY lang
              ORDER BY cnt DESC, tok ASC) AS rnk
          FROM cnts),
        terms AS (
          SELECT lang,
            CAST(round(ln(CAST(rnk AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xr,
            CAST(round(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(28,9)) AS yr,
            CAST(round(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xx,
            CAST(round(ln(CAST(rnk AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xy,
            CAST(round(ln(CAST(cnt AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(28,9)) AS yy
          FROM ranked),
        agg AS (
          SELECT lang, count(*) AS n_terms,
            sum(xr) AS sx, sum(yr) AS sy,
            sum(xx) AS sxx, sum(xy) AS sxy, sum(yy) AS syy
          FROM terms GROUP BY lang)
        SELECT lang, n_terms,
          round((n_terms * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n_terms * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
          round(((n_terms * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (n_terms * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
            / ((n_terms * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (n_terms * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        FROM agg
        ORDER BY lang"""),
      doc = "Zipf-law fit per language: OLS slope + R^2 of ln(freq) ~ " +
        "ln(rank) over the vocabulary; one vocab-sized count shuffle, " +
        "rank window over the vocab, exact-DECIMAL regression scalars."),

    // ── log-odds-ratio keywords, informative Dirichlet prior ─────────
    // Monroe, Colaresi & Quinn 2008 "Fightin' Words": which tokens mark
    // the (lexicographically first) source vs the rest of the corpus?
    // δ_w = ln((y_aw+α_w)/(n_a+α₀−y_aw−α_w)) − ln_b(...), σ² ≈
    // 1/(y_aw+α_w) + 1/(y_bw+α_w), z = δ/σ — the prior shrinks rare
    // words toward zero, the classic fix for raw log-odds exploding on
    // hapax terms. Shape: one vocab-sized token-count shuffle with a
    // conditional split (no second corpus pass), scalar totals
    // broadcast, TakeOrdered top-k.
    // Scope note (like the IVFPQ no-residual note): the prior totals
    // na/nb/nt are computed over the min-count-FILTERED vocabulary, not
    // the full corpus token totals of Monroe et al. — the α_w shrinkage
    // weights shift accordingly (identically in both engines and in the
    // spec replay); computing totals before the HAVING filter would be
    // the paper-literal form.
    QueryDef(
      "text_odds_ratio",
      (s, dir) => {
        val tk = tokenized(s, dir)
        val aSrc = broadcast(tk.agg(min(col("source")).as("a_src")))
        val cnts = tk.crossJoin(aSrc)
          .groupBy(col("tok"))
          .agg(
            sum(when(col("source") === col("a_src"), 1L).otherwise(0L)).as("cnt_a"),
            sum(when(col("source") =!= col("a_src"), 1L).otherwise(0L)).as("cnt_b"))
          .filter(col("cnt_a") + col("cnt_b") >= OddsMinCount)
        val tots = broadcast(cnts.agg(
          sum(col("cnt_a")).as("na"), sum(col("cnt_b")).as("nb"),
          sum(col("cnt_a") + col("cnt_b")).as("nt")))
        // CAST the prior literal to DOUBLE explicitly: a bare `500.0`
        // parses as DECIMAL in both engines and their decimal-division
        // scale rules differ — all prior math must be IEEE doubles
        cnts.crossJoin(tots)
          .withColumn("aw", expr(
            s"CAST($OddsAlpha0 AS DOUBLE) * (cnt_a + cnt_b) / nt"))
          .withColumn("delta", expr(
            s"""ln((cnt_a + aw) / (na + CAST($OddsAlpha0 AS DOUBLE) - cnt_a - aw))
               - ln((cnt_b + aw) / (nb + CAST($OddsAlpha0 AS DOUBLE) - cnt_b - aw))"""))
          .withColumn("z", round(
            expr("delta / sqrt(1.0 / (cnt_a + aw) + 1.0 / (cnt_b + aw))"), 6))
          .select(col("tok"), col("cnt_a"), col("cnt_b"),
            round(col("delta"), 6).as("delta"), col("z"))
          .orderBy(abs(col("z")).desc, col("tok").asc)
          .limit(OddsTopK)
      },
      Some(s"""WITH tk AS (SELECT * FROM $tokenizedDuck),
          asrc AS (SELECT min(source) AS a_src FROM tk),
          cnts AS (
            SELECT tok,
              sum(CASE WHEN source = a_src THEN 1 ELSE 0 END) AS cnt_a,
              sum(CASE WHEN source <> a_src THEN 1 ELSE 0 END) AS cnt_b
            FROM tk CROSS JOIN asrc
            GROUP BY tok
            HAVING sum(CASE WHEN source = a_src THEN 1 ELSE 0 END)
                 + sum(CASE WHEN source <> a_src THEN 1 ELSE 0 END) >= $OddsMinCount),
          tots AS (
            SELECT sum(cnt_a) AS na, sum(cnt_b) AS nb,
              sum(cnt_a + cnt_b) AS nt
            FROM cnts),
          aws AS (
            SELECT tok, cnt_a, cnt_b, na, nb,
              CAST($OddsAlpha0 AS DOUBLE) * (cnt_a + cnt_b) / nt AS aw
            FROM cnts CROSS JOIN tots),
          scored AS (
            SELECT tok, cnt_a, cnt_b, aw,
              ln((cnt_a + aw) / (na + CAST($OddsAlpha0 AS DOUBLE) - cnt_a - aw))
                - ln((cnt_b + aw) / (nb + CAST($OddsAlpha0 AS DOUBLE) - cnt_b - aw)) AS delta
            FROM aws)
          SELECT tok, CAST(cnt_a AS BIGINT) AS cnt_a,
            CAST(cnt_b AS BIGINT) AS cnt_b, round(delta, 6) AS delta,
            round(delta / sqrt(1.0 / (cnt_a + aw) + 1.0 / (cnt_b + aw)), 6) AS z
          FROM scored
          ORDER BY abs(round(delta / sqrt(1.0 / (cnt_a + aw) + 1.0 / (cnt_b + aw)), 6)) DESC, tok ASC
          LIMIT $OddsTopK"""),
      doc = "Monroe 2008 log-odds-ratio with informative Dirichlet " +
        "prior: z-scored keyword markers of the first source vs the " +
        "rest; one conditional-split vocab shuffle, broadcast scalars, " +
        "TakeOrdered top-k."),

    // ── l-diversity audit (Machanavajjhala et al. 2007) ──────────────
    // The release check k-anonymity misses: an (event_type, day) cell
    // can hold ≥ k rows that all belong to ONE user — row count is no
    // privacy. Distinct l-diversity counts distinct sensitive values
    // (user_id) per QI cell; the dominant-user share adds the
    // frequency-based (c,l) lens. Two stacked map-side-combinable
    // rollups; output is |types|·|days|-bounded.
    QueryDef(
      "pipe_l_diversity",
      (s, dir) => {
        val perUser = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"),
            col("user_id"))
          .agg(count(lit(1)).as("c"))
        perUser
          .groupBy(col("event_type"), col("day"))
          .agg(
            sum(col("c")).as("n_events"),
            count(lit(1)).as("n_users"),
            round(max(col("c")).cast(DoubleType) / sum(col("c")), 6)
              .as("max_user_share"))
          .withColumn("l_diverse", col("n_users") >= LDiversity)
          .orderBy(col("event_type"), col("day"))
      },
      Some(s"""WITH per_user AS (
          SELECT event_type, CAST(ts AS DATE) AS day, user_id,
            count(*) AS c
          FROM events GROUP BY 1, 2, 3)
        SELECT event_type, day,
          CAST(sum(c) AS BIGINT) AS n_events,
          count(*) AS n_users,
          round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS max_user_share,
          count(*) >= $LDiversity AS l_diverse
        FROM per_user GROUP BY event_type, day
        ORDER BY event_type, day"""),
      doc = s"l-diversity audit (l=$LDiversity) over (event_type, day) " +
        "QI cells with user_id as the sensitive attribute, plus the " +
        "dominant-user share; two stacked rollups, output QI-bounded."),

    // ── sign-LSH kNN graph ───────────────────────────────────────────
    // The build step for graph-based ANN serving and embedding-space
    // corpus analyses: EVERY vector retrieves its top-k cosine
    // neighbors among multiprobe bucket-mates (own bucket + NBits
    // Hamming-1 flips, over TWO independent hash tables — the
    // sim_lsh_topk recipe with the whole corpus as the query side and
    // the union-of-tables recall amplifier from dedup_embedding_ann).
    // Candidate volume is Σ bucket-load² per table, pruned by the
    // index — never the all-pairs n²; at growing corpus scale the
    // width-scaled bits~log2(n) rule (dedup_embedding_ann_scaled) keeps
    // per-bucket load constant. The probe side explodes (1+NBits)
    // bucket keys per vector per table — a constant fan-out, shuffled
    // on the bucket key; a pair found by several probes/tables is
    // deduped BEFORE the one exact verify.
    QueryDef(
      "sim_knn_graph",
      (s, dir) => knnGraph(s, dir),
      Some(knnGraphDuckSql()),
      doc = s"Sign-LSH kNN graph (k=$KnnK): every vector's top-k cosine " +
        "neighbors among multiprobe bucket-mates across TWO independent " +
        "hash tables (pair-level distinct, exact verify once); candidate " +
        "volume is sum of bucket-load^2 per table, never all-pairs; " +
        "width-scaled bits rule applies at growing corpus scale."),

    // ── width-scaled kNN graph twin (bits ~ log2 n) ──────────────────
    // The production setting of V11 for larger corpora: candidates grow
    // as n²/2^bits per table, so the 8-bit index that is right for the
    // fixture goes quadratic on probe corpora (×10: 16.7 s, ×26:
    // 133 s) — at 2^12 buckets the per-bucket load (and with it probe
    // cost) drops ~16×. Same recipe, same oracle builder, wider
    // signature — exactly the dedup_embedding_ann_scaled discipline.
    QueryDef(
      "sim_knn_graph_scaled",
      (s, dir) => knnGraph(s, dir, KnnScaledBits),
      Some(knnGraphDuckSql(KnnScaledBits)),
      doc = s"Width-scaled kNN graph (bits=$KnnScaledBits ~ log2 of the " +
        "probe corpora): same two-table multiprobe recipe with a wider " +
        "signature — per-bucket load, hence candidate volume, stays " +
        "constant as the corpus grows."),

    // ── modularity of the LPA partition (Newman & Girvan 2004) ───────
    // The quality score of a community partition: Q = Σ_c [e_c/E −
    // (K_c/E)²] with E the directed (symmetric-list) edge count, e_c
    // the within-community directed edges, K_c the community degree
    // sum. Everything is exact integer counting — two broadcast label
    // joins + community-bounded rollups; the one double expression is
    // the final display. The number a curation pipeline actually reads
    // before trusting the communities ("is Q ≫ 0?").
    QueryDef(
      "graph_modularity",
      (s, dir) => modularityPlan(s, dir, bcast = true),
      Some(modularitySql),
      doc = "Newman-Girvan modularity of the LPA partition: Q = e_in/E - " +
        "sum_c (K_c/E)^2, all exact integer counting (two broadcast " +
        "label joins, community-bounded rollups), one final double; the " +
        "partition-quality number read before trusting communities."),

    // ── semantic clusters: kNN graph → τ-edges → connected components ─
    // The SemDeDup/embedding-clustering composition: keep kNN edges at
    // cosine ≥ τ, resolve transitive clusters with the same CC operator
    // the dedup family uses, singletons label themselves. The kNN graph
    // bounds candidate edges (≤ k per vector), so the CC input is
    // node-×-k-sized — never the all-pairs graph; cluster count/size
    // then feed the curation rollups (duplication profile, SemDeDup
    // keep-one).
    QueryDef(
      "sim_semantic_clusters",
      (s, dir) => semanticClusters(s, dir),
      None,
      doc = s"Semantic clusters: kNN-graph edges at cosine >= $SemClusterTau " +
        "resolved with the shared CC operator (min-label), singleton " +
        "fill; CC input is node-x-k-bounded, never all-pairs. " +
        "TEACHING/verify form — the fixture 8-bit index grows candidates " +
        "~n^2/256; past fixture scale use sim_semantic_clusters_scaled " +
        "(the declared width-scaled twin, the D4->D4b pattern). " +
        "Oracle split (SURVEY §5 note 14): rows-only here; the exact " +
        "edge set is hash-green via sim_semantic_edges and the closure " +
        "is replayed by Round13Spec's union-find."),

    // ── canonical τ-edges of the semantic-cluster graph ──────────────
    // The hash-green half of the cluster oracle split: everything the
    // cluster query computes UP TO the CC closure — signature, buckets,
    // multiprobe, cosine, top-k rank, τ-filter — projected to canonical
    // undirected pairs that DuckDB verifies value-exact without the
    // quadratic recursive-CTE reachability (117 s at sf0.01 for THIS
    // variant alone; the closure is replayed by the spec union-find).
    QueryDef(
      "sim_semantic_edges",
      (s, dir) => tauEdges(knnGraph(s, dir)),
      Some(tauEdgesSql()),
      doc = s"Canonical undirected tau-edges (cosine >= $SemClusterTau) of " +
        "the fixture-width kNN graph — the exact CC input of " +
        "sim_semantic_clusters as (least, greatest) pairs; hash-green " +
        "replacement for the retired recursive-closure oracle."),

    // ── Heaps-law fit over doc-id-prefix vocabulary growth ───────────
    // V(n) ≈ K·n^β (Heaps 1978): vocabulary size vs token count over 10
    // growing doc_id-prefix snapshots. The trick that keeps it ONE
    // corpus pass: a token's FIRST occurrence (min doc_id per type)
    // determines which prefixes count it, so n_types(cut) is a
    // conditional count over the vocab-sized first-occurrence table and
    // n_toks(cut) a conditional sum over the doc-level token counts —
    // no per-prefix rescans. OLS on (ln n, ln V) with the exact-DECIMAL
    // regression recipe (T18's).
    QueryDef(
      "text_heaps_fit",
      (s, dir) => {
        val tk = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            size(split(lower(col("text")), " ")).as("ntok"))
        val firstOcc = tokenized(s, dir)
          .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
        val mx = Tables.load(s, dir, "documents")
          .agg(max(col("doc_id")).as("max_id"))
        val cuts = broadcast(mx.select(
          explode(expr(s"""transform(sequence(1, $HeapsCuts),
            i -> struct(i AS cut_i, (max_id * CAST(i AS BIGINT)) div $HeapsCuts AS cut))"""))
            .as("c")).select(col("c.cut_i"), col("c.cut")))
        val ntoks = tk.crossJoin(cuts)
          .filter(col("doc_id") <= col("cut"))
          .groupBy(col("cut_i")).agg(sum(col("ntok")).as("n_toks"))
        val ntypes = firstOcc.crossJoin(cuts)
          .filter(col("first_doc") <= col("cut"))
          .groupBy(col("cut_i")).agg(count(lit(1)).as("n_types"))
        val pts = ntoks.join(ntypes, "cut_i")
          .select(
            expr("CAST(round(ln(CAST(n_toks AS DOUBLE)), 9) AS DECIMAL(28,9))").as("xr"),
            expr("CAST(round(ln(CAST(n_types AS DOUBLE)), 9) AS DECIMAL(28,9))").as("yr"),
            expr("CAST(round(ln(CAST(n_toks AS DOUBLE)) * ln(CAST(n_toks AS DOUBLE)), 9) AS DECIMAL(28,9))").as("xx"),
            expr("CAST(round(ln(CAST(n_toks AS DOUBLE)) * ln(CAST(n_types AS DOUBLE)), 9) AS DECIMAL(28,9))").as("xy"))
        pts.agg(count(lit(1)).as("n_points"),
            sum(col("xr")).as("sx"), sum(col("yr")).as("sy"),
            sum(col("xx")).as("sxx"), sum(col("xy")).as("sxy"))
          .select(col("n_points"),
            round(expr(
              """(n_points * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n_points * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 6)
              .as("beta"),
            round(expr(
              """(CAST(sy AS DOUBLE) - ((n_points * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n_points * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
                 / n_points"""), 6).as("ln_k"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, len(string_split(lower(text), ' ')) AS ntok
          FROM documents),
        first_occ AS (
          SELECT tok, min(doc_id) AS first_doc FROM $tokenizedDuck GROUP BY tok),
        mx AS (SELECT max(doc_id) AS max_id FROM documents),
        cuts AS (
          SELECT i AS cut_i, (max_id * i) // $HeapsCuts AS cut
          FROM mx, range(1, ${HeapsCuts + 1}) t(i)),
        ntoks AS (
          SELECT cut_i, CAST(sum(ntok) AS BIGINT) AS n_toks
          FROM tk CROSS JOIN cuts WHERE doc_id <= cut GROUP BY cut_i),
        ntypes AS (
          SELECT cut_i, count(*) AS n_types
          FROM first_occ CROSS JOIN cuts WHERE first_doc <= cut GROUP BY cut_i),
        pts AS (
          SELECT
            CAST(round(ln(CAST(n_toks AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xr,
            CAST(round(ln(CAST(n_types AS DOUBLE)), 9) AS DECIMAL(28,9)) AS yr,
            CAST(round(ln(CAST(n_toks AS DOUBLE)) * ln(CAST(n_toks AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xx,
            CAST(round(ln(CAST(n_toks AS DOUBLE)) * ln(CAST(n_types AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xy
          FROM ntoks JOIN ntypes USING (cut_i)),
        agg AS (
          SELECT count(*) AS n_points,
            sum(xr) AS sx, sum(yr) AS sy, sum(xx) AS sxx, sum(xy) AS sxy
          FROM pts)
        SELECT n_points,
          round((n_points * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n_points * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta,
          round((CAST(sy AS DOUBLE) - ((n_points * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n_points * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
            / n_points, 6) AS ln_k
        FROM agg"""),
      doc = s"Heaps-law fit over $HeapsCuts doc_id-prefix snapshots: " +
        "n_types per prefix from the vocab-sized first-occurrence table " +
        "(min doc_id per type), n_toks from doc-level counts — one " +
        "corpus pass, no rescans; exact-DECIMAL OLS for beta and ln K.")
  )
}
