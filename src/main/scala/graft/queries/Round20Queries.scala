package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-20 rows — the round-19 verdict's two leads, closed:
  *
  *  - V24 `sim_knn_graph_ivf_scaled`: the bounded-LOAD IVF-cell kNN
  *    graph — the D7b `pipe_semdedup_scaled` load-constant discipline
  *    applied to the graph family, retiring the K clamp the verdict
  *    graded V22/V23 `weak` on: cell COUNT grows ∝ n (fine cells =
  *    an id-distribution-free hash-residue sample at a CONSTANT
  *    expected load), so candidate volume is n·nprobe·load = LINEAR
  *    at any corpus size, and assignment is HIERARCHICAL (coarse
  *    route → in-cell fine argmin, both compiled) instead of the flat
  *    O(n·K) argmin that is Θ(n^1.5) at K ~ √n and quadratic past the
  *    4096/1024 caps.
  *  - V25 `sim_knn_graph_nnd`: NN-Descent refinement (Dong et al.,
  *    WWW 2011) over the bounded-load seed — the named fix for the
  *    family's measured recall gap ("a recall-flat bounded-cost kNN
  *    graph needs a structure neither build provides"): each round
  *    proposes co-neighbor pairs from the CURRENT graph (a self-join
  *    of the k-edge table on the shared endpoint — bounded n·(2k)²
  *    candidates, no index needed), scores them exactly, and re-ranks
  *    top-k. The whole chain (linear seed + bounded refinement) is
  *    the family's declared 100 TB path.
  *  - V12g/V12h `sim_semantic_edges_ivf` / `sim_semantic_clusters_ivf`:
  *    the PRODUCTION semantic-clusters composition re-based from the
  *    measured-collapsed auto-width LSH build (V21: edge recall 0.006
  *    at ×104) onto the refined graph — same shared
  *    τ-edge → CC → singleton-fill cluster stage, only the kNN build
  *    feeding it changes (the V12 family's whole point).
  *
  * Reference scope note: alxmancilla/parquet-demo has no similarity
  * machinery (its compute surface is schema-driven Parquet I/O,
  * src/parquet_demo/io.py:7-80); all rows are [EXT] per SURVEY §2.7.
  */
object Round20Queries {

  /** Declared expected per-fine-cell LOAD (vectors per cell). The
    * load-constant discipline inverts V22's sizing: instead of fixing
    * the cell COUNT rule (K = ⌈√n⌉, load = √n grows with n), fix the
    * LOAD and let the count grow ∝ n — per-cell candidate work is then
    * a constant and the one corpus-sized candidate join is LINEAR.
    * 16 ≈ the D7b CentroidEvery regime (25) scaled to the graph
    * family's nprobe=4: candidates/vector ≈ nprobe·load = 64.
    */
  val KnnCellLoad = 16

  /** NN-Descent refinement rounds over the seed graph. Each round is
    * one bounded self-join (≤ n·(2·KnnK)² co-neighbor candidates — the
    * forward lists are k-bounded by construction and the reverse lists
    * are k-capped below, the paper's sample bound) + exact cosine +
    * re-rank; recall converges geometrically in rounds (measured in
    * BASELINE round 20), so a small declared constant, not a knob.
    */
  val KnnNndRounds = 2

  /** 1-row width table (n, fk, ck, fstride, cstride) derived from the
    * corpus count — fine cells target n/KnnCellLoad (load ≈
    * KnnCellLoad), coarse cells target n/KnnCellLoad² (each coarse
    * cell routes ~KnnCellLoad fine cells). Integer math is
    * floor/ceil-explicit so DuckDB replays it bit-for-bit.
    */
  private[graft] def cellLoadWidth(vecs: DataFrame): DataFrame =
    vecs.agg(count(lit(1)).as("n"))
      .withColumn("fk", greatest(lit(4L),
        ceil(col("n") / lit(KnnCellLoad.toDouble))).cast("long"))
      .withColumn("ck", greatest(lit(4L),
        ceil(col("n") / lit((KnnCellLoad * KnnCellLoad).toDouble)))
        .cast("long"))
      .withColumn("fstride",
        greatest(lit(1L), floor(col("n") / col("fk")).cast("long")))
      .withColumn("cstride",
        greatest(lit(1L), floor(col("n") / col("ck")).cast("long")))

  /** The matching DuckDB width CTE body (over `nvecs`). */
  private def cellLoadWidthSql: String =
    s"""SELECT n, fk, ck,
        greatest(1, CAST(floor(CAST(n AS DOUBLE) / fk) AS BIGINT)) AS fstride,
        greatest(1, CAST(floor(CAST(n AS DOUBLE) / ck) AS BIGINT)) AS cstride
      FROM (
        SELECT n,
          greatest(4, CAST(ceil(CAST(n AS DOUBLE) / $KnnCellLoad) AS BIGINT))
            AS fk,
          greatest(4, CAST(ceil(CAST(n AS DOUBLE) /
            ${KnnCellLoad * KnnCellLoad}) AS BIGINT)) AS ck
        FROM (SELECT count(*) AS n FROM nvecs))"""

  /** Bounded-load IVF-cell kNN pipeline over a caller-prepared
    * (vec_id, v, nrm) corpus — (result, persisted stages: cells,
    * corpus). The two-level assignment is the D7b shape with both
    * levels COMPILED:
    *  - coarse route: one zero-shuffle broadcast pq_argmin pass over
    *    the ~n/load² coarse centroids;
    *  - fine argmin: the fine centroids (~n/load, hash-residue sample)
    *    are routed to their coarse cell once and collected into
    *    PER-COARSE sub-quantizer arrays (cid-ordered, so pq_argmin_k's
    *    lowest-position tiebreak IS the oracle's ORDER BY d2, cid);
    *    each vector joins its ONE coarse cell's array and runs one
    *    compiled pq_argmin_k over ~load entries — O(n·load) fine
    *    probes instead of the flat O(n·K) = O(n²/load).
    * The sub-quantizer join is a broadcast (n/load² rows of ~load·dim
    * doubles ≈ corpus/load² bytes); past ~10⁸ vectors it flips to a
    * shuffle-hash join on c2 and past ~10¹⁰ the coarse level recurses
    * (three-level routing) — both declared seams, neither changes the
    * candidate volume, which is n·nprobe·load at ANY n. Serving is the
    * SHARED cellGraphServe tail (homes = cells[0], one candidate
    * equi-join, one pruned top-k rollup).
    */
  private[graft] def knnGraphIvfScaledPlanFrom(base: DataFrame,
      nprobe: Int = Round19Queries.KnnIvfNprobe)
      : (DataFrame, Seq[DataFrame]) = {
    val s = base.sparkSession
    graft.functions.GraftFunctions.register(s)
    val corpus = base
      .repartition(s.sparkContext.defaultParallelism)
      .persist()
    corpus.count()
    val width = cellLoadWidth(corpus)
    val all = corpus.crossJoin(broadcast(width))
    val h60 = Round17Queries.idHash60Spark("vec_id")
    val coarse = all.filter(expr(h60) % col("cstride") === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val fine = all.filter(expr(h60) % col("fstride") === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // 1-row broadcast coarse array; positions are cid-ordered so the
    // pq_argmin strict-< tiebreak is the oracle's (d2, pos) order
    val coarseArr = Round11bQueries.centArray(coarse)
    val fineRouted = fine.crossJoin(broadcast(coarseArr))
      .withColumn("c2", expr("pq_argmin(cv, cents)"))
      .select(col("c2"), col("cid"), col("cv"))
    // per-coarse fine sub-quantizers: parallel (ids, vectors) arrays in
    // cid order — pq_argmin_k positions map back to GLOBAL fine cids
    val fineByCoarse = fineRouted
      .groupBy(col("c2"))
      .agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("fs"))
      .select(col("c2"),
        expr("transform(fs, x -> x.cid)").as("fids"),
        expr("transform(fs, x -> x.cv)").as("fcvs"))
    val cells = corpus.crossJoin(broadcast(coarseArr))
      .withColumn("c2", expr("pq_argmin(v, cents)"))
      .join(broadcast(fineByCoarse), Seq("c2"))
      .withColumn("cells",
        expr(s"transform(pq_argmin_k(v, fcvs, $nprobe), p -> fids[p])"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cells"))
      .persist()
    cells.count()
    (Round19Queries.cellGraphServe(cells), Seq(cells, corpus))
  }

  private[graft] def knnGraphIvfScaledPlan(
      s: org.apache.spark.sql.SparkSession, dir: String,
      nprobe: Int = Round19Queries.KnnIvfNprobe)
      : (DataFrame, Seq[DataFrame]) =
    knnGraphIvfScaledPlanFrom(Round13Queries.vectors(s, dir), nprobe)

  /** The declared row's fn as a named val — the V21 recall audit
    * invokes the same [[knnGraphIvfScaledPlanFrom]] body (one
    * definition, no drift).
    */
  private[graft] val knnGraphIvfScaledFn
      : (org.apache.spark.sql.SparkSession, String) => DataFrame =
    (s, dir) => {
      val (res, stages) = knnGraphIvfScaledPlan(s, dir)
      try res.localCheckpoint(true) finally stages.foreach(_.unpersist(false))
    }

  /** Materializing From-form for the recall audit. */
  private[graft] val knnGraphIvfScaledFromFn: DataFrame => DataFrame =
    base => {
      val (res, stages) = knnGraphIvfScaledPlanFrom(base)
      try res.localCheckpoint(true) finally stages.foreach(_.unpersist(false))
    }

  /** The bounded-load oracle CTE chain, ending in `ranked` (query_id,
    * neighbor_id, cosine, rank) — nested by the row statement, the V21
    * recall audit, and the τ-edge oracle (one definition, no drift).
    */
  private[graft] def knnGraphIvfScaledDuckCtes: String = {
    val h60 = Round17Queries.idHash60Duck("vec_id")
    val cd = VectorOps.duckDist2("f.cv", "c.cv")
    val vd = VectorOps.duckDist2("a.v", "c.cv")
    val fd = VectorOps.duckDist2("a.v", "f.cv")
    s"""${Round13Queries.vectorsDuck},
      width AS ($cellLoadWidthSql),
      coarse AS (
        SELECT vec_id AS cid, v AS cv FROM nvecs CROSS JOIN width
        WHERE $h60 % cstride = 0),
      cpos AS (
        SELECT row_number() OVER (ORDER BY cid) - 1 AS pos, cv FROM coarse),
      fine AS (
        SELECT vec_id AS cid, v AS cv FROM nvecs CROSS JOIN width
        WHERE $h60 % fstride = 0),
      frouted AS (
        SELECT cid, cv, c2 FROM (
          SELECT f.cid, f.cv, c.pos AS c2,
            row_number() OVER (PARTITION BY f.cid
              ORDER BY $cd ASC, c.pos ASC) AS crn
          FROM fine f CROSS JOIN cpos c) WHERE crn = 1),
      vrouted AS (
        SELECT vec_id, v, nrm, c2 FROM (
          SELECT a.vec_id, a.v, a.nrm, c.pos AS c2,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY $vd ASC, c.pos ASC) AS crn
          FROM nvecs a CROSS JOIN cpos c) WHERE crn = 1),
      cellranks AS (
        SELECT a.vec_id, a.v, a.nrm, f.cid AS cell,
          row_number() OVER (PARTITION BY a.vec_id
            ORDER BY $fd ASC, f.cid ASC) AS rn
        FROM vrouted a JOIN frouted f USING (c2)),
      assign AS (SELECT vec_id, v, nrm, cell FROM cellranks WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell
        FROM cellranks WHERE rn <= ${Round19Queries.KnnIvfNprobe}),
      sims AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
          round(${VectorOps.duckDot("a.v", "p.qv")} / (a.nrm * p.qn), 6)
            AS cosine
        FROM assign a JOIN probes p
          ON a.cell = p.cell AND a.vec_id <> p.query_id),
      ranked AS (
        SELECT query_id, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM sims)"""
  }

  private[graft] def knnGraphIvfScaledDuckSql: String =
    s"""WITH $knnGraphIvfScaledDuckCtes
      SELECT query_id AS vec_id, rank, neighbor_id, cosine FROM ranked
      WHERE rank <= ${Round13Queries.KnnK} ORDER BY vec_id, rank"""

  /** One NN-Descent round over a materialized k-edge table: undirected
    * co-neighbor adjacency (forward lists are k-bounded; reverse lists
    * k-capped by (cosine desc, id asc) — the paper's reverse-sample
    * bound, so EVERY node's adjacency is ≤ 2k and no hub task exists),
    * vectors ride the adjacency so every co-neighbor candidate is born
    * with both sides' vectors in-task and the pair dedup shuffles 8
    * bytes of cosine, never vectors (the knnGraphPlan shuffle-payload
    * lesson), then one max-dedup (duplicates score identically) unioned
    * with the incumbent edges and one top-k re-rank.
    */
  private[graft] def nndRound(corpus: DataFrame, edges: DataFrame)
      : DataFrame = {
    import Round13Queries.KnnK
    val fwd = edges.select(col("vec_id").as("node"),
      col("neighbor_id").as("nb"))
    val wr = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val rev = edges.withColumn("rrn", row_number().over(wr))
      .filter(col("rrn") <= KnnK)
      .select(col("neighbor_id").as("node"), col("vec_id").as("nb"))
    val adj = fwd.unionByName(rev).distinct()
    val av = adj.join(
      corpus.select(col("vec_id").as("nb"), col("v"), col("nrm"))
        .hint("shuffle_hash"), Seq("nb"))
    val x = av.select(col("node"), col("nb").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn"))
    val y = av.select(col("node"), col("nb").as("neighbor_id"),
      col("v"), col("nrm"))
    val co = x.join(y.hint("shuffle_hash"), Seq("node"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6)
          .as("cosine"))
    val cand = co.unionByName(
        edges.select(col("vec_id").as("query_id"), col("neighbor_id"),
          col("cosine")))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cosine")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnK)
      .select(col("query_id").as("vec_id"), col("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** Seed (the bounded-load build) + KnnNndRounds refinement rounds,
    * each localCheckpoint'ed (the kmeansTrainFrom flat-plan recipe) —
    * (result, persisted stages).
    */
  private[graft] def knnGraphNndPlanFrom(base: DataFrame,
      rounds: Int = KnnNndRounds): (DataFrame, Seq[DataFrame]) = {
    val (seed, stages) = knnGraphIvfScaledPlanFrom(base)
    val corpus = stages.last
    var g = seed.localCheckpoint(true)
    for (_ <- 1 to rounds)
      g = nndRound(corpus, g).localCheckpoint(true)
    (g.orderBy(col("vec_id"), col("rank")), stages)
  }

  private[graft] def knnGraphNndPlan(
      s: org.apache.spark.sql.SparkSession, dir: String,
      rounds: Int = KnnNndRounds): (DataFrame, Seq[DataFrame]) =
    knnGraphNndPlanFrom(Round13Queries.vectors(s, dir), rounds)

  /** The declared row's fn as a named val (audit-shared). */
  private[graft] val knnGraphNndFn
      : (org.apache.spark.sql.SparkSession, String) => DataFrame =
    (s, dir) => {
      val (res, stages) = knnGraphNndPlan(s, dir)
      try res.localCheckpoint(true) finally stages.foreach(_.unpersist(false))
    }

  /** Materializing From-form for the recall audit. */
  private[graft] val knnGraphNndFromFn: DataFrame => DataFrame =
    base => {
      val (res, stages) = knnGraphNndPlanFrom(base)
      try res.localCheckpoint(true) finally stages.foreach(_.unpersist(false))
    }

  /** The refined-graph oracle CTE chain, ending in `ranked` — the seed
    * statement nested whole (its own WITH scope, no CTE collisions) and
    * each refinement round unrolled: adjacency (UNION = the set dedup),
    * co-neighbor candidates ∪ incumbents, exact re-score, top-k.
    */
  private[graft] def knnGraphNndDuckCtes(rounds: Int = KnnNndRounds)
      : String = {
    import Round13Queries.KnnK
    val roundCtes = (1 to rounds).map { r =>
      s"""adj$r AS (
          SELECT query_id AS node, neighbor_id AS nb FROM e${r - 1}
          UNION
          SELECT node, nb FROM (
            SELECT neighbor_id AS node, query_id AS nb,
              row_number() OVER (PARTITION BY neighbor_id
                ORDER BY cosine DESC, query_id ASC) AS rrn
            FROM e${r - 1}) WHERE rrn <= $KnnK),
        cand$r AS (
          SELECT x.nb AS query_id, y.nb AS neighbor_id
          FROM adj$r x JOIN adj$r y ON x.node = y.node AND x.nb <> y.nb
          UNION
          SELECT query_id, neighbor_id FROM e${r - 1}),
        scored$r AS (
          SELECT c.query_id, c.neighbor_id,
            round(${VectorOps.duckDot("a.v", "q.v")} / (a.nrm * q.nrm), 6)
              AS cosine
          FROM cand$r c
          JOIN nvecs q ON q.vec_id = c.query_id
          JOIN nvecs a ON a.vec_id = c.neighbor_id),
        e$r AS (
          SELECT query_id, neighbor_id, cosine, rank FROM (
            SELECT query_id, neighbor_id, cosine,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored$r) WHERE rank <= $KnnK)"""
    }.mkString(",\n        ")
    s"""${Round13Queries.vectorsDuck},
      e0 AS (
        SELECT vec_id AS query_id, neighbor_id, cosine
        FROM ($knnGraphIvfScaledDuckSql) seed),
      $roundCtes,
      ranked AS (
        SELECT query_id, neighbor_id, cosine, rank FROM e$rounds)"""
  }

  private[graft] def knnGraphNndDuckSql: String =
    s"""WITH ${knnGraphNndDuckCtes()}
      SELECT query_id AS vec_id, rank, neighbor_id, cosine FROM ranked
      ORDER BY vec_id, rank"""

  /** The refined graph, materialized — the production semantic-cluster
    * composition's kNN build (V12h rides this; the collapsed auto-LSH
    * build it replaces measured edge recall 0.006 at ×104 in V21).
    */
  private def prodGraph(s: org.apache.spark.sql.SparkSession, dir: String)
      : DataFrame =
    knnGraphNndFn(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // ── V24: bounded-LOAD IVF-cell kNN graph ─────────────────────────
    // Retires the K clamp (the round-19 verdict's only weak grade): at
    // K = clamp(⌈√n⌉, 4, cap) the candidate volume n·nprobe·(n/K) is
    // Θ(n^1.5) and quadratic past the cap; with cell count ∝ n the
    // per-cell load is the declared constant and candidates are
    // n·nprobe·load at ANY n. Assignment is the D7b two-level shape,
    // both levels compiled (pq_argmin coarse route, per-coarse
    // pq_argmin_k sub-quantizers).
    QueryDef(
      "sim_knn_graph_ivf_scaled",
      knnGraphIvfScaledFn,
      Some(knnGraphIvfScaledDuckSql),
      doc = s"Bounded-load IVF-cell kNN graph (k=${Round13Queries.KnnK}" +
        s"): fine cells = hash-residue sample at constant expected " +
        s"load $KnnCellLoad (cell count grows with n — the D7b " +
        "load-constant discipline), two-level compiled assignment " +
        "(broadcast coarse argmin route, per-coarse-cell fine " +
        s"pq_argmin_k), ${Round19Queries.KnnIvfNprobe} probed cells, " +
        "shared within-probed-cell candidate join and top-k rollup; " +
        "candidate volume n*nprobe*load = LINEAR at any corpus size " +
        "(retires V22/V23's K clamp), recall-priced by " +
        "sim_knn_graph_recall."),

    // ── V25: NN-Descent refinement over the bounded-load seed ────────
    // The family's measured recall ceiling (0.27 peak at ×10, every
    // bounded-cost build) is a CANDIDATE-GENERATION gap: cells/buckets
    // only propose geometrically-close pairs, never neighbors-of-
    // neighbors. NN-Descent closes it with the graph itself: if u~v
    // and v~w then u~w is worth scoring — each round self-joins the
    // k-edge table on the shared endpoint (≤ n·(2k)² candidates,
    // k-capped reverse lists, no index, no hubs), scores exactly,
    // re-ranks. Seed = the linear bounded-load build, so the whole
    // chain is linear in n per round.
    QueryDef(
      "sim_knn_graph_nnd",
      knnGraphNndFn,
      Some(knnGraphNndDuckSql),
      doc = s"NN-Descent-refined kNN graph (k=${Round13Queries.KnnK}, " +
        s"$KnnNndRounds rounds, Dong et al. WWW 2011): seed = " +
        "sim_knn_graph_ivf_scaled (linear bounded-load build), each " +
        "round proposes co-neighbor candidates from the CURRENT graph " +
        "(self-join of the k-edge table on the shared endpoint, " +
        "reverse lists k-capped so every adjacency is <= 2k), scores " +
        "them exactly in-task (vectors ride the adjacency; the dedup " +
        "shuffles cosines, not vectors), unions the incumbents, " +
        "re-ranks top-k; the family's declared 100 TB path — linear " +
        "seed + bounded refinement, recall-priced per round by " +
        "sim_knn_graph_recall."),

    // ── V12g: canonical τ-edges of the refined graph ─────────────────
    QueryDef(
      "sim_semantic_edges_ivf",
      (s, dir) => Round13Queries.tauEdges(prodGraph(s, dir)),
      Some(Round13Queries.tauEdgesSqlOver(knnGraphNndDuckCtes())),
      doc = "Canonical undirected tau-edges of the NN-Descent-refined " +
        "bounded-load kNN graph — the exact CC input of " +
        "sim_semantic_clusters_ivf; hash-green half of the V12h " +
        "oracle split (SURVEY §5 note 14)."),

    // ── V12h: semantic clusters over the refined graph ───────────────
    // The round-19 verdict's What's-wrong #2: the previous production
    // config (sim_semantic_clusters_auto) composes the auto-width LSH
    // build whose edge recall V21 measured at 0.006 at ×104 — at scale
    // the cluster stage would see ~0.6% of true semantic edges. The
    // cluster stage itself (τ-edges → shared CC → singleton fill) is
    // IDENTICAL; only the kNN build feeding it changes.
    QueryDef(
      "sim_semantic_clusters_ivf",
      (s, dir) => Round13Queries.clusterStage(s, dir, prodGraph(s, dir)),
      None,
      doc = "Semantic clusters over the NN-Descent-refined bounded-load " +
        "kNN graph: the V12 composition re-based onto the " +
        "highest-recall declared build (the auto-LSH build it replaces " +
        "measured 0.006 edge recall at x104 in sim_knn_graph_recall). " +
        "Same tau-edge -> shared-CC -> singleton-fill stage. Oracle " +
        "split (SURVEY §5 note 14): rows-only here; " +
        "sim_semantic_edges_ivf is the hash-green edge half, " +
        "Round20Spec union-finds the closure."),
  )
}
