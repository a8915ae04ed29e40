package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge set — the step that turns
  * near-duplicate PAIRS (from LSH / simhash / cosine candidates) into
  * duplicate CLUSTERS, so a curation pipeline can keep one canonical
  * document per cluster instead of dropping both ends of every pair.
  *
  * Algorithm: iterative min-label propagation. Every node starts labelled
  * with itself; each round every node takes the min of its own label and
  * its neighbours' labels; fixpoint when no label changes. Each round is
  * ONE shuffle (a groupBy on node id after an equi-join on the adjacency
  * list), and the number of rounds is bounded by the cluster diameter.
  *
  * Scale note (100 TB): near-dup clusters are overwhelmingly tiny
  * (pairs/triples — diameter ≤ 3), so min-propagation converges in a
  * handful of rounds over edge sets billions of rows wide; every round is
  * an embarrassingly-parallel shuffle with map-side combine. For
  * adversarial graphs with long chains, [[runStar]] implements the
  * alternating large-star/small-star rounds of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond" (SoCC'14) — O(log² n)
  * rounds at any diameter, identical labels, same checkpoint contract.
  * The per-round driver sync is a single scalar aggregate (the same
  * pattern GraphX/GraphFrames use).
  *
  * Reference scope note: alxmancilla/parquet-demo has no graph or dedup
  * logic at all (its only transforms are the type conversions in
  * examples/ingest_parquet_to_mongo_stream.py:61-81); this operator is
  * part of the [EXT] training-data-pipeline surface (SURVEY §2.7).
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (src, dst) of undirected edges;
    *              column names are positional, self-loops and duplicates
    *              are tolerated.
    * @param maxIter hard round cap (see non-convergence note below).
    * @param checkpointDir when set, per-round label tables are cut over
    *              to RELIABLE checkpoints in this directory instead of
    *              executor-local ones. localCheckpoint is the single-box
    *              default (no FS round-trip) but its blocks die with
    *              their executor and the truncated lineage cannot
    *              recompute them — on a cluster with dynamic allocation
    *              or spot executors, pass a durable path (HDFS/S3) here
    *              and the loop survives executor loss at the cost of one
    *              small FS write per round (label tables are node-sized,
    *              not corpus-sized). Sets the session's checkpoint dir
    *              as a side effect ONLY if none is configured yet — an
    *              application-configured dir wins. Each round's
    *              checkpoint files are deleted as soon as the next
    *              round's checkpoint materializes, so a run leaves
    *              behind exactly ONE rdd-* tree (the one backing the
    *              returned labels); that final tree is the caller's to
    *              release (drop the DataFrame with
    *              `spark.cleaner.referenceTracking.cleanCheckpoints`
    *              enabled, or clean the directory).
    * @return (node, cluster_id) — cluster_id = min node id reachable.
    */
  def run(edges: DataFrame, maxIter: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // setCheckpointDir creates a fresh UUID subdirectory per call, so
    // repeated runs against the same durable path never collide; an
    // already-configured session dir is left alone (see scaladoc).
    checkpointDir.foreach(d => if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d))
    val e = edges.toDF("u", "v")
    // symmetrize in ONE scan (explode both directions per input row):
    // union(e, e.swap) reads the upstream edge pipeline twice, which is
    // expensive when edges come straight off an LSH join.
    val adj = e.select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Materialize adj NOW: the first loop iteration references it through
    // two branches (the join and the labels seed); if it isn't cached yet
    // both branches race to evaluate the upstream edge pipeline — for
    // LSH-derived edges that pipeline is the expensive part (measured up
    // to 2× loop cost at a ×26 corpus).
    adj.count()
    var labels = adj.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Convergence test: every node's label is non-increasing, so the
    // label SUM strictly decreases until the fixpoint — comparing sums
    // is one scalar aggregation over the just-checkpointed result,
    // instead of a shuffle join of consecutive label tables (which
    // dominated the loop cost on wide graphs). DECIMAL(38,0) so the sum
    // cannot overflow at any realistic node count × id magnitude.
    var prevSum: java.math.BigDecimal = null
    var changed = true
    var iter = 0
    // reliable mode: the file tree backing the PREVIOUS round's labels,
    // deletable once the current round's checkpoint has materialized
    var prevCkptFile: Option[String] = None
    while (changed && iter < maxIter) {
      // neighbour labels: adj(u,v) ⋈ labels(v) → candidate labels for u
      val candidates = adj.join(labels, adj("v") === labels("node"))
        .select(adj("u").as("node"), col("label"))
        .union(labels)
      // Checkpoint (not persist): it truncates the LOGICAL plan too.
      // With plain persist the per-round plan embeds every previous
      // round's plan, so analysis/optimization time grows linearly with
      // the iteration count — on a long-diameter graph that dominates
      // the actual (tiny) shuffles. localCheckpoint by default (single
      // box, no FS round-trip); reliable checkpoint when the caller
      // passed a durable dir — see the run() scaladoc.
      val agg = candidates.groupBy(col("node"))
        .agg(min(col("label")).as("label"))
      val next =
        if (checkpointDir.isDefined) agg.checkpoint(true)
        else agg.localCheckpoint(true)
      val s = next.agg(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect().head.getDecimal(0)
      // s is null iff the graph is empty — nothing to propagate, stop.
      changed = s != null && (prevSum == null || s.compareTo(prevSum) != 0)
      prevSum = s
      // releaseCheckpoint, not unpersist: from round 2 on `labels` is a
      // localCheckpoint, whose blocks Dataset.unpersist never finds
      // (Layouts scaladoc); the seed round's plain persist takes the
      // fallback path
      Layouts.releaseCheckpoint(labels)
      labels = next
      iter += 1
      // Round i's reliable checkpoint is dead the moment round i+1's has
      // materialized (the sum action above): next's plan is a scan of its
      // OWN files, with no lineage back. Without this, a maxIter=50 run
      // leaves up to 50 node-sized rdd-* trees in the durable path —
      // Spark only reclaims checkpoints via the ContextCleaner, and only
      // with spark.cleaner.referenceTracking.cleanCheckpoints enabled.
      if (checkpointDir.isDefined) {
        prevCkptFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
        }
        prevCkptFile = checkpointFileOf(labels)
      }
    }
    // A silent non-converged return would let a curation pipeline keep
    // multiple "canonical" docs per cluster with no signal anything is
    // wrong — surface it. (Near-dup graphs converge in ≤ diameter rounds,
    // so hitting maxIter means an adversarial long-chain graph: raise
    // maxIter or switch to large-star/small-star rounds.)
    if (changed && iter >= maxIter)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ConnectedComponents did not converge in $maxIter iterations; " +
          "returned labels may split clusters. Raise maxIter.")
    adj.unpersist()
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  /** Alternating large-star / small-star connected components (Kiveris,
    * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components
    * in MapReduce and Beyond", SoCC'14) — the adversarial-graph twin of
    * [[run]] this file's scaladoc has always named. Min-label
    * propagation moves a label ONE hop per round, so a path-shaped
    * component of diameter d needs d rounds; the star operations
    * instead rewire the graph itself toward a depth-1 star rooted at
    * each component's minimum, converging in O(log² n) rounds
    * (O(log n) observed) regardless of diameter:
    *
    *  - large-star(u): with m = min(Γ(u) ∪ {u}), emit (v, m) for every
    *    STRICTLY LARGER neighbour v > u — large neighbours re-attach to
    *    u's best-known minimum, preserving connectivity;
    *  - small-star(u): orient every edge toward its larger endpoint;
    *    with m = min of u's (all-smaller) neighbours, emit (v, m) for
    *    the center and each non-min neighbour — small stars collapse
    *    onto the local minimum.
    *
    * Each operation is one groupBy(u) min + one co-partitioned join
    * back + a distinct — shuffles keyed the same way, map-side
    * combinable; every round localCheckpoints (or reliably checkpoints,
    * same contract as [[run]]) to keep plan size flat. Fixed point when
    * the small-star edge multiset stops changing, detected by the
    * (count, Σu, Σv) triple — each round can only shrink parents, so
    * the triple is monotone and its stability is the paper's "no
    * change" test in three scalars instead of a set-equality join.
    *
    * Returns ((node, cluster_id), rounds). Output is IDENTICAL to
    * [[run]] (cluster_id = min reachable node — both algorithms
    * converge to the same canonical labelling, so the two share one
    * oracle; CcStarSpec pins bit-equality and the round-count
    * separation on a planted 64-chain).
    */
  def runStar(edges: DataFrame, maxIter: Int = 30,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val sc = edges.sparkSession.sparkContext
    checkpointDir.foreach(d => if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d))
    val e0 = edges.toDF("u", "v")
    val nodes = e0.select(explode(array(col("u"), col("v"))).as("node"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    var cur = e0.filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
    var prev: (Long, java.math.BigDecimal, java.math.BigDecimal) = null
    var prevDf: DataFrame = null
    var converged = false
    var iter = 0
    var prevCkptFile: Option[String] = None
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    while (!converged && iter < maxIter) {
      // ── large-star ─────────────────────────────────────────────────
      val sym = cur.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
      val lmin = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(lmin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // ── small-star ─────────────────────────────────────────────────
      val ori = large.select(
          greatest(col("u"), col("v")).as("a"), least(col("u"), col("v")).as("b"))
        .distinct()
      val smin = ori.groupBy(col("a")).agg(min(col("b")).as("m"))
      val small = ori.join(smin, "a")
        .select(explode(array(
            struct(col("a").as("u"), col("m").as("v")),
            struct(col("b").as("u"), col("m").as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      val next = ckpt(small)
      val stat = next.agg(
          count(lit(1)),
          sum(col("u").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          sum(col("v").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect().head
      val trip = (stat.getLong(0), stat.getDecimal(1), stat.getDecimal(2))
      // triple stability is the cheap screen; a stable triple is then
      // CONFIRMED by an exact multiset equality (equal counts + empty
      // one-sided difference ⇒ equal sets), so a scalar collision can
      // never declare a false fixed point and split clusters — the
      // confirm join runs only on candidate-convergence rounds, both
      // sides bare checkpointed scans
      converged = prev != null && trip == prev &&
        next.exceptAll(prevDf).isEmpty
      // round i−1's blocks are dead once the confirm above has run (the
      // next round's confirm reads `next`, not it) — release them
      // RDD-level (Dataset.unpersist is a no-op on checkpoints)
      val superseded = cur
      prev = trip
      prevDf = next
      cur = next
      Layouts.releaseCheckpoint(superseded)
      iter += 1
      if (checkpointDir.isDefined) {
        prevCkptFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
        }
        prevCkptFile = checkpointFileOf(cur)
      }
    }
    if (!converged && iter >= maxIter)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"runStar did not converge in $maxIter rounds; labels may split clusters.")
    // At the fixed point every component is a star (child, root) with the
    // root absent from the child side; isolated-in-the-filtered-graph
    // nodes (self-loop-only inputs) label themselves. min(label) per
    // child keeps the one-row-per-node output contract even when maxIter
    // exhausted before the star fixed point (a child may then still
    // carry edges to several candidate roots); at the fixed point the
    // aggregate is a no-op, and its hash partitioning on `node` is
    // reused by the join.
    val lbl = cur.groupBy(col("u").as("node")).agg(min(col("v")).as("label"))
    val labels = nodes
      .join(lbl, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("cluster_id"))
    nodes.unpersist()
    (labels, iter)
  }

  /** Reliable-checkpoint file tree backing a just-checkpointed Dataset:
    * `Dataset.checkpoint` returns a plan that is a bare scan of the
    * checkpointed internal RDD, so the file path is on that RDD. None
    * for localCheckpoint / non-checkpoint plans — the cleanup above then
    * simply skips (never deletes something it can't attribute).
    */
  private def checkpointFileOf(df: DataFrame): Option[String] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getCheckpointFile
      case _ => None
    }
}
