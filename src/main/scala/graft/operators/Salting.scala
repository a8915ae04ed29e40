package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation for equi-joins: salt the skewed (big) side, replicate
  * the small side.
  *
  * AQE's skew-join splitting handles sort-merge joins; explicit salting
  * is the tool when (a) the skew is on a broadcast-ineligible small side,
  * (b) the join is feeding an aggregation keyed on the same hot key, or
  * (c) you need deterministic partition sizing (e.g., bounding state per
  * task in a streaming join). At 100 TB a single hot key (the classic
  * null-key or default-value skew) otherwise pins one task at 100% while
  * the stage idles.
  *
  * Result equivalence: every big-side row carries exactly one salt in
  * [0, salts); the small side is replicated once per salt value, so each
  * matching (big, small) pair joins exactly once. The salt value itself
  * is arbitrary — `pmod(xxhash64(key, partition_id), salts)` spreads a
  * hot key across `salts` reducers deterministically per partition.
  */
object Salting {

  val SaltCol = "__graft_salt"

  /** Sentinel `hotLoad` for [[gridJoinPairs]] / [[gridSelfPairs]]:
    * derive the hot-bucket threshold in-plan (the [[GuardTailQuantile]]
    * of the bucket-load rollup) instead of declaring a constant.
    *
    * Small-cardinality no-op, documented: with fewer than ~1/(1−q)
    * distinct buckets (≈1000 at p999) the quantile sketch returns the
    * MAX load, so the strict `load > thr` tail filter is empty and
    * everything takes the cold join — including the regime where one
    * dominant bucket over few buckets is the whole skew. That is a
    * PERFORMANCE no-op only (the threshold routes rows between
    * equivalent arms; the pair set is threshold-invariant by
    * construction), and it is the right default for the guards' actual
    * deployment: the declared rows run at ≥2^8 derived signature
    * buckets, and a corpus small enough to have <1000 distinct buckets
    * fits its hottest bucket in one task anyway. Callers that DO need
    * the guard on few-bucket fixtures pass an explicit threshold.
    */
  val DeriveHotLoad: Long = -1L

  /** Quantile of the load rollup that defines "hot" when the threshold
    * is derived in-plan. p999, not p99: the measured round-17b profile
    * shows the load BULK is stable as the corpus grows (p99 flat at
    * ~33–42 across ×10–×52) while only the extreme tail grows ∝ m —
    * the guard exists for that tail. A p99 threshold was measured to
    * route ~1% of buckets (≈60+ at ×10) through the grid and nearly
    * DOUBLE the row's wall time in probe replication, where p999
    * guards the same pathological blocks the retired constant did at
    * a fraction of the routing.
    */
  val GuardTailQuantile = 0.999

  /** Inner/left equi-join on `key` with the big side salted `salts` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn(SaltCol,
      pmod(xxhash64(col(key), spark_partition_id()), lit(salts)))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    salted.join(replicated, Seq(key, SaltCol), joinType).drop(SaltCol)
  }

  /** Bucket self-join pair enumeration with BOUNDED task skew — the
    * guard for LSH-banded dedup on adversarial corpora. A hot bucket
    * (boilerplate documents all sharing a band value) is a quadratic
    * blowup inside ONE join key: load H puts H² candidate work on a
    * single task, and AQE's skew splitting cannot help because the skew
    * is within a key, not across partitions of a key range.
    *
    * The fix is the classic fragment-replicate grid: rows of buckets
    * whose load exceeds `hotLoad` get a deterministic group
    * g = hash(id) % grid and are replicated into the `grid` cells
    * (min(g,k), max(g,k)) for k < grid; the join key becomes
    * (bucket, cellLo, cellHi), so a hot bucket's pair work spreads over
    * grid·(grid+1)/2 cells of ~(2H/grid)² each — task parallelism grows
    * quadratically with `grid` at constant total work. Each unordered
    * pair is emitted EXACTLY once:
    *  - same-group pairs (g,g) exist only in cell (g,g) (a row reaches
    *    cell (g,g) only via k = g);
    *  - cross-group pairs (i,j) pass the emission filter
    *    {a.g, b.g} = {cellLo, cellHi} only in cell (min,max) — in any
    *    other shared cell one side's group is not a cell coordinate.
    * Cold buckets join exactly as before (one equi-join, no overhead).
    *
    * Returns one row per candidate pair with `a_`/`b_`-prefixed id and
    * payload columns plus the bucket columns (from the a side).
    */
  def gridSelfPairs(rows: DataFrame, bucketCols: Seq[String], idCol: String,
      payload: Seq[String], grid: Int, hotLoad: Long): DataFrame = {
    require(grid > 0, "grid must be positive")
    require(hotLoad > 0 || hotLoad == DeriveHotLoad,
      s"hotLoad must be positive or DeriveHotLoad, got $hotLoad")
    val bc = bucketCols.map(col)
    // bucket loads: tiny (one row per DISTINCT bucket value) — the hot
    // set is smaller still; this is the one extra pass the guard
    // costs, and it is a map-side-combinable count.
    //
    // DeriveHotLoad: threshold = the rollup's own p999, derived AND
    // collected in ONE bounded job (≤ GuardMaxHotKeys keys — the
    // round-18 collected-key discipline: the inline tag-join form
    // measured a near-constant multi-second tax from the extra stage
    // barriers + two broadcast tag joins; re-measured here at 3.48 s
    // vs 1.61 s for the constant form on the sf0.1 corpus before this
    // routing swap). Hot rows are then routed by a codegen'd
    // xxhash64-membership predicate with ZERO extra joins. A hash
    // collision can only route an extra cold bucket through the grid
    // arm — routing is correctness-free by construction (the pair set
    // is threshold-invariant), so hashing the composite bucket key is
    // safe where an equality tag join would need the full tuple.
    val loads = rows.groupBy(bc: _*).agg(count(lit(1)).as("__load"))
    val tagged =
      if (hotLoad == DeriveHotLoad) {
        val thr = loads.agg(
          expr(s"approx_percentile(__load, $GuardTailQuantile, 10000)")
            .as("__thr"))
        val hotKeys = loads.withColumn("__k", xxhash64(bc: _*))
          .crossJoin(broadcast(thr))
          .filter(col("__load") > col("__thr"))
          .orderBy(col("__load").desc, col("__k").asc)
          .limit(GuardMaxHotKeys)
          .select(col("__k")).collect().map(_.getLong(0)).toSeq
        val isHot =
          if (hotKeys.isEmpty) lit(false)
          else xxhash64(bc: _*).isInCollection(hotKeys)
        rows.withColumn("__hot", when(isHot, lit(true)))
      } else {
        val hot = loads.filter(col("__load") > hotLoad)
          .select(bc: _*).withColumn("__hot", lit(true))
        rows.join(broadcast(hot), bucketCols, "left")
      }
    val outCols = (idCol +: payload)
    def prefixed(df: DataFrame, p: String, extra: Seq[String]): DataFrame =
      df.select((bucketCols ++ extra).map(col) ++
        outCols.map(c => col(c).as(s"$p$c")): _*)
    def result(joined: DataFrame): DataFrame =
      joined.select((bucketCols.map(c => col(s"a.$c")) ++
        outCols.flatMap(c => Seq(col(s"a.a_$c"), col(s"b.b_$c")))): _*)

    val cold = tagged.filter(col("__hot").isNull).drop("__hot")
    val coldPairs = result(
      prefixed(cold, "a_", Seq.empty).as("a")
        .join(prefixed(cold, "b_", Seq.empty).as("b"),
          bucketCols.map(c => col(s"a.$c") === col(s"b.$c"))
            .reduce(_ && _) && col(s"a.a_$idCol") < col(s"b.b_$idCol")))

    val hotRows = tagged.filter(col("__hot") === true).drop("__hot")
      .withColumn("__g", pmod(xxhash64(col(idCol)), lit(grid.toLong)))
      .withColumn("__k", explode(sequence(lit(0L), lit((grid - 1).toLong))))
      .withColumn("__lo", least(col("__g"), col("__k")))
      .withColumn("__hi", greatest(col("__g"), col("__k")))
    val cellCols = Seq("__lo", "__hi")
    val emitOnce =
      (col("a.__g") === col("a.__lo") && col("b.__g") === col("a.__hi")) ||
        (col("a.__g") === col("a.__hi") && col("b.__g") === col("a.__lo"))
    val hotPairs = result(
      prefixed(hotRows, "a_", cellCols :+ "__g").as("a")
        .join(prefixed(hotRows, "b_", cellCols :+ "__g").as("b"),
          (bucketCols ++ cellCols).map(c => col(s"a.$c") === col(s"b.$c"))
            .reduce(_ && _) && emitOnce &&
            col(s"a.a_$idCol") < col(s"b.b_$idCol")))

    coldPairs.unionByName(hotPairs)
  }

  /** Load-aware grid split of a TWO-SIDED bucket equi-join (probes ⋈
    * homes on `key`) — the ANN-candidate-join counterpart of
    * [[gridSelfPairs]], motivated by the round-17b bucket-load
    * profile: the hottest sign-LSH buckets are genuinely-similar
    * clusters that NO signature width can split (they are exactly the
    * near-neighbors the verify step must see), and their load grows
    * with the corpus — at cluster scale one such bucket pins a whole
    * task at probes_into_bucket × homes_in_bucket candidate work.
    *
    * Home-side buckets whose load exceeds `hotLoad` assign each home
    * row ONE salt cell (hash(homeId) % grid); probe rows into a hot
    * bucket replicate across ALL `grid` cells; cold buckets join
    * exactly as before (no overhead beyond one tiny broadcast tag).
    * Every (probe, home) pair therefore meets EXACTLY once — the
    * join output is verbatim-identical to the plain equi-join — while
    * any single task's home block shrinks ×grid. Extra cost: one
    * map-side-combinable load rollup (one row per distinct hot
    * bucket, broadcast) plus grid× replication of the hot buckets'
    * PROBE rows only (narrow rows; candidate volume is unchanged).
    *
    * `hotLoad = DeriveHotLoad` derives the threshold IN-PLAN as the
    * GuardTailQuantile (p999) of the load rollup the guard already
    * computes (one extra 1-row aggregate, broadcast) — corpus-dependent
    * thresholds are runtime facts, not constants a human re-tunes as
    * data drifts (the in-plan width discipline applied to the guard
    * itself). The
    * sketch quantile (approx_percentile, bounded memory — an exact
    * percentile would buffer every distinct bucket's load in one
    * aggregation buffer, untenable at 10⁹+ buckets) can in principle
    * vary with merge order, but the threshold only ROUTES rows
    * between the cold and gridded join arms — the emitted pair set is
    * identical for ANY threshold, so the output stays deterministic.
    */
  def gridJoinPairs(probes: DataFrame, homes: DataFrame, key: String,
      homeId: String, grid: Int, hotLoad: Long): DataFrame = {
    require(hotLoad > 0 || hotLoad == DeriveHotLoad,
      s"hotLoad must be positive or DeriveHotLoad, got $hotLoad")
    val loads = homes.groupBy(col(key)).agg(count(lit(1)).as("__load"))
    val hotLoads =
      if (hotLoad == DeriveHotLoad) {
        val thr = loads.agg(
          expr(s"approx_percentile(__load, $GuardTailQuantile, 10000)")
            .as("__thr"))
        loads.crossJoin(broadcast(thr)).filter(col("__load") > col("__thr"))
      } else loads.filter(col("__load") > hotLoad)
    gridJoinPairsWith(probes, homes, key, homeId, grid,
      hotLoads.select(col(key)))
  }

  /** Bound on a caller-collected hot-key set ([[gridJoinPairsInSet]]):
    * the guard exists for the extreme tail, so splitting more than
    * this many buckets is a sign the threshold is wrong, and the cap
    * bounds both the driver transfer and the predicate size.
    */
  val GuardMaxHotKeys = 1024

  /** [[gridJoinPairs]] with a CALLER-COLLECTED hot-bucket key set,
    * routed through codegen'd `isInCollection` predicates instead of
    * broadcast tag joins. A caller running the guard over many
    * parallel joins (the ANN dedup's per-table candidate joins)
    * derives ALL tables' hot sets in ONE rollup job, collects the
    * bounded tail (≤ [[GuardMaxHotKeys]] keys — a documented bounded
    * scalar read), and hands each table its slice — the inline
    * derivation in [[gridJoinPairs]] costs ~4 sequential stage
    * barriers (load rollup, threshold aggregate, broadcast, tag) per
    * call plus two broadcast tag joins, which measured as a
    * near-constant multi-second overhead per invocation at any corpus
    * size. Pair-set equivalence is unchanged: every (probe, home)
    * pair meets exactly once in whichever arm its bucket routes to.
    */
  def gridJoinPairsInSet(probes: DataFrame, homes: DataFrame, key: String,
      homeId: String, grid: Int, hotKeys: Seq[Long]): DataFrame = {
    require(grid > 0, "grid must be positive")
    require(hotKeys.length <= GuardMaxHotKeys,
      s"hot-key set ${hotKeys.length} exceeds GuardMaxHotKeys $GuardMaxHotKeys")
    if (hotKeys.isEmpty) return probes.join(homes, Seq(key))
    val isHot = col(key).isInCollection(hotKeys)
    val cold = probes.filter(!isHot).join(homes.filter(!isHot), Seq(key))
    val hotJ = probes.filter(isHot)
      .withColumn(SaltCol, explode(sequence(lit(0L), lit((grid - 1).toLong))))
      .join(
        homes.filter(isHot)
          .withColumn(SaltCol, pmod(xxhash64(col(homeId)), lit(grid.toLong))),
        Seq(key, SaltCol))
      .drop(SaltCol)
    cold.unionByName(hotJ)
  }

  private def gridJoinPairsWith(probes: DataFrame, homes: DataFrame,
      key: String, homeId: String, grid: Int, hotKeys: DataFrame): DataFrame = {
    require(grid > 0, "grid must be positive")
    val hot = hotKeys.select(col(key)).withColumn("__hot", lit(true))
    val hTag = homes.join(broadcast(hot), Seq(key), "left")
    val pTag = probes.join(broadcast(hot), Seq(key), "left")
    val cold = pTag.filter(col("__hot").isNull).drop("__hot")
      .join(hTag.filter(col("__hot").isNull).drop("__hot"), Seq(key))
    val hotJ = pTag.filter(col("__hot") === true).drop("__hot")
      .withColumn(SaltCol, explode(sequence(lit(0L), lit((grid - 1).toLong))))
      .join(
        hTag.filter(col("__hot") === true).drop("__hot")
          .withColumn(SaltCol, pmod(xxhash64(col(homeId)), lit(grid.toLong))),
        Seq(key, SaltCol))
      .drop(SaltCol)
    cold.unionByName(hotJ)
  }

  /** Two-phase aggregation for a skewed groupBy key: partial-aggregate on
    * (key, salt), then final-aggregate on key. `sum`/`count` compose as
    * sum-of-sums; pass the partial and final expressions explicitly.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn(SaltCol, pmod(xxhash64(col(key), spark_partition_id()), lit(salts)))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_" + valueCol),
        sum(col("__pcnt")).as("cnt"))
  }
}
