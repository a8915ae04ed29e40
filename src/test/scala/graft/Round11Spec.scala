package graft

import org.apache.spark.sql.functions._

/** Round-11 operator invariants:
  *
  *  - text_lm_kneser_ney: EXACT hand-computed scores on a 4-doc micro
  *    corpus (the classic KN implementation bugs — wrong discount
  *    denominator, frequency-instead-of-continuation backoff — all
  *    shift these values), plus fixture-level sanity;
  *  - pipe_ccnet_buckets: per-language tercile balance and score
  *    monotonicity across the head/middle/tail boundary;
  *  - text_c4_filter: every rule observably fires on the fixture and
  *    the cleaned text obeys the line invariants;
  *  - sim_pq_topk: recall@5 vs exact L2 (driver-side brute force) at
  *    the measured 0.92 — pinned ≥ 0.9;
  *  - pipe_entity_blocking: every planted dirty twin is found, nothing
  *    above the levenshtein gate leaks through;
  *  - ev_scd2_intervals: per-user interval algebra (contiguous, one
  *    current row, no no-op changes).
  */
class Round11Spec extends SparkSpec {

  // ── Kneser-Ney: exact micro-corpus scores ──────────────────────────
  // Corpus: docs 0/2 train (even), 1/3 held out.
  //   doc 0 "a b a c"  bigrams (a,b) (b,a) (a,c)
  //   doc 2 "b a b"    bigrams (b,a) (a,b)
  // Training tables: c(a,b)=2 c(b,a)=2 c(a,c)=1;
  //   ctx a: c1=3 fw=2; ctx b: c1=2 fw=1; cont a=1 b=1 c=1; B=3 V=3.
  test("text_lm_kneser_ney matches hand-computed scores on a micro corpus") {
    val dir = tmpDir("kn-micro")
    val sess = spark
    import sess.implicits._
    Seq(
      (0L, "a b a c", "en", "s", 7L),
      (1L, "a b d", "en", "s", 5L),
      (2L, "b a b", "en", "s", 5L),
      (3L, "c a", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // replicate the expression's arithmetic order exactly
    def p(cb: Option[Long], c1: Option[Long], fw: Long, bw: Option[Long]): Double = {
      val bbvv = 3L + 3L
      c1 match {
        case Some(c) =>
          cb.map(x => math.max(4 * x - 3, 0L)).getOrElse(0L).toDouble / (4 * c) +
            (3 * fw * (bw.getOrElse(0L) + 1)).toDouble / ((4 * c).toDouble * bbvv)
        case None => (bw.getOrElse(0L) + 1).toDouble / bbvv
      }
    }
    def lp(x: Double): BigDecimal =
      BigDecimal(math.log(x)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def avg(ps: Seq[Double]): Double =
      BigDecimal(ps.map(lp).sum.toDouble / ps.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val pAB = p(Some(2), Some(3), 2, Some(1)) // 7/12
    val pBA = p(Some(2), Some(2), 1, Some(1)) // 3/4
    val pAC = p(Some(1), Some(3), 2, Some(1)) // 1/4
    val pBD = p(None, Some(2), 1, None)       // 1/16 (unseen bigram)
    val pCA = p(None, None, 0, Some(1))       // 1/3  (unseen context)
    assert(pAB == 7.0 / 12 && pBA == 0.75 && pAC == 0.25 &&
      pBD == 0.0625 && pCA == 2.0 / 6)
    // Σ_w2 P(w2|a) over vocab {a,b,c} = 1 exactly (proper distribution)
    val pAA = p(None, Some(3), 2, Some(1))
    assert(math.abs(pAA + pAB + pAC - 1.0) < 1e-12)

    val got = SparkEntry.queries("text_lm_kneser_ney")(spark, dir)
      .select(col("doc_id"), col("avg_logprob"), col("n_bigrams"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(got(0L) == (avg(Seq(pAB, pBA, pAC)), 3L))
    assert(got(1L) == (avg(Seq(pAB, pBD)), 2L))
    assert(got(2L) == (avg(Seq(pBA, pAB)), 2L))
    assert(got(3L) == (avg(Seq(pCA)), 1L))
  }

  test("text_lm_kneser_ney fixture scores are finite negative log-probs") {
    val rows = SparkEntry.queries("text_lm_kneser_ney")(spark, sf()).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getAs[Double]("avg_logprob") < 0.0))
  }

  // ── CCNet buckets ──────────────────────────────────────────────────
  test("pipe_ccnet_buckets: per-language terciles are balanced and ordered") {
    val rows = SparkEntry.queries("pipe_ccnet_buckets")(spark, sf())
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("ppl_bucket"),
        r.getAs[Double]("avg_surprisal")))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val by = rs.groupBy(_._2).view.mapValues(_.length).toMap
      val sizes = Seq("head", "middle", "tail").map(by.getOrElse(_, 0))
      assert(sizes.sum == rs.length, s"$lang: $by")
      assert(sizes.max - sizes.min <= 1, s"$lang terciles unbalanced: $by")
      def scores(b: String) = rs.filter(_._2 == b).map(_._3)
      assert(scores("head").max <= scores("middle").min, s"$lang head/middle")
      assert(scores("middle").max <= scores("tail").min, s"$lang middle/tail")
    }
  }

  // ── C4 line filter ─────────────────────────────────────────────────
  test("text_c4_filter: rules fire and cleaned text obeys line invariants") {
    val rows = SparkEntry.queries("text_c4_filter")(spark, sf()).collect()
    assert(rows.length == 500)
    val cleaned = rows.map(_.getAs[String]("cleaned"))
    // blocklist rule: 'slow' appears in the corpus but never survives
    assert(Tables.load(spark, sf(), "documents")
      .filter(col("text").contains("slow")).count() > 0)
    assert(cleaned.forall(!_.contains("slow")))
    // terminal-punctuation rule: every kept line ends with '.', so the
    // concatenation of kept lines does too
    assert(cleaned.forall(c => c.isEmpty || c.endsWith(".")))
    // the rules genuinely differentiate: some docs keep a strict subset
    // of their lines, some pass, some fail the ≥3-kept-lines gate
    assert(rows.exists(r => r.getAs[Int]("n_kept") > 0 &&
      r.getAs[Int]("n_kept") < r.getAs[Int]("n_lines")))
    assert(rows.exists(_.getAs[Boolean]("keep_doc")) &&
      rows.exists(!_.getAs[Boolean]("keep_doc")))
    assert(rows.forall(r => r.getAs[Int]("n_kept") <= r.getAs[Int]("n_lines")))
    assert(rows.forall(r =>
      r.getAs[Boolean]("keep_doc") == (r.getAs[Int]("n_kept") >= Round11SpecConst.C4MinLines)))
  }

  // ── PQ recall vs exact L2 ──────────────────────────────────────────
  test("sim_pq_topk recall@5 vs exact L2 is >= 0.9 (measured 0.92)") {
    val vecs = Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val byId = vecs.toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exact = (0L until 5L).map { q =>
      q -> vecs.filter(_._1 != q)
        .map { case (id, v) => (d2(byId(q), v), id) }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    val got = SparkEntry.queries("sim_pq_topk")(spark, sf())
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val hits = exact.map { case (q, ex) => (ex & got.getOrElse(q, Set())).size }.sum
    assert(hits >= 23, s"recall@5 = $hits/25") // 0.92 measured; gate at 0.9
  }

  // ── entity blocking ────────────────────────────────────────────────
  test("pipe_entity_blocking finds every planted twin and respects the gate") {
    val pairs = SparkEntry.queries("pipe_entity_blocking")(spark, sf()).collect()
    assert(pairs.forall(_.getAs[Int]("lev") <= 1))
    val pairSet = pairs.map(r => (r.getAs[Long]("rec_a"), r.getAs[Long]("rec_b"))).toSet
    val twins = Tables.load(spark, sf(), "customer")
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    assert(twins.nonEmpty)
    twins.foreach { k =>
      assert(pairSet.contains((k * 2, k * 2 + 1)), s"missing twin pair for customer $k")
    }
    // twin pairs carry the planted single-deletion distance
    val twinLev = pairs.filter(r => r.getAs[Long]("rec_b") == r.getAs[Long]("rec_a") + 1 &&
      r.getAs[Long]("rec_a") % 2 == 0)
    assert(twinLev.forall(_.getAs[Int]("lev") == 1))
  }

  // ── plan pins for the scale claims ─────────────────────────────────
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  test("text_lm_kneser_ney count-table joins are all broadcast") {
    val p = plan("text_lm_kneser_ney")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "count tables must broadcast, not sort-merge:\n" + p.take(2000))
  }

  test("text_c4_filter is a zero-shuffle narrow pass (no keyed exchange)") {
    val p = plan("text_c4_filter")
    // allowed: the single-file fixture's round-robin scan spread and the
    // presentation sort's range partitioning; forbidden: any KEYED
    // shuffle — the cleaning itself must stay narrow
    assert(!p.contains("hashpartitioning"),
      "no hash-partition exchange allowed in a narrow pass:\n" + p.take(3000))
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected only scan-spread + sort exchanges, got $exchanges:\n" + p.take(3000))
  }

  test("sim_pq_topk encode uses native argmin + vec_dist2, no sort-merge join") {
    val p = plan("sim_pq_topk")
    assert(p.contains("pq_argmin"), p.take(2000))
    assert(p.contains("vec_dist2"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "codebook/LUT/shortlist joins must broadcast:\n" + p.take(3000))
  }

  test("pq_argmin is bit-identical to the declarative aggregate/transform argmin") {
    graft.functions.GraftFunctions.register(spark)
    val df = Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("sub", expr("slice(v, 1, 8)"))
      .crossJoin(
        Tables.load(spark, sf(), "embeddings")
          .filter(col("vec_id") < 32)
          .agg(expr("transform(sort_array(collect_list(struct(vec_id, " +
            "slice(transform(embedding, x -> cast(x as double)), 9, 8)))), c -> c.col2)")
            .as("cws")))
      .select(col("vec_id"),
        expr("pq_argmin(sub, cws)").as("native"),
        expr("""aggregate(
             transform(cws, (c, i) -> struct(vec_dist2(sub, c) AS d2, i AS idx)),
             struct(cast('Infinity' as double) AS d2, -1 AS idx),
             (acc, x) -> CASE WHEN x.d2 < acc.d2 THEN x ELSE acc END).idx""").as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native") < 0 || col("native") >= 32).count() == 0)
  }

  // ── SCD2 interval algebra ──────────────────────────────────────────
  test("ev_scd2_intervals: contiguous per-user intervals, one current row") {
    val rows = SparkEntry.queries("ev_scd2_intervals")(spark, sf())
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("valid_from"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")),
        r.getAs[Double]("value"), r.getAs[Boolean]("is_current")))
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2.getTime)
      // one current row per user, and it is the last interval
      assert(sorted.count(_._5) == 1, s"user $u current-count")
      assert(sorted.last._5 && sorted.last._3.isEmpty, s"user $u last interval open")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"user $u gap: ${a._3} -> ${b._2}")
          assert(a._4 != b._4, s"user $u no-op change survived")
        case _ => ()
      }
    }
  }
}

/** Constants mirrored for the spec (avoid depending on queries' privates). */
object Round11SpecConst {
  val C4MinLines: Int = graft.queries.Round11Queries.C4MinLines
}
