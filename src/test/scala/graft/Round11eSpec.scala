package graft

import org.apache.spark.sql.functions._

import graft.queries.{QueryDef, Round11eQueries}

/** Round-11e operator invariants (VERDICT r11 item 2):
  *
  *  - text_lm_trigram_backoff: the three Stupid-Backoff CASE arms are
  *    each exercised and score EXACTLY the hand-computed Brants values
  *    on a 4-doc micro-corpus — a seen trigram uses c(w1w2w3)/c(w1w2)
  *    and IGNORES lower orders; an unseen trigram with a seen backoff
  *    bigram hits α·c(w2w3)/c(w2); an unseen backoff bigram hits the
  *    α²·add-one unigram floor — and every avg_logprob on the driver
  *    fixture is finite (the floor's whole point);
  *  - text_lm_trigram_backoff_sharded: bit-identical scores to the
  *    broadcast form through the (w1,w2)-context-sharded layout, with
  *    the trigram + context-count lookups pinned as shuffle-hash joins
  *    (no broadcast of the trigram table);
  *  - pipe_soft_dedup: singletons keep weight exactly 1; every
  *    duplicate cluster's weights sum to 1 (mass conservation — the
  *    operator's defining property); eff_chars never exceeds n_chars;
  *    no document is lost or duplicated.
  */
class Round11eSpec extends SparkSpec {

  private def q(name: String) =
    QueryDef.toQueriesMap(Round11eQueries.defs)(name)

  // Spark's round() on doubles: BigDecimal.valueOf → HALF_UP
  private def r(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
  private def r9(x: Double): Double = r(x, 9)

  /** 4-doc micro-corpus. Train = even doc_ids {0, 2}:
    *   doc 0 "a b c a b c", doc 2 "a b d"
    * ⇒ trigrams (a,b,c)=2 (b,c,a)=1 (c,a,b)=1 (a,b,d)=1;
    *   bigrams (a,b)=3 (b,c)=2 (c,a)=1 (b,d)=1;
    *   unigrams a=3 b=3 c=2 d=1, N=9 V=4.
    * Held out: doc 1 "a b c x" (tier 1 then tier 3 — x is OOV),
    *           doc 3 "x b c"   (tier 2: (x,b,c) unseen, (b,c) seen).
    */
  private lazy val microDir: String = {
    val d = tmpDir("trigram-micro")
    import spark.implicits._
    Seq(
      (0L, "a b c a b c"), (1L, "a b c x"),
      (2L, "a b d"), (3L, "x b c")
    ).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'xx' AS lang", "'gen' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("trigram backoff: all three CASE arms score the hand-computed values") {
    val rows = q("text_lm_trigram_backoff")(spark, microDir).collect()
    val byDoc = rows.map(row => row.getLong(0) ->
      (row.getDouble(1), row.getLong(2), row.getBoolean(3))).toMap
    assert(byDoc.keySet == Set(0L, 1L, 2L, 3L))

    // tier-1 values (seen trigrams): P = c(w1w2w3) / c(w1w2)
    val pAbc = math.log(2.0 / 3) // (a,b,c): 2 / c(a,b)=3
    val pBca = math.log(1.0 / 2) // (b,c,a): 1 / c(b,c)=2
    val pCab = math.log(1.0)     // (c,a,b): 1 / c(c,a)=1
    val pAbd = math.log(1.0 / 3) // (a,b,d): 1 / c(a,b)=3
    // tier-3 (b,c,x): (c,x) unseen ⇒ α²·(c(x)+1)/(N+V), x OOV ⇒ 0.16·1/13
    val pBcx = math.log(0.16 * 1.0 / 13)
    // tier-2 (x,b,c): trigram unseen, (b,c)=2 seen ⇒ α·c(b,c)/c(b) = 0.4·2/3
    val pXbc = math.log(0.4 * 2.0 / 3)

    def avg(lps: Double*): Double = r(lps.map(r9).sum / lps.length, 6)

    assert(byDoc(0L) == (avg(pAbc, pBca, pCab, pAbc), 4L, true))
    assert(byDoc(1L) == (avg(pAbc, pBcx), 2L, false),
      "doc 1 must score the SEEN trigram at tier 1 (ignoring lower " +
        "orders) and the OOV trigram at the add-one unigram floor")
    assert(byDoc(2L) == (avg(pAbd), 1L, true))
    assert(byDoc(3L) == (avg(pXbc), 1L, false),
      "doc 3 must hit the middle (α·bigram) backoff arm")
  }

  test("trigram backoff: every fixture avg_logprob is finite and negative") {
    val rows = q("text_lm_trigram_backoff")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val lp = row.getDouble(1)
      assert(!lp.isNaN && !lp.isInfinite, s"doc ${row.getLong(0)}: $lp")
      assert(lp < 0.0, s"doc ${row.getLong(0)}: avg_logprob $lp not < 0")
      assert(row.getLong(2) > 0)
    }
    // both train and held-out docs present (the held-out posture)
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("sharded trigram LM scores identically through context-shard shuffle joins") {
    val broad = q("text_lm_trigram_backoff")(spark, sf()).collect().toSeq
    val df = q("text_lm_trigram_backoff_sharded")(spark, sf())
    assert(df.collect().toSeq == broad,
      "context-sharded layout must replay identical Stupid-Backoff scores")
    val p = df.queryExecution.executedPlan.toString
    val shj = "ShuffledHashJoin".r.findAllIn(p).size
    assert(shj >= 2,
      s"trigram + context-count joins must shuffle-hash into the (w1,w2) " +
        s"shards ($shj found):\n" + p.take(3000))
  }

  test("pipe_soft_dedup: mass conservation, singleton law, eff_chars bound") {
    val rows = q("pipe_soft_dedup")(spark, sf()).collect()
    val nDocs = Tables.load(spark, sf(), "documents").count()
    assert(rows.length == nDocs, "no document lost or duplicated")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)

    val nChars = Tables.load(spark, sf(), "documents")
      .agg(sum(col("n_chars"))).collect()(0).getLong(0)
    rows.foreach { row =>
      val (cs, w) = (row.getLong(2), row.getDouble(3))
      if (cs == 1L) assert(w == 1.0, s"singleton doc ${row.getLong(0)}: $w")
      assert(math.abs(w - r(1.0 / cs, 6)) < 1e-12)
    }
    // per-cluster Σ weight = 1 (within the 6-dp rounding of 1/cs)
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      val mass = members.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) < 1e-3,
        s"cluster $cid (${members.length} docs) carries mass $mass")
      assert(members.forall(_.getLong(2) == members.length.toLong),
        s"cluster $cid: cluster_size column disagrees with membership")
    }
    val eff = rows.map(_.getDouble(4)).sum
    assert(eff <= nChars + 1e-6, s"Σ eff_chars $eff > Σ n_chars $nChars")
    assert(rows.exists(_.getLong(2) > 1L),
      "fixture must contain at least one real duplicate cluster")
  }
}
