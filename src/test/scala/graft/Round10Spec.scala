package graft

import org.apache.spark.sql.functions._

import graft.queries.Round10Queries

/** Value-level invariants for the round-10 corpus-hygiene operators —
  * properties the hash oracle can't express (it only proves Spark ≡
  * DuckDB, not that BOTH are right).
  */
class Round10Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("pipe_segment_dedup: untouched docs round-trip their exact text") {
    // a doc with zero removed segments must reassemble to its tokenized
    // text verbatim — catches any seg_id ordering or joining bug that a
    // consistent cross-engine mistake would hide from the hash oracle
    val docs = Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), lower(col("text")).as("orig"))
    val out = q("pipe_segment_dedup")
    val untouched = out.filter(col("kept_segs") === col("n_segs"))
      .join(docs, "doc_id")
    assert(untouched.count() > 0, "fixture should have untouched docs")
    val mismatched = untouched.filter(col("new_text") =!= col("orig")).count()
    assert(mismatched == 0, s"$mismatched untouched docs failed to round-trip")
  }

  test("pipe_segment_dedup: kept token counts are consistent") {
    val bad = q("pipe_segment_dedup")
      .filter(col("kept_toks") > col("n_segs") * Round10Queries.SegLen ||
        col("kept_segs") > col("n_segs") ||
        (col("kept_segs") === 0 && col("new_text") =!= ""))
      .count()
    assert(bad == 0)
  }

  test("text_dup_spans: coverage is bounded and implied by windows") {
    val out = q("text_dup_spans")
    val bad = out.filter(
      col("covered_toks") > col("n_toks") ||
        (col("dup_windows") > 0 && col("covered_toks") < Round10Queries.DupK) ||
        (col("dup_windows") === 0 && col("covered_toks") =!= 0)).count()
    assert(bad == 0)
    // the fixture genuinely has cross-doc duplication
    assert(out.filter(col("dup_windows") > 0).count() > 0)
  }

  test("pipe_semdedup: pruning is by a smaller-id cell-mate, exactly when not kept") {
    val out = q("pipe_semdedup").cache()
    try {
      assert(out.filter(col("kept") =!= col("pruned_by").isNull).count() == 0)
      assert(out.filter(col("pruned_by") >= col("vec_id")).count() == 0)
      // every vector is assigned to exactly one cell
      assert(out.count() ==
        Tables.load(spark, sf(), "embeddings").count())
    } finally out.unpersist()
  }

  test("pipe_dsir: the English slice scores higher than the rest on average") {
    val out = q("pipe_dsir")
    val avg = out.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg(col("score")).as("a"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
      s"target-slice mean ${avg(true)} must exceed non-target ${avg(false)}")
  }

  test("text_lm_backoff: training-half docs outscore held-out docs on average") {
    val out = q("text_lm_backoff")
    val avg = out.groupBy(col("trained_on"))
      .agg(org.apache.spark.sql.functions.avg(col("avg_logscore")).as("a"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // an LM scores its own training text higher than held-out text; if
    // this flips, the train/score split (or the backoff branch) broke
    assert(avg(true) > avg(false),
      s"train mean ${avg(true)} must exceed held-out ${avg(false)}")
    assert(out.collect().forall(_.getAs[Double]("avg_logscore") < 0.0),
      "log-probabilities must be negative")
  }

  test("dedup_containment: pairs are ordered, thresholded, and include exact dups at 1.0") {
    val rows = SparkEntry.queries("dedup_containment")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"), "pairs must be a < b")
      val (ca, cb) = (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"))
      assert(ca > 0.0 && ca <= 1.0 && cb > 0.0 && cb <= 1.0)
      assert(math.max(ca, cb) >= queries.Round10Queries.ContainTau - 1e-9)
    }
    // the fixture has no byte-identical texts (verified against the
    // parquet directly), so 1.0/1.0 cannot occur — but true subsumption
    // does: some doc's entire rare-shingle set sits inside its twin.
    // If no pair reaches 1.0 on EITHER side, the intersection broke.
    assert(rows.exists(r => math.max(r.getAs[Double]("cont_a"),
      r.getAs[Double]("cont_b")) == 1.0),
      "planted twins must include at least one fully-contained side")
  }

  test("pipe_weighted_sample: length-weighted keys over-represent long docs; plan is TakeOrdered") {
    val df = SparkEntry.queries("pipe_weighted_sample")(spark, sf())
    val rows = df.collect()
    assert(rows.length == 100)
    val keys = rows.map(_.getAs[Double]("skey"))
    assert(keys.forall(_ <= 0.0), "ln(u)/w keys are non-positive")
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b }, "keys descend")
    // A-Res with w = n_chars: the sample's mean length must exceed the
    // corpus mean, or the weighting is not biting
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    val corpusMean = Tables.load(spark, sf(), "documents")
      .agg(org.apache.spark.sql.functions.avg(col("n_chars")))
      .collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean must exceed corpus mean $corpusMean")
    // no global sort shuffle: top-k must be TakeOrderedAndProject
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("pipe_url_dedup: every canonical URL collapses its full alias group") {
    val out = q("pipe_url_dedup").cache()
    try {
      // 500 docs, canonical key = doc_id % 100, hosts site3/site7 blocked
      assert(out.count() == 90)
      assert(out.filter(col("n_dups") =!= 5).count() == 0)
      assert(out.filter(col("keeper_doc_id") >= 100).count() == 0)
      assert(out.filter(col("host").isin("site3.example.com", "site7.example.com"))
        .count() == 0)
    } finally out.unpersist()
  }

  test("pipe_bpe_merges matches a sequential reference BPE on the same corpus") {
    // driver-side reference implementation (the paper's algorithm 1,
    // greedy-left merges) over the collected word-frequency map — an
    // independent derivation of the same 3 merges the distributed form
    // learns. Collect is test-only: the vocab fits anywhere.
    val wordFreq = Tables.load(spark, sf(), "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def merges(n: Int): Seq[(String, Long)] = {
      var vocab: Seq[(Vector[String], Long)] =
        wordFreq.toSeq.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }
      (1 to n).map { _ =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (syms, f) =>
          syms.sliding(2).foreach {
            case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
            case _ => ()
          }
        }
        val (pair, cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, s"$a $b") }
        vocab = vocab.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
              out += pair._1 + pair._2; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toVector, f)
        }
        (s"${pair._1} ${pair._2}", cnt)
      }
    }
    val expected = merges(3)
    val got = q("pipe_bpe_merges").orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getLong(3))).toSeq
    assert(got == expected, s"distributed $got != reference $expected")
  }

  test("pipe_quality_classifier: one feature per bigram, mean weight bounded by ±1") {
    val docs = Tables.load(spark, sf(), "documents")
      .select(col("doc_id"),
        (size(split(lower(col("text")), " ")) - 1).cast("long").as("expected"))
    val out = q("pipe_quality_classifier")
    assert(out.join(docs, "doc_id")
      .filter(col("n_feats") =!= col("expected")).count() == 0,
      "every bigram must contribute exactly one hashed feature")
    assert(out.filter(abs(col("score")) > 1).count() == 0,
      "mean of weights in [-1, 1] must stay in [-1, 1]")
  }

  test("st_incremental_minhash: dup verdicts point at earlier docs and are transitive-free") {
    val out = q("st_incremental_minhash").cache()
    try {
      assert(out.filter(col("status") === "dup").count() > 0,
        "fixture's planted near-dups must surface")
      assert(out.filter(col("dup_of") >= col("doc_id")).count() == 0,
        "dup_of must be an EARLIER-arrived doc")
      assert(out.filter(col("n_match") < graft.streaming.DocumentStreams.SigMatchMin &&
        col("status") === "dup").count() == 0)
    } finally out.unpersist()
  }
}
