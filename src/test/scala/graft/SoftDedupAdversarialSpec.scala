package graft

import graft.queries.{QueryDef, Round11eQueries}

/** Adversarial probe for pipe_soft_dedup's join strategy (VERDICT r11
  * item 5): a boilerplate-heavy corpus where (almost) EVERY document is
  * a duplicate, so the cluster table is corpus-scale — the regime where
  * round 11's hard `broadcast(cc)` hint would force a corpus-sized
  * build side into every executor. The operator now leaves the strategy
  * to AQE; this spec pins
  *  (1) no broadcast hint survives in the logical plan (the de-risk
  *      itself — AQE remains free to broadcast a genuinely small
  *      cluster table, and to shuffle a corpus-scale one),
  *  (2) the semantics hold unchanged in the adversarial regime: one
  *      giant cluster of N boilerplate docs carries total mass 1
  *      (weight 1/N each) and the planted singletons keep weight 1.
  */
class SoftDedupAdversarialSpec extends SparkSpec {

  private val BoilerN = 120

  private lazy val dir: String = {
    val d = tmpDir("softdedup-adv")
    import spark.implicits._
    // identical 12-token boilerplate text ⇒ identical shingle sets ⇒
    // identical minhash signatures ⇒ one all-pairs LSH cluster of 120
    val boiler = (0 until 12).map(i => s"tpl$i").mkString(" ")
    val dups = (0 until BoilerN).map(i => (100L + i, boiler))
    val singles = (0 until 5).map { i =>
      (9000L + i, (0 until 12).map(j => s"uniq${i}x$j").mkString(" "))
    }
    (dups ++ singles).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'xx' AS lang", "'gen' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("corpus-scale cluster table: no forced broadcast, mass still conserved") {
    val df = QueryDef.toQueriesMap(Round11eQueries.defs)("pipe_soft_dedup")(spark, dir)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("unresolvedhint") &&
      !analyzed.contains("broadcast"),
      "pipe_soft_dedup must not force a broadcast of the cluster table:\n" +
        analyzed.take(2000))

    val rows = df.collect()
    assert(rows.length == BoilerN + 5)
    val (dups, singles) = rows.partition(_.getLong(0) < 9000L)
    assert(dups.forall(_.getLong(2) == BoilerN.toLong),
      "all boilerplate docs must land in ONE corpus-scale cluster")
    val mass = dups.map(_.getDouble(3)).sum
    assert(math.abs(mass - 1.0) < 1e-2,
      s"the $BoilerN-doc cluster must carry total mass 1, got $mass")
    singles.foreach { r =>
      assert(r.getLong(2) == 1L && r.getDouble(3) == 1.0,
        s"singleton ${r.getLong(0)} lost weight 1: ${r.getDouble(3)}")
    }
  }
}
