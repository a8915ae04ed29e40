package graft

import org.apache.spark.sql.functions._

import graft.queries.Round10Queries
import graft.queries.Round10Queries.{ContainDfCap, ContainTau, DupK}

/** Adversarial probe for dedup_containment's df-cap (VERDICT r10 item 5):
  * a boilerplate-heavy corpus where one shingle sits exactly AT the cap
  * boundary and another sits one past it. Pins, on the CANDIDATE set
  * (Round10Queries.containmentPairs, pre-τ):
  *  (1) boundary semantics both ways — df == cap contributes exactly
  *      C(cap,2) candidate pairs; df == cap+1 contributes ZERO (the
  *      boilerplate group produces no candidates at all among itself);
  *  (2) the full verdict set equals a brute-force replay of the capped
  *      semantics (cap applied to BOTH sides — the declared measure is
  *      containment over the non-boilerplate shingle space);
  *  (3) a true short-inside-long subsumption pair still surfaces at
  *      cont = 1.0 — the cap prunes boilerplate, not signal.
  * Linearity at probe scale is the companion ScaleProbe `containment`
  * mode (BASELINE.md): candidates stay ≤ C(cap,2)·|capped shingles|
  * regardless of how many docs share the boilerplate block.
  */
class ContainmentAdversarialSpec extends SparkSpec {

  // one 8-token boilerplate block per group; unique 2-token tails keep
  // every mixed shingle at df 1
  private val capBlock = (0 until DupK).map(i => s"cap$i").mkString(" ")
  private val ovBlock = (0 until DupK).map(i => s"ov$i").mkString(" ")
  private val shortText = (0 until DupK + 2).map(i => s"s$i").mkString(" ")
  private val longText = shortText + " " + (0 until 4).map(i => s"l$i").mkString(" ")

  private lazy val docs: Seq[(Long, String)] = {
    val atCap = (0 until ContainDfCap).map { i =>
      (1000L + i, s"$capBlock u${i}a u${i}b")
    }
    val overCap = (0 until ContainDfCap + 1).map { i =>
      (2000L + i, s"$ovBlock v${i}a v${i}b")
    }
    atCap ++ overCap ++ Seq(9001L -> shortText, 9002L -> longText)
  }

  private lazy val dir: String = {
    val d = tmpDir("contain-adv")
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'xx' AS lang", "'gen' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Brute-force capped-semantics oracle over the planted corpus. */
  private lazy val brute: Map[(Long, Long), (Long, Double, Double)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.split(" ")
      if (toks.length < DupK) Set.empty
      else toks.sliding(DupK).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val df = sh.flatMap(_._2).groupBy(identity).map { case (g, o) => g -> o.size }
    val capped = sh.map { case (id, gs) =>
      id -> gs.filter(df(_) <= ContainDfCap)
    }.filter(_._2.nonEmpty).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    (for {
      (a, ga) <- capped; (b, gb) <- capped if a < b
      c = (ga intersect gb).size.toLong if c > 0
    } yield (a, b) -> (c, r6(c.toDouble / ga.size), r6(c.toDouble / gb.size))).toMap
  }

  test("df == cap contributes exactly C(cap,2) candidates; df == cap+1 contributes zero") {
    val cand = Round10Queries.containmentPairs(spark, dir)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val capGroup = cand.filter { case (a, b) => a >= 1000 && b < 2000 }
    val ovGroup = cand.filter { case (a, b) => a >= 2000 && b < 9000 }
    assert(capGroup.length == ContainDfCap * (ContainDfCap - 1) / 2,
      s"boundary shingle must yield C(cap,2) candidates, got ${capGroup.length}")
    assert(ovGroup.isEmpty,
      s"over-cap boilerplate must yield NO candidates, got ${ovGroup.length}")
    // candidate volume overall == brute capped candidate volume
    assert(cand.length == brute.size,
      s"candidate set ${cand.length} != capped-oracle ${brute.size}")
  }

  test("verdicts replay the capped semantics exactly; subsumption survives the cap") {
    val got = SparkEntry.queries("dedup_containment")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Long]("c_shared"), r.getAs[Double]("cont_a"),
          r.getAs[Double]("cont_b")))).toMap
    val expected = brute.filter { case (_, (_, ca, cb)) =>
      math.max(ca, cb) >= ContainTau
    }
    assert(got == expected,
      s"verdicts diverge: got=${got.size} expected=${expected.size}; " +
        s"missing=${(expected.keySet -- got.keySet).take(5)}, " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
    // the planted short-inside-long pair is found with full containment
    // (every shingle of the short doc also sits in the long doc)
    val sub = got.get((9001L, 9002L))
    assert(sub.nonEmpty, "subsumption pair lost")
    assert(sub.get._2 == 1.0, s"short side must be fully contained: $sub")
    // boundary boilerplate produces candidates but NO false verdicts:
    // cap-group docs share only the one boilerplate shingle (1 of 3)
    assert(!got.keys.exists { case (a, b) => a >= 1000 && b < 2000 },
      "cap-boundary boilerplate pairs must stay below τ")
  }
}
