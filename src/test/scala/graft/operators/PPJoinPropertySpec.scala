package graft.operators

import scala.util.Random

import graft.SparkSpec
import graft.queries.DedupQueries

/** Losslessness property for the prefix-filtered set-similarity join
  * (dedup_ngram_jaccard): for random corpora, the engine's pipeline —
  * df-ordered prefix indexing + length filter + PPJoin positional filter
  * + verify — must return EXACTLY the pairs a brute-force all-pairs
  * Jaccard computation finds. This pins the integer prefix/positional
  * bound math, which is the part a unit example can't cover.
  */
class PPJoinPropertySpec extends SparkSpec {

  /** Word 3-gram shingles of a text, mirroring DedupQueries.shingled. */
  private def shingles(text: String): Set[String] = {
    val toks = text.toLowerCase.split(" ", -1)
    if (toks.length < 3) Set.empty
    else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
  }

  private def jaccard6(a: Set[String], b: Set[String]): Double = {
    val j = a.intersect(b).size.toDouble / a.union(b).size
    BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Random corpus with planted near-duplicates: base docs plus variants
    * that drop/append a couple of words (some above, some below τ).
    */
  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = (0 until 40).map(i => s"w$i")
    val base = (0 until nDocs).map { i =>
      val len = 5 + rnd.nextInt(30)
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val variants = base.zipWithIndex.collect {
      case (t, i) if i % 3 == 0 =>
        val toks = t.split(" ")
        // perturb 0-3 trailing words: some stay >= τ, some fall below
        val keep = toks.dropRight(rnd.nextInt(4))
        (keep ++ Seq.fill(rnd.nextInt(2))(vocab(rnd.nextInt(vocab.length)))).mkString(" ")
    }
    (base ++ variants).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private def runCase(seed: Int): Unit = {
    val docs = corpus(seed, 25)
    val dir = tmpDir(s"ppjoin-$seed")
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'xx' AS lang", "'gen' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = DedupQueries.defs.find(_.name == "dedup_ngram_jaccard").get
      .fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

    val sh = docs.map { case (id, t) => (id, shingles(t)) }.filter(_._2.nonEmpty)
    val expected = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      j = jaccard6(sa, sb) if j >= DedupQueries.JaccardTau
    } yield (ia, ib, j)).toSet

    assert(got == expected,
      s"seed=$seed: engine=${got.size} pairs, brute=${expected.size}; " +
        s"missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
    assert(expected.nonEmpty, s"seed=$seed produced no positive pairs — weak case")
  }

  for (seed <- Seq(1, 7, 42, 99, 2024)) {
    test(s"prefix+positional filtering is lossless vs brute force (seed=$seed)") {
      runCase(seed)
    }
  }
}
