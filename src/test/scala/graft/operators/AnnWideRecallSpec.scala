package graft.operators

import scala.util.Random

import graft.SparkSpec
import graft.queries.DedupQueries

/** The width-scaled sign-LSH dedup (DedupQueries.embeddingAnnScaled) at
  * its production operating point: τ = 0.9 near-duplicates, 16-bit
  * signatures, radius-1 probes, 8 tables. Predicted per-pair catch rate
  * at cosine c: p = 1 − acos(c)/π per bit; per-table P(Hamming ≤ 1) =
  * p^16 + 16·p^15·(1−p); recall = 1 − (1 − P)^8 ≈ 0.98 at c = 0.93.
  * The declared dedup_embedding_ann keeps the fixture's τ = 0.45
  * configuration (oracle-pinned); this spec evidences the knob the
  * 100 TB story depends on — bits ~ log2(n) with radius/tables re-tuned.
  */
class AnnWideRecallSpec extends SparkSpec {

  private val dim = 64

  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    BigDecimal(dot / math.sqrt(na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("wide ANN dedup: perfect precision, recall >= 0.9 on planted tau>=0.9 near-dups") {
    val rnd = new Random(99)
    val nBase = 1000
    val base = Array.fill(nBase)(Array.fill(dim)(rnd.nextGaussian()))
    // plant one near-dup for each of 300 distinct bases: sigma chosen so
    // planted cosine ~0.93-0.97 (sigma^2*dim ~ 0.156 => cos ~ 0.93)
    val dups = (0 until 300).map { k =>
      val src = base(k)
      src.map(x => x + 0.044 * rnd.nextGaussian())
    }
    val all = (base ++ dups).map(_.clone())
    val dir = tmpDir("ann-wide")
    import spark.implicits._
    all.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq, "x") }.toSeq
      .toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // exact ground truth at the SAME tau and rounding as the operator
    val truth = (for {
      i <- all.indices.iterator; j <- (i + 1) until all.length
      if cos6(all(i), all(j)) >= 0.9
    } yield (i.toLong, j.toLong)).toSet
    assert(truth.size >= 250, s"weak fixture: only ${truth.size} true pairs")

    val got = DedupQueries.embeddingAnnScaled(spark, dir, bits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact in-bucket verification => no false positives, ever
    assert((got -- truth).isEmpty, s"false positives: ${(got -- truth).take(5)}")
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(f"wide ANN recall = ${got.intersect(truth).size}/${truth.size} = $recall%.3f " +
      "(16 bits, radius 1, 8 tables, tau=0.9)")
    assert(recall >= 0.9, f"recall $recall%.3f below floor")
  }
}
