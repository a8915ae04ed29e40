package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CmSketchAgg invariants:
  *
  *  - the MERGE LAW (cell-wise addition) over arbitrary splits, plus
  *    merge commutativity and input-order independence — the mergeable-
  *    summaries contract;
  *  - the Count-Min guarantee: est(key) ≥ true(key) for EVERY key, and
  *    est == true when the geometry is collision-free;
  *  - a collision fixture where the overestimate is strictly positive
  *    for at least one key (the min-of-d path does real work);
  *  - Spark-side partitioning invariance (1 vs 13 partitions →
  *    bit-identical matrices) and map-side partial aggregation;
  *  - geometry guards (d ≥ 1, w ≥ 2).
  */
class CmSketchSpec extends SparkSpec {

  private val D = 4
  private val W = 32

  /** Packed base-w positions from the four 32-bit md5 chunks — the
    * exact recipe the declared query computes in codegen'd built-ins.
    */
  private def packed(tok: String, w: Int = W): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"cm:$tok".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until D).map { j =>
      val p = java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16) % w
      p * math.pow(w, j).toLong
    }.sum
  }

  private def direct(xs: Seq[Long], d: Int = D, w: Int = W): Array[Long] = {
    val agg = CmSketchAgg(d, w)
    xs.foldLeft(agg.zero)(agg.reduce)
  }

  private val rnd = new scala.util.Random(7)
  // 200 distinct keys, each 1–5 occurrences, shuffled: w=32 ⇒ heavy
  // collisions per hash row, the min-of-4 estimate does real work
  private val truth: Map[String, Long] =
    (0 until 200).map(i => s"k$i" -> (1L + i % 5)).toMap
  private val data: Seq[Long] = rnd.shuffle(
    truth.toSeq.flatMap { case (k, n) => Seq.fill(n.toInt)(packed(k)) }.toList)

  test("merge law over arbitrary splits; commutative; order-independent") {
    val agg = CmSketchAgg(D, W)
    val whole = direct(data).toSeq
    Seq(1, 13, 200, 500).foreach { cut =>
      val (a, b) = data.splitAt(cut)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(bufA, bufB).toSeq == whole, s"split at $cut")
      val bufA2 = a.foldLeft(agg.zero)(agg.reduce)
      val bufB2 = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(bufB2, bufA2).toSeq == whole, s"commute at $cut")
    }
    assert(direct(rnd.shuffle(data.toList)).toSeq == whole, "order leaked")
    // total mass: every occurrence lands in exactly one cell per row
    assert(whole.sum == data.size.toLong * D)
  }

  test("est >= true for every key; collisions make some overestimate strict") {
    val sk = direct(data)
    val ests = truth.map { case (k, n) =>
      k -> CmSketchAgg.estimate(sk, D, W, packed(k)) }
    ests.foreach { case (k, est) =>
      assert(est >= truth(k), s"$k under-estimated: $est < ${truth(k)}") }
    assert(ests.exists { case (k, est) => est > truth(k) },
      "no collision at 200 keys / 32 buckets — fixture degenerate")
  }

  test("collision-free geometry is exact") {
    // 8 keys in a 4×4096 sketch: the probability-free check is the
    // measured one — these specific md5 chunks do not collide
    val few = truth.keys.take(8).toSeq
    val sk = direct(
      few.flatMap(k => Seq.fill(truth(k).toInt)(packed(k, 4096))),
      D, 4096)
    few.foreach { k =>
      assert(CmSketchAgg.estimate(sk, D, 4096, packed(k, 4096)) == truth(k))
    }
  }

  test("spark partitioning invariance and map-side partial aggregation") {
    import spark.implicits._
    val df = data.toDF("packed")
      .withColumn("g", pmod(col("packed"), lit(2)))
    val cm = udaf(CmSketchAgg(D, W))
    def run(parts: Int): Seq[(Long, Seq[Long])] =
      df.repartition(parts).groupBy(col("g"))
        .agg(cm(col("packed")).as("cells"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
        .sortBy(_._1)
    val one = run(1)
    assert(one == run(13), "sketch must not depend on partitioning")
    val plan = df.groupBy(col("g")).agg(cm(col("packed")).as("cells"))
    plan.collect()
    assert(plan.queryExecution.executedPlan.toString
      .contains("partial_cmsketchagg"),
      plan.queryExecution.executedPlan.toString.take(2000))
  }

  test("geometry must be sane") {
    intercept[IllegalArgumentException](CmSketchAgg(0, 32))
    intercept[IllegalArgumentException](CmSketchAgg(4, 1))
  }
}
