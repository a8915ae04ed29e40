package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Randomized property checks for the round-3 custom pieces: the Morton
  * interleave, the typed Aggregator's merge algebra, and the EWMA fold —
  * each against an independent driver-side reference implementation.
  */
class PropertyRound3Spec extends SparkSpec {

  test("zvalue2 matches the reference interleave on 200 random pairs") {
    import spark.implicits._
    val rnd = new Random(11)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 16), rnd.nextInt(1 << 16)))
    def morton(a: Int, b: Int): Long =
      (0 until 16).map { k =>
        (((a >> k) & 1).toLong << (2 * k)) | (((b >> k) & 1).toLong << (2 * k + 1))
      }.sum
    val got = pairs.toDF("a", "b")
      .select(operators.ZOrder.zvalue2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (a, b) => morton(a, b) })
  }

  test("zvalue2 is injective over random distinct pairs") {
    import spark.implicits._
    val rnd = new Random(13)
    val pairs = Seq.fill(500)((rnd.nextInt(1 << 16), rnd.nextInt(1 << 16))).distinct
    val got = pairs.toDF("a", "b")
      .select(operators.ZOrder.zvalue2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.distinct.length == pairs.length)
  }

  test("ExactAvgQty merge is associative and order-insensitive") {
    val agg = queries.ExtendedQueries.ExactAvgQty
    val rnd = new Random(17)
    (1 to 20).foreach { _ =>
      val xs = Seq.fill(30)(queries.ExtendedQueries.LineQty("A", rnd.nextInt(50) + 1.0))
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      // random split into three buffers merged in shuffled order
      val (a, rest) = xs.splitAt(rnd.nextInt(xs.size))
      val (b, c) = rest.splitAt(rnd.nextInt(rest.size + 1))
      val bufs = rnd.shuffle(Seq(a, b, c).map(_.foldLeft(agg.zero)(agg.reduce)))
      val merged = bufs.reduce(agg.merge)
      assert(merged == whole)
      assert(agg.finish(merged) == agg.finish(whole))
    }
  }

  test("ev_ewma fold matches an imperative reference on random sequences") {
    import spark.implicits._
    val rnd = new Random(19)
    val seqs = (1 to 10).map(i => i.toLong -> Seq.fill(rnd.nextInt(20) + 1)(
      math.round(rnd.nextDouble() * 1000) / 100.0))
    val df = seqs.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, i, v) }
    }.toDF("k", "i", "v")
    val got = df.groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("i"), col("v")))).as("seq"))
      .select(col("k"),
        expr("aggregate(seq, cast(0.0 as double), (acc, x) -> 0.5 * x.v + 0.5 * acc)").as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    seqs.foreach { case (k, vs) =>
      val exp = vs.foldLeft(0.0)((acc, v) => 0.5 * v + 0.5 * acc)
      assert(got(k) == exp, s"key $k: ${got(k)} vs $exp")
    }
  }
}
