package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence harness: replicates the sf0.1 documents/embeddings
  * corpus ×m with per-replica perturbations that kill cross-replica
  * similarity (rotated alphabet for text, one flipped dimension for
  * vectors), then times the declared dedup/similarity queries on the
  * scaled corpus. Comparing m=1 vs m=10 timings shows which operators
  * scale ~linearly (the declared 100 TB paths: exact hash, minhash-LSH,
  * prefix-filtered ngram join, sign-LSH / IVF probes) versus the
  * quadratic all-pairs verify forms (simhash, embedding-cosine) — the
  * measured basis for BASELINE.md's scale framing.
  *
  * Usage: sbt "runMain graft.ScaleProbe <m> [query...]"        — corpus mode
  *        sbt "runMain graft.ScaleProbe tpch <m> [query...]"   — TPC-H mode
  * (tpch mode replicates customer/orders/lineitem ×m with shifted key
  * spaces — m=10 on sf0.1 ≈ TPC-H sf1 — and times the q_tpch macros.)
  */
object ScaleProbe {

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  /** Per-replica character rotation: replica 0 is the identity; others
    * share no words (hence no shingles/tokens) with any other replica.
    */
  private def rot(i: Int): String = {
    val k = (i * 7) % 26
    alpha.drop(k) + alpha.take(k)
  }

  def scaleCorpus(spark: SparkSession, src: String, out: String, m: Int): Unit = {
    val fs = new java.io.File(out)
    if (new java.io.File(fs, "_DONE").exists()) return
    fs.mkdirs()

    val docs = Tables.load(spark, src, "documents")
    (0 until m).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), alpha, rot(i))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_))
      .repartition(math.max(4, m))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // Per-replica deterministic ±1 sign pattern: within a replica every
    // vector flips the SAME dims, so all within-replica dot products —
    // hence cosines — are preserved exactly; across replicas ~half the
    // ℓ2 mass lands on disagreeing signs, so cross-replica cosine
    // concentrates near 0 (≪ CosineTau). The earlier flip-one-dim
    // perturbation left cross-replica cosine ≈ 0.9, which made the TRUE
    // pair set grow quadratically in m — a fixture artifact that buried
    // the operator's linear shape.
    val vecs = Tables.load(spark, src, "embeddings")
    (0 until m).map { i =>
      vecs.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        (if (i == 0) col("embedding")
         else expr(
           s"transform(embedding, (x, j) -> CASE WHEN pmod(hash($i * 64 + j), 2) = 0 THEN -x ELSE x END)"))
          .as("embedding"),
        col("label"))
    }.reduce(_.unionByName(_))
      .repartition(math.max(4, m))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    new java.io.File(fs, "_DONE").createNewFile()
    ()
  }

  val scalePath: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash_banded", "dedup_embedding_ann",
    "dedup_cluster_cc", "pipe_curate_cc",
    "sim_lsh_topk", "sim_ivf_topk", "sim_brute_topk",
    "text_tokens", "text_fingerprint", "text_ngram_freq")
  val allPairs: Seq[String] = Seq("dedup_simhash", "dedup_embedding_cosine")

  // ── TPC-H macro scaling (`tpch` mode) ────────────────────────────────
  // Replicates the transactional tables ×m with disjoint key spaces —
  // customer/orders/lineitem all shift together so every join finds its
  // row in the same replica — while the dims (nation/region/supplier/
  // part) keep their real-world shape: small and broadcastable. m=10 on
  // sf0.1 ≈ TPC-H sf1 (6M lineitem rows); the point is to show the
  // macros' plan shape (broadcast dims, partial aggs, top-k without a
  // full sort) holds when the fact side grows 10×.
  val KeyOff = 100000000L

  val tpchQueries: Seq[String] = Seq("q_tpch03", "q_tpch05", "q_tpch10", "q_tpch18")

  def scaleTpch(spark: SparkSession, src: String, out: String, m: Int): Unit = {
    val fs = new java.io.File(out)
    if (new java.io.File(fs, "_DONE").exists()) return
    fs.mkdirs()

    def replicate(name: String, keys: Seq[String]): Unit = {
      val t = Tables.load(spark, src, name)
      (0 until m).map { i =>
        keys.foldLeft(t) { (df, k) =>
          df.withColumn(k, col(k) + lit(i.toLong * KeyOff))
        }
      }.reduce(_.unionByName(_))
        .repartition(math.max(8, m * 4))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    replicate("lineitem", Seq("l_orderkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("customer", Seq("c_custkey"))
    Seq("nation", "region", "supplier", "part").foreach { name =>
      Tables.load(spark, src, name)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    new java.io.File(fs, "_DONE").createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val tpchMode = args.headOption.contains("tpch")
    val rest = if (tpchMode) args.drop(1) else args
    val m = rest.headOption.map(_.toInt).getOrElse(10)
    // the 26-letter rotation is only collision-free for 26 replicas;
    // past that, replica pairs share a rotation and become exact dups,
    // which silently turns the probe into a duplicate-explosion workload
    require(tpchMode || m <= 26, s"multiplier $m > 26: alphabet rotations repeat")
    val names = if (rest.length > 1) rest.drop(1).toSeq
      else if (tpchMode) tpchQueries
      else if (m <= 3) scalePath ++ allPairs else scalePath
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = if (tpchMode) s"/tmp/graft_tpch_x$m" else s"/tmp/graft_scale_x$m"
    if (tpchMode) scaleTpch(spark, "/root/testdata/sf0.1", dir, m)
    else scaleCorpus(spark, "/root/testdata/sf0.1", dir, m)

    // warm up codegen/scan paths
    try SparkEntry.queries(if (tpchMode) "q_tpch03" else "dedup_exact")(spark, dir).count()
    catch { case _: Throwable => () }

    // Pseudo-name dedup_embedding_ann_w<bits>: the width-scaled ANN dedup
    // (radius 1, 8 tables, τ=0.9 — the production near-dup configuration;
    // see DedupQueries.embeddingAnnScaled). bits ~ log2(corpus) holds the
    // bucket load constant, which is what keeps the candidate join linear.
    val Wide = raw"dedup_embedding_ann_w(\d+)".r
    def runQuery(name: String): org.apache.spark.sql.DataFrame = name match {
      case Wide(bits) => queries.DedupQueries.embeddingAnnScaled(spark, dir, bits.toInt)
      case _ => SparkEntry.queries(name)(spark, dir)
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val n = try runQuery(name).count()
        catch { case e: Throwable =>
          System.err.println(s"[scale_probe] $name failed: ${e.getMessage}")
          -1L
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (name, dt, n)
    }
    val qs = results.map { case (k, v, n) =>
      s""""$k":{"sec":$v,"rows":$n}""" }.mkString("{", ",", "}")
    val mode = if (tpchMode) "tpch" else "corpus"
    println(s"""{"metric":"scale_probe","mode":"$mode","multiplier":$m,"queries":$qs}""")
    spark.stop()
  }
}
