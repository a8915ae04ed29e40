package graft

import org.apache.spark.sql.functions._

/** Structural properties of the sliding-window chunker (text_chunk) that
  * the value-level oracle can't express: full coverage of every token,
  * bounded chunk size, and the stride/overlap contract.
  */
class TextChunkSpec extends SparkSpec {

  private lazy val rows = {
    val df = queries.TextQueries.defs.find(_.name == "text_chunk").get
      .fn(spark, sf())
    df.select(col("doc_id"), col("n"), col("chunk_idx"), col("chunk"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
  }

  test("every chunk holds at most 64 tokens and only the last may be short") {
    rows.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._3)
      sorted.dropRight(1).foreach { case (_, n, i, chunk) =>
        if (n >= 64)
          assert(chunk.split(" ").length == 64, s"doc $doc chunk $i not full")
      }
      sorted.foreach { case (_, _, i, chunk) =>
        assert(chunk.split(" ").length <= 64, s"doc $doc chunk $i too long")
      }
    }
  }

  test("chunks cover the whole document: last chunk reaches the final token") {
    rows.foreach { case (doc, cs) =>
      val n = cs.head._2
      val lastStart = cs.map(_._3).max * 48
      assert(lastStart + 64 >= n, s"doc $doc: last chunk starts at $lastStart, n=$n")
    }
  }

  test("adjacent chunks overlap by exactly 16 tokens on long documents") {
    rows.filter(_._2.head._2 > 112).take(20).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._3).map(_._4.split(" ")).toSeq
      sorted.sliding(2).toSeq.dropRight(1).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a.takeRight(16).sameElements(b.take(16)),
          s"doc $doc: overlap mismatch")
      }
    }
  }
}
