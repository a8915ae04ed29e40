package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession per suite (guide: one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Plan text restricted to the OUTER query: drops the pre-AQE
    * "Initial Plan" echo and every InMemoryRelation's embedded
    * cached-plan text (which prints deeper-indented than the relation
    * node) — substring pins like "no BroadcastHashJoin" must not trip
    * on operators INSIDE a cached build. */
  def outerPlan(df: org.apache.spark.sql.DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    def indent(l: String): Int =
      l.takeWhile(c => c == ' ' || c == ':' || c == '|' || c == '+' ||
        c == '-' || c == '=').length
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var skipDeeper = -1
    p.linesIterator.foreach { l =>
      val ind = indent(l)
      if (skipDeeper < 0 || ind <= skipDeeper) {
        skipDeeper = if (l.contains("InMemoryRelation")) ind else -1
        out += l
      }
    }
    out.mkString("\n")
  }
}
