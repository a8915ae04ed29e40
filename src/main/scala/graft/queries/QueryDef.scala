package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent ANSI SQL the DuckDB oracle
  * runs on the same parquet files.
  *
  * Contract notes (SURVEY §5.2.2):
  *  - column names must match between the Spark result and the oracle SQL;
  *  - every query ends in a fully-specified total ORDER BY. One declared
 *    exemption: a query whose output is Θ(n²)-dense (dedup_simhash_banded)
 *    may return an unordered pair SET — the driver's compare row-sorts
 *    both sides before hashing, and a global sort there is a full
 *    range-partition shuffle of the largest result in the suite;
  *  - float aggregation goes through exact DECIMAL casts and is converted
  *    to DOUBLE only at the very end, with the identical expression on
  *    both sides, so results are bit-reproducible regardless of partition
  *    order.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  def toQueriesMap(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def toOracleMap(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
