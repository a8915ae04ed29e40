package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.LogicalRDD

/** Materialization helpers for iterative graph/rank loops (SURVEY §2.5).
  *
  * Two Spark facts drive both helpers, discovered by Round15Spec's
  * exchange pins and invisible at correctness level:
  *
  *  1. Under AQE, `Dataset.localCheckpoint` CANNOT carry a partitioned
  *     layout: `AdaptiveSparkPlanExec.outputPartitioning` reports
  *     `UnknownPartitioning`, so the checkpoint's `LogicalRDD` forgets
  *     the `HashPartitioning` and every downstream join silently
  *     re-exchanges the materialized side — the exact shuffle the
  *     layout existed to avoid. An `InMemoryRelation` (persist) DOES
  *     expose the cached plan's final partitioning to consumers.
  *  2. `Dataset.unpersist` on a localCheckpointed DataFrame is a silent
  *     no-op: the blocks belong to the checkpointed RDD, which the
  *     cache manager never sees. Deterministic release needs
  *     `rdd.unpersist` on the `LogicalRDD`'s RDD (until then the
  *     node-sized blocks of every superseded round stay pinned until
  *     the ContextCleaner happens to GC the reference).
  */
object Layouts {

  /** Materialize `df` hash-partitioned on `cols` so the layout SURVIVES
    * for every consumer: explicit-N repartition (a bare
    * `repartition(col)` is a REPARTITION_BY_COL shuffle AQE may
    * coalesce, erasing the declared distribution) + EAGER persist (the
    * CC-adjacency discipline — a lazy cache races its first consumers;
    * and see the class scaladoc for why persist, not localCheckpoint).
    * Callers own the release: `unpersist` it once the last consumer has
    * materialized (the CacheHygieneSpec policy).
    */
  def partitioned(df: DataFrame, cols: Seq[Column]): DataFrame = {
    val parted = df
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        cols: _*)
      .persist()
    parted.count()
    parted
  }

  /** Free a materialized round's blocks, whatever materialized it:
    * localCheckpoint → unpersist the checkpointed RDD directly (see
    * class scaladoc — `Dataset.unpersist` never finds those blocks);
    * persist / reliable checkpoint → the ordinary paths. Safe once
    * every consumer reads a LATER round: those plans scan their own
    * blocks and carry no lineage back.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(false)
      case _ => df.unpersist(false)
    }
}
