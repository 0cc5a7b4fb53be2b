package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for eager-`localCheckpoint` loops.
  *
  * Every iterative operator in this package anchors its per-round
  * state with `localCheckpoint(true)`; the checkpoint blocks live in
  * the executors' block managers and — unlike cached frames —
  * `Dataset.unpersist` cannot free them (checkpoint RDDs never enter
  * the cache manager). Without explicit release, a k-round loop holds
  * k copies of the running state at once: evictable (storage blocks
  * are LRU), but real memory pressure in a long session — measured as
  * the r15 q_graph_walks floor breach, where `steps` superseded walk
  * states stayed resident through the whole query.
  *
  * [[drop]] walks the analyzed plan to its materialized `LogicalRDD`
  * leaves and unpersists the RDDs themselves. ONLY call it on a frame
  * that is itself the OUTPUT of `localCheckpoint` (its lone leaf is
  * its own checkpoint RDD) and is superseded: calling it on an
  * intermediate plan would also free still-live upstream anchors that
  * appear among that plan's leaves (e.g. the once-shuffled symmetric
  * edge list every later round re-reads).
  */
private[graft] object Blocks {

  /** Free a `localCheckpoint`ed frame's storage blocks NOW instead of
    * at session end. No-op on frames with no materialized leaf.
    */
  def drop(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
