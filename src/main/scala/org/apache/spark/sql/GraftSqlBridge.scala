package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters, so custom
  * Catalyst expressions (graft.functions) can be exposed as Columns.
  * Standard pattern for Spark-4 extensions living outside the sql package.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly drop the storage blocks behind a localCheckpoint()ed Dataset.
    * Dataset.unpersist only evicts CacheManager entries; the checkpoint's
    * RDD blocks are otherwise freed lazily by the ContextCleaner on GC,
    * so an iterative algorithm (Dedup.connectedComponents) that wants
    * per-round memory bounded to one generation must unpersist the
    * underlying LogicalRDD's rdd directly — reachable only from inside
    * the sql package, hence this bridge. No-op for non-checkpointed plans.
    */
  def dropCheckpointBlocks(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
