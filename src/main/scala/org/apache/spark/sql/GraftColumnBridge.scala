package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column↔Expression converters — the standard
  * technique for Spark extensions that define custom Catalyst expressions
  * (Spark 4 removed the public `new Column(expr)` constructor).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-root a DataFrame on its own execution RDD: the returned frame's
    * logical plan is a LEAF (`Scan ExistingRDD`), so iterative
    * algorithms that build a frame per round (BPE training, connected
    * components) keep O(1) plan size per round instead of chaining
    * InMemoryRelations — whose recursive (and, under AQE, per-level
    * duplicated) tree printing makes explain strings grow geometrically
    * with the round count (OOMs the driver near ~300 chained rounds).
    * Uses the InternalRow path, so no Row conversion is paid.
    *
    * The RDD lineage still chains round-over-round; callers persist
    * each round's frame so a recompute only reaches one frame back.
    */
  /** @param copyRows toRdd reuses UnsafeRow buffers per partition
    *        iterator; the default copies like Dataset.localCheckpoint so
    *        any consumer sees stable rows. Pass false ONLY when the
    *        re-rooted frame is always persisted and materialized through
    *        the columnar cache build (which copies values itself) before
    *        any other consumer touches it — saves one RDD layer and one
    *        row copy per call, which matters in per-round iterative use.
    */
  def rerootOnRdd(df: DataFrame, copyRows: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val rdd = if (copyRows) df.queryExecution.toRdd.map(_.copy())
              else df.queryExecution.toRdd
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, df.schema, isStreaming = false)
  }
}
