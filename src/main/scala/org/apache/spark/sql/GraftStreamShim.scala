package org.apache.spark.sql

/** The one bridge into Spark's `private[sql]` surface this library uses.
  *
  * A DSv1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * must return batches whose logical plan carries `isStreaming = true`
  * (`MicroBatchExecution` asserts it: "did not have isStreaming=true"),
  * and the only way to stamp that flag on an arbitrary plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`,
  * which is `private[sql]`. Every DSv1 lakehouse source works this way —
  * Delta Lake's `DeltaSource` ships the identical shim — so this file
  * lives in `org.apache.spark.sql` to satisfy the access modifier and
  * does nothing else.
  */
object GraftStreamShim {

  /** Re-plan `df` as a streaming micro-batch: compile its physical plan
    * to the `InternalRow` RDD and wrap that in a streaming-flagged
    * `LogicalRDD` with the same schema. Lazy — nothing executes until
    * the surrounding streaming batch runs. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    // queryExecution/internalCreateDataFrame live on the classic (local
    // JVM) implementations of the Spark 4 unified API types
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The inverse, for a DSv1 `Sink.addBatch`: the engine hands the sink
    * a streaming-flagged micro-batch, which batch-only operations
    * (observe, collect) reject — re-plan it as a plain batch DataFrame,
    * exactly what Spark's own `ForeachBatchSink` does before invoking
    * the user function. */
  def asPlainBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
