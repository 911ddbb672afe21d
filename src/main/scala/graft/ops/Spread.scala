package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism floor for small scans. A single small parquet file reads
  * as one or two splits, so every downstream per-row expression (shingle
  * explode, 64-way signature aggs, quantized dot products) would run on
  * one or two cores of the cluster. Repartitioning is applied ONLY when
  * the scan's file count is below the cluster's core count: at
  * production scale (100 TB = millions of files) the condition is false
  * and this is the identity — the exchange exists precisely when the
  * input is small enough for it to be free. The probe is
  * `df.inputFiles` — file-listing metadata only; converting to an RDD
  * for `getNumPartitions` would force physical planning of the subtree
  * once per query construction. */
private[ops] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < want) df.repartition(want) else df
  }
}
