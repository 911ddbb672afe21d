package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism floor for small scans. A single small parquet file reads
  * as one or two splits, so every downstream per-row expression (shingle
  * explode, 64-way signature aggs, quantized dot products) would run on
  * one or two cores of the cluster. Repartitioning is applied ONLY when
  * the scan's file count is below the cluster's core count: at
  * production scale (100 TB = millions of files) the condition is false
  * and this is the identity — the exchange exists precisely when the
  * input is small enough for it to be free. Two-stage probe: the file
  * COUNT (listing metadata, no planning) short-circuits the production
  * case. files ≥ cores proves scan partitions ≥ cores even though Spark
  * BIN-PACKS small files: maxSplitBytes = min(maxPartitionBytes,
  * max(openCost, totalCost/defaultParallelism)) where totalCost counts
  * openCost per file, so either (a) bytesPerCore ≥ openCost and bins ≥
  * totalCost/bytesPerCore = defaultParallelism, or (b) bytesPerCore <
  * openCost, maxSplit = openCost, and bins ≥ totalCost/openCost ≥ file
  * count ≥ cores; first-fit closing bins early only ever ADDS bins, and
  * the maxPartitionBytes cap only shrinks maxSplit (more bins again).
  * Only when the file count alone can't prove it (few files, which may
  * still be large and SPLITTABLE, or a non-file-backed frame) does it
  * pay one physical planning pass for the exact split count — cheap
  * precisely when the input is. */
private[ops] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length >= want) df
    else if (df.rdd.getNumPartitions < want) df.repartition(want)
    else df
  }
}
