package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism floor for small scans. A single small parquet file reads
  * as one or two splits, so every downstream per-row expression (shingle
  * explode, 64-way signature aggs, quantized dot products) would run on
  * one or two cores of the cluster. Repartitioning is applied ONLY when
  * the scan is provably small: at production scale (100 TB = millions of
  * files) the probes below prove the scan wide and this is the
  * identity — the exchange exists precisely when the input is small
  * enough for it to be free. Two metadata-only probes, no physical
  * planning and no RDD conversion:
  *
  *  1. file COUNT (`inputFiles` — file-index listing). files ≥ cores
  *     proves scan partitions ≥ cores even though Spark BIN-PACKS small
  *     files: maxSplitBytes = min(maxPartitionBytes, max(openCost,
  *     totalCost/defaultParallelism)) where totalCost counts openCost
  *     per file, so either (a) bytesPerCore ≥ openCost and bins ≥
  *     totalCost/bytesPerCore = defaultParallelism, or (b) bytesPerCore
  *     < openCost, maxSplit = openCost, and bins ≥ totalCost/openCost ≥
  *     file count ≥ cores; first-fit closing bins early only ever ADDS
  *     bins, and the maxPartitionBytes cap only shrinks maxSplit (more
  *     bins again).
  *  2. total BYTES (logical-plan stats — the same file-index size, no
  *     physical planning): few files may still be large and SPLITTABLE.
  *     bytes ≥ cores × maxPartitionBytes proves splits ≥ cores, because
  *     then maxSplitBytes = min(maxPartitionBytes, …) ≤ bytes/cores, so
  *     packing bytes into maxSplit-sized bins yields ≥ cores bins.
  *
  * Only when both probes fail is the input genuinely sub-core-count and
  * the repartition cheap by construction.
  *
  * The probes are only SOUND for file-backed frames over splittable
  * formats: a non-file-backed frame (LogicalRDD from createDataFrame)
  * reports `defaultSizeInBytes = Long.MaxValue` when no stats exist —
  * the bytes probe would pass trivially on a 1-partition frame — and a
  * few large NON-splittable files (gzip) yield one scan partition per
  * file no matter the bytes. Both fall back to the physical partition
  * probe (`rdd.getNumPartitions`, one-off planning of the subtree) —
  * the cases are rare in this engine and the probe is exact there. */
private[ops] object Spread {

  /** Single-stream compression suffixes Spark cannot split. */
  private val NonSplittable =
    Seq(".gz", ".zip", ".zst", ".lz4", ".deflate", ".br")

  def apply(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.length >= want) df
    else if (files.nonEmpty &&
        !files.exists(f => NonSplittable.exists(f.toLowerCase.endsWith))) {
      val maxSplit = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes >= BigInt(maxSplit) * want) df else df.repartition(want)
    } else {
      if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
    }
  }
}
