package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection surface: prints `explain("formatted")` for the given
  * queries (or all). Used to audit that the plans are the ones a 100 TB
  * deployment wants — broadcast joins on dims, pushed filters, pruned
  * scans, whole-stage codegen spans.
  *
  * Usage: runMain graft.ExplainMain <sfDir> [queryName …]
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // show the REAL operators: the dedup/ANN queries normally return an
    // eagerly checkpointed result (cache-release discipline), which
    // explains as an opaque `Scan ExistingRDD` and would blind the audit
    graft.ops.EagerRelease.enabled = false
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
