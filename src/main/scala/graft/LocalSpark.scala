package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession setup for the CLI mains (LaunchMain, TableMain):
  * `GRAFT_CPUS` (default all cores) → `local[N]`, 32 shuffle partitions,
  * UTC, no UI, WARN logs. The perf harnesses (Bench, ReplayMain) keep
  * their own builders — they take cores as protocol ARGUMENTS and add
  * memory/GC knobs a maintenance CLI shouldn't. */
object LocalSpark {
  def session(appName: String): SparkSession = {
    val cores = sys.env.getOrElse("GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
