package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query isolation: each dump runs on its own thread under a
    // wall-clock budget, tagged with a job group so a hung query's Spark
    // jobs are actually cancelled — one pathological query must cost its
    // own row, never zero the round's correctness file (every OTHER
    // failure mode was already caught per-query below)
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toLong
    SparkEntry.queries.foreach { case (name, fn) =>
      def failed(msg: String): Unit = {
        System.err.println(s"[verify] $name failed: $msg")
        // a failed dump must not leave stale/partial parquet under the
        // query's name — the driver's compare would silently grade it as
        // this run's result; a missing dir reads as an explicit failure
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$outDir/$name")): Unit
      }
      val worker = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(name, name,
            interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e: Throwable => failed(e.getMessage) }
        finally spark.sparkContext.clearJobGroup()
      }, s"verify-$name")
      worker.setDaemon(true)
      worker.start()
      worker.join(timeoutSec * 1000L)
      if (worker.isAlive) {
        spark.sparkContext.cancelJobGroup(name)
        worker.interrupt()
        worker.join(30000L) // give the cancel a moment to unwind
        failed(s"timed out after ${timeoutSec}s (job group cancelled)")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
