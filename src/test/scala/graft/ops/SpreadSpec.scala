package graft.ops

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

/** [[Spread]]'s parallelism floor across its three probe paths: small
  * file-backed scans (metadata probes), non-file-backed frames and
  * non-splittable files (physical partition fallback — the byte probe
  * is unsound for both: LogicalRDD stats default to Long.MaxValue, and
  * gzip yields one partition per file regardless of bytes). */
class SpreadSpec extends SparkSpec {

  private def want = spark.sparkContext.defaultParallelism

  test("spread: small parquet scan is widened to core count") {
    val dir = tmpDir("spread-pq")
    import spark.implicits._
    (1 to 100).toDF("v").coalesce(1).write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
    assert(Spread(df).rdd.getNumPartitions >= want)
  }

  test("spread: non-file-backed frame is widened, not waved through by MaxValue stats") {
    import spark.implicits._
    // LocalTableScan / LogicalRDD: inputFiles is empty and logical
    // stats report defaultSizeInBytes — the byte probe would pass
    // trivially and leave a 1-2 partition frame unrepartitioned
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 100).map(Tuple1(_)), 2))
      .toDF("v")
    assert(df.inputFiles.isEmpty)
    assert(Spread(df).rdd.getNumPartitions >= want)
  }

  test("spread: non-splittable gzip input is widened even when bytes look large") {
    val dir = tmpDir("spread-gz")
    val p = Paths.get(dir, "t.csv.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    out.write((Seq("v") ++ (1 to 5000).map(_.toString)).mkString("\n").getBytes)
    out.close()
    val df = spark.read.option("header", "true").csv(p.toString)
    assert(df.inputFiles.length == 1)
    assert(Spread(df).rdd.getNumPartitions >= want)
  }
}
