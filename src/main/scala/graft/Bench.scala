package graft
import org.apache.spark.sql.SparkSession

import graft.cdc.{CdcPipeline, PipelineConfig}
import graft.gen.{ChangeLogGen, GenConfig}
import graft.lake.LakeTable
import graft.model.Schemas

/** Benchmark main — emits ONE JSON line with two sections:
  *
  *  1. `queries`: every SparkEntry query timed against SPARK_GRAFT_SF_DIR
  *     at local[SPARK_GRAFT_CPUS]. SPARK_GRAFT_REPEAT (default 2) runs
  *     each N times cache-cold and reports the fastest — steady-state
  *     numbers with codegen/JIT warmup discounted, the regime that
  *     matters at 100 TB (plan compile time is a per-query constant;
  *     scan/shuffle time is what scales).
  *
  *  2. `cdc`: the north-rule scaling evidence (BASELINE.md protocol) —
  *     the same seeded changelog replayed end-to-end through the
  *     streaming MERGE pipeline at local[8] and local[32] (N vs 4N
  *     cores), after a JIT warmup replay, reporting events/sec at both
  *     plus `scaling_efficiency` = eps32 / (4 * eps8). Disable with
  *     SPARK_GRAFT_CDC_EVENTS=0; size with SPARK_GRAFT_CDC_EVENTS.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full replay (generate feed + streaming MERGE of all batches)
    * on a fresh session at the given core count; returns events/sec. */
  private def replayRate(cores: Int, events: Long, batches: Int): Double = {
    val work = java.nio.file.Files.createTempDirectory("graft-bench-cdc").toString
    val spark = session(cores)
    try {
      val cfg = GenConfig(nEvents = events,
        nConvs = math.max(4L, events / 50), maxTurns = 40)
      ChangeLogGen.writeBatches(spark, cfg, s"$work/feed", batches)
      val table = LakeTable.createTable(spark, s"$work/table",
        Schemas.transcript, nBuckets = 32)
      val t0 = System.nanoTime()
      CdcPipeline.replayAvailable(spark, s"$work/feed", table,
        PipelineConfig(checkpointDir = s"$work/ckpt", maxFilesPerTrigger = 1))
      events / ((System.nanoTime() - t0) / 1e9)
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    val cdcEvents = sys.env.getOrElse("SPARK_GRAFT_CDC_EVENTS", "400000").toLong

    val spark = session(cpus.toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // each run starts cache-cold; repeats measure JIT-warm plans, not warm caches
        spark.catalog.clearCache()
        sec
      }
      name -> times.min
    }
    spark.stop()

    val cdcJson = if (cdcEvents > 0) {
      val batches = 10
      replayRate(32, math.min(cdcEvents, 100000L), batches) // JIT warmup, discarded
      val eps8 = replayRate(8, cdcEvents, batches)
      val eps32 = replayRate(32, cdcEvents, batches)
      val eff = eps32 / (4.0 * eps8)
      f""","cdc":{"events":$cdcEvents,"batches":$batches,"eps_8":$eps8%.1f,"eps_32":$eps32%.1f,"scaling_efficiency":$eff%.3f}"""
    } else ""

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"repeat":$repeat$cdcJson}""")
  }
}
