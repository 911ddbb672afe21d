package graft.cdc

import org.apache.spark.sql.SparkSession

import graft.gen.{ChangeLogGen, GenConfig}
import graft.lake.LakeTable
import graft.model.Schemas

/** CLI surface for the engine: generate a seeded change feed, replay it
  * through the streaming CDC pipeline into a lake table, and report
  * lineage + throughput. Doubles as the bench kernel.
  *
  * Usage: runMain graft.cdc.ReplayMain <workDir> <nEvents> <nBatches>
  *        [cores] [nBuckets] [check]
  */
object ReplayMain {
  def main(args: Array[String]): Unit = {
    val workDir = args.lift(0).getOrElse(sys.error("usage: ReplayMain <workDir> <nEvents> <nBatches> [cores] [nBuckets] [check]"))
    val nEvents = args.lift(1).map(_.toLong).getOrElse(100000L)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(8)
    val cores = args.lift(3).map(_.toInt).getOrElse(8)
    val nBuckets = args.lift(4).map(_.toInt).getOrElse(32)
    val check = args.lift(5).forall(_.toBoolean)

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-replay")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val cfg = GenConfig(nEvents = nEvents,
        nConvs = math.max(4L, nEvents / 50), maxTurns = 40)
      val feed = s"$workDir/feed"
      val tableDir = s"$workDir/table"
      val ckpt = s"$workDir/ckpt"

      println(s"[replay] generating $nEvents events into $nBatches batch files …")
      val tGen = System.nanoTime()
      ChangeLogGen.writeBatches(spark, cfg, feed, nBatches)
      println(f"[replay] feed written in ${(System.nanoTime() - tGen) / 1e9}%.1f s")

      val existing = LakeTable.load(spark, tableDir)
      val table =
        if (existing.exists) { println(s"[replay] resuming existing table at $tableDir (v${existing.snapshot.version})"); existing }
        else LakeTable.createTable(spark, tableDir, Schemas.transcript, nBuckets)
      val pcfg = PipelineConfig(checkpointDir = ckpt, maxFilesPerTrigger = 1)
      val t0 = System.nanoTime()
      CdcPipeline.replayAvailable(spark, feed, table, pcfg)
      val sec = (System.nanoTime() - t0) / 1e9
      val rate = nEvents / sec

      val snap = table.snapshot
      println(f"[replay] applied ${snap.lineage.size} epochs in $sec%.2f s → $rate%.0f events/s")
      snap.lineage.foreach { l =>
        println(f"[lineage] epoch=${l.epochId} v=${l.version} rows=${l.rowsApplied} buckets=${l.bucketsTouched.size} files+${l.filesRewritten}/~${l.filesCarried} maxLsn=${l.maxLsn} ${l.durationMs} ms")
      }
      val rows = table.read().count()
      println(s"[replay] final table rows = $rows (snapshot v${snap.version})")
      table.read().orderBy("conv_id", "turn_idx").show(5, truncate = false)

      if (check) {
        print("[replay] checking final state vs sequential oracle … ")
        val oracle = ChangeLogGen.oracleFinalState(cfg)
        import spark.implicits._
        val got = table.read().as[graft.model.TranscriptRow]
          .collect().sortBy(r => (r.conv_id, r.turn_idx)).toSeq
        if (got == oracle) println("OK (exact match)")
        else { println(s"MISMATCH got=${got.size} want=${oracle.size}"); sys.exit(1) }
      }
      println(f"""{"metric":"cdc_events_per_sec","value":$rate%.1f,"events":$nEvents,"batches":$nBatches,"cores":$cores,"buckets":$nBuckets,"seconds":$sec%.3f}""")
    } finally spark.stop()
  }
}
