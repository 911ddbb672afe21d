package graft.cdc

import graft.SparkSpec
import graft.gen.{ChangeLogGen, GenConfig}
import graft.lake.LakeTable
import graft.model.{Schemas, TranscriptRow}

/** Merge-on-read semantics: delta accumulation, automatic compaction,
  * and state preservation across both. */
class MorSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = GenConfig(nEvents = 12000L, nConvs = 100L, maxTurns = 15)

  private def finalState(t: LakeTable): Seq[TranscriptRow] =
    t.read().as[TranscriptRow].collect().toSeq.sortBy(r => (r.conv_id, r.turn_idx))

  test("MoR epochs write only deltas; compaction folds them and preserves state") {
    val table = LakeTable.createTable(spark, tmpDir("mor"),
      Schemas.transcript, nBuckets = 2)
    val mc = MergeConfig(writeMode = "mor", maxDeltaFilesPerBucket = 4)
    val c = cfg
    val parts = 6
    (0 until parts).foreach { b =>
      val slice = spark.range(b * c.nEvents / parts, (b + 1) * c.nEvents / parts)
        .as[Long]
        .mapPartitions(_.map(s => ChangeLogGen.eventAt(c,
          ChangeLogGen.deliveredLsn(c, s)))).toDF()
      MergeApply.merge(table, slice, epochId = b.toLong, mc)
    }
    // 6 epochs with threshold 4 -> compaction must have fired
    val lin = table.lineage
    assert(lin.exists(_.epochId == -1L), "expected a compaction lineage row")
    // after compaction no bucket exceeds the threshold
    val perBucket = table.snapshot.files.groupBy(_.bucket).view.mapValues(_.size)
    assert(perBucket.values.forall(_ <= 4))
    // and the state equals the sequential oracle
    assert(finalState(table) == ChangeLogGen.oracleFinalState(cfg))
  }

  test("explicit compaction of every bucket yields pure base files, same state") {
    val table = LakeTable.createTable(spark, tmpDir("mor-full"),
      Schemas.transcript, nBuckets = 4)
    val mc = MergeConfig(writeMode = "mor", maxDeltaFilesPerBucket = 100)
    val log = ChangeLogGen.changeLogDF(spark, cfg)
    MergeApply.merge(table, log.limit(6000), 0L, mc)
    MergeApply.merge(table, log, 1L, mc)
    val before = finalState(table)
    assert(table.snapshot.files.exists(_.kind == "delta"))
    MergeApply.compactBuckets(table,
      table.snapshot.files.map(_.bucket).toSet, mc)
    assert(table.snapshot.files.forall(_.kind == "base"))
    assert(table.snapshot.files.groupBy(_.bucket).forall(_._2.size == 1))
    assert(finalState(table) == before)
  }

  test("time travel: pre-compaction snapshots remain readable") {
    val table = LakeTable.createTable(spark, tmpDir("mor-tt"),
      Schemas.transcript, nBuckets = 2)
    val mc = MergeConfig(writeMode = "mor", maxDeltaFilesPerBucket = 100)
    val log = ChangeLogGen.changeLogDF(spark, cfg)
    MergeApply.merge(table, log.limit(4000), 0L, mc)
    val v1 = table.snapshot.version
    val stateV1 = finalState(table)
    MergeApply.merge(table, log, 1L, mc)
    MergeApply.compactBuckets(table, table.snapshot.files.map(_.bucket).toSet, mc)
    val old = table.read(asOf = Some(v1)).as[TranscriptRow]
      .collect().toSeq.sortBy(r => (r.conv_id, r.turn_idx))
    assert(old == stateV1)
  }
}
