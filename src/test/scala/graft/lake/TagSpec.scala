package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.MergeApply
import graft.gen.{ChangeLogGen, GenConfig}
import graft.model.Schemas

/** Snapshot tags (Iceberg-style refs): pin → time-travel-by-name →
  * vacuum retention → fsck audit → CLI surface. */
class TagSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = GenConfig(nEvents = 3000L, nConvs = 50L, maxTurns = 8)

  private def batch(lsn: Long, conv: String) = {
    val ts = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")
    Seq((lsn, "I", conv, 0, "user", "hello", null: String, ts))
      .toDF("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  private def freshTable(): LakeTable = {
    val t = LakeTable.createTable(spark, tmpDir("tag"), Schemas.transcript, 4)
    MergeApply.merge(t, ChangeLogGen.changeLogDF(spark, cfg), 0L)
    t
  }

  test("tag pins a version; reads by tag are stable across later commits") {
    val t = freshTable()
    val v1 = t.snapshot.version
    val rows1 = t.read().count()
    t.tag("release-a")
    assert(t.tags == Map("release-a" -> v1))
    MergeApply.merge(t, batch(9000001L, "post-tag"), 1L)
    assert(t.read().count() == rows1 + 1)
    assert(t.read(asOf = Some(t.resolveRef("release-a"))).count() == rows1)
    // numeric refs still resolve as versions
    assert(t.resolveRef(v1.toString) == v1)
    intercept[IllegalArgumentException] { t.resolveRef("no-such-tag") }
  }

  test("tags are immutable unless replace = true; bad names rejected") {
    val t = freshTable()
    t.tag("r1")
    MergeApply.merge(t, batch(9000002L, "x"), 1L)
    intercept[IllegalArgumentException] { t.tag("r1") }
    val v2 = t.snapshot.version
    t.tag("r1", replace = true)
    assert(t.tags("r1") == v2)
    t.dropTag("r1")
    assert(t.tags.isEmpty)
    intercept[IllegalArgumentException] { t.dropTag("r1") }
    intercept[IllegalArgumentException] { t.tag("123") } // version-ambiguous
    intercept[IllegalArgumentException] { t.tag("has space") }
    // tagging a version that never existed must fail, not dangle
    intercept[Exception] { t.tag("ghost", Some(99999L)) }
  }

  test("re-tagging the version a tag already pins is an idempotent no-op") {
    val t = freshTable()
    val vPinned = t.snapshot.version
    t.tag("rel")
    val vAfterTag = t.snapshot.version
    // same name, same target: no new snapshot, with or without --replace
    assert(t.tag("rel", Some(vPinned)).version == vAfterTag)
    assert(t.tag("rel", Some(vPinned), replace = true).version == vAfterTag)
    assert(t.tags == Map("rel" -> vPinned))
    // bare re-tag targets CURRENT (which the tag commit itself advanced),
    // so immutability still rejects it without --replace
    intercept[IllegalArgumentException] { t.tag("rel") }
  }

  test("vacuum never expires a tagged version; dropping the tag releases it") {
    val t = freshTable()
    val vTagged = t.snapshot.version
    val taggedRows = t.read().count()
    t.tag("pinned", Some(vTagged))
    // bury the tagged version under several newer snapshots
    (1L to 4L).foreach(i => MergeApply.merge(t, batch(9100000L + i, s"c$i"), i))
    val (expired1, _) = t.vacuum(keepSnapshots = 1)
    assert(expired1 > 0, "untagged history should expire")
    // the pinned version survived and still reads exactly
    assert(t.read(asOf = Some(t.resolveRef("pinned"))).count() == taggedRows)
    assert(t.fsck().isEmpty)
    // release the pin: the version becomes vacuumable
    t.dropTag("pinned")
    t.vacuum(keepSnapshots = 1)
    intercept[Exception] { t.snapshotAt(vTagged) }
  }

  test("fsck flags a dangling tag") {
    val t = freshTable()
    t.tag("r", Some(t.snapshot.version))
    // simulate manual snapshot deletion behind the tag's back
    val conf = spark.sessionState.newHadoopConf()
    val snapDir = new org.apache.hadoop.fs.Path(s"${t.dir}/_snapshots")
    val fs = snapDir.getFileSystem(conf)
    val target = t.tags("r")
    MergeApply.merge(t, batch(9200001L, "y"), 1L)
    fs.delete(new org.apache.hadoop.fs.Path(snapDir,
      f"v$target%012d.json"), false)
    val problems = t.fsck()
    assert(problems.exists(_.contains("dangling tag r")), problems.mkString("; "))
    // a malformed tag value (manual set-property) is flagged, not fatal
    t.setProperty("tag.bad", "not-a-version")
    assert(t.fsck().exists(_.contains("dangling tag bad")))
    // vacuum must not crash on either broken pin (they pin nothing)
    t.vacuum(keepSnapshots = 1)
  }

  test("CLI: tag / tags / drop-tag / show --at <tag>") {
    val t = freshTable()
    val dir = t.dir
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    def run(args: String*): Int =
      TableMain.run(spark, dir +: args.toSeq, lines += _)
    assert(run("tag", "rel-1") == 0)
    val vTag = t.tags("rel-1")
    MergeApply.merge(t, batch(9300001L, "newer"), 1L)
    lines.clear()
    assert(run("tags") == 0)
    assert(lines.exists(l => l.contains("rel-1") && l.contains(s"v$vTag")))
    lines.clear()
    assert(run("show", "1000", "--at", "rel-1") == 0)
    assert(!lines.exists(_.contains("newer")))
    lines.clear()
    assert(run("show", "1000", "--at", t.snapshot.version.toString) == 0)
    assert(lines.exists(_.contains("newer")))
    assert(run("tag", "rel-1") == 1)              // immutable without --replace
    val vNow = t.snapshot.version
    assert(run("tag", "rel-1", "--replace") == 0) // repoint to CURRENT
    assert(t.tags("rel-1") == vNow)
    assert(run("drop-tag", "rel-1") == 0)
    assert(t.tags.isEmpty)
    assert(run("tag", "rel-1", "7", "8") == 1) // extra positional args rejected
  }
}
