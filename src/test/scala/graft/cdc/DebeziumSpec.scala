package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable
import graft.model.Schemas

/** Debezium-envelope ingestion: JSON change records (wrapped and flat,
  * mixed in one feed) through the adapter into the lake merge, with
  * tombstone and malformed-record handling. */
class DebeziumSpec extends SparkSpec {
  import spark.implicits._

  private def rowJson(conv: String, turn: Int, role: String, text: String,
      ts: String): String =
    s"""{"conv_id":"$conv","turn_idx":$turn,"role":"$role",""" +
      s""""text":"$text","tool":null,"ts":"$ts"}"""

  private def rec(op: String, lsn: Long, before: String, after: String,
      wrapped: Boolean): String = {
    val body = s"""{"op":"$op","before":${Option(before).getOrElse("null")},""" +
      s""""after":${Option(after).getOrElse("null")},""" +
      s""""source":{"lsn":$lsn,"ts_ms":1700000000000}}"""
    if (wrapped) s"""{"payload":$body}""" else body
  }

  test("c/r/u/d records (wrapped + flat mixed) replay to the right state") {
    val t0 = "2026-01-01T00:00:00Z"
    val feed = Seq(
      // snapshot read (r) and create (c) -> inserts
      rec("r", 1, null, rowJson("c1", 0, "user", "hello", t0), wrapped = true),
      rec("c", 2, null, rowJson("c1", 1, "assistant", "hi", t0), wrapped = false),
      rec("c", 3, null, rowJson("c2", 0, "user", "doomed", t0), wrapped = true),
      // update rewrites c1/1
      rec("u", 4, rowJson("c1", 1, "assistant", "hi", t0),
        rowJson("c1", 1, "assistant", "hi there", t0), wrapped = false),
      // delete carries only the preimage
      rec("d", 5, rowJson("c2", 0, "user", "doomed", t0), null, wrapped = true)
    ).toDF("value")

    val env = DebeziumAdapter.toEnvelope(feed, Schemas.transcript)
    assert(env.columns.take(2).toSeq == Seq("lsn", "op"))

    val table = LakeTable.createTable(spark, tmpDir("dbz"),
      Schemas.transcript, 4)
    MergeApply.merge(table, env, 0L)
    val got = table.read()
      .select("conv_id", "turn_idx", "text")
      .as[(String, Int, String)].collect().toSet
    assert(got == Set(("c1", 0, "hello"), ("c1", 1, "hi there")))
  }

  test("late lower-LSN update loses; redelivered records are LWW no-ops") {
    val t0 = "2026-01-01T00:00:00Z"
    val feed = Seq(
      rec("c", 10, null, rowJson("c1", 0, "user", "final", t0), wrapped = true),
      // stale update arriving late (lower LSN) must lose
      rec("u", 7, null, rowJson("c1", 0, "user", "stale", t0), wrapped = false),
      // duplicate delivery of the winner changes nothing
      rec("c", 10, null, rowJson("c1", 0, "user", "final", t0), wrapped = true)
    ).toDF("value")
    val table = LakeTable.createTable(spark, tmpDir("dbz-lww"),
      Schemas.transcript, 2)
    MergeApply.merge(table, DebeziumAdapter.toEnvelope(feed, Schemas.transcript), 0L)
    assert(table.read().select("text").as[String].collect().toSeq ==
      Seq("final"))
  }

  test("tombstones drop; malformed records hit envelope validation") {
    val t0 = "2026-01-01T00:00:00Z"
    val feed = Seq(
      rec("c", 1, null, rowJson("c1", 0, "user", "ok", t0), wrapped = false),
      null.asInstanceOf[String], // Kafka compaction tombstone
      "   ",                     // empty value
      """{"not":"debezium"}""",  // wrong shape -> null op
      "{broken json"             // unparseable -> null everything
    ).toDF("value")
    val env = DebeziumAdapter.toEnvelope(feed, Schemas.transcript)
    assert(env.count() == 3) // tombstone + blank dropped, bad rows kept
    val table = LakeTable.createTable(spark, tmpDir("dbz-bad"),
      Schemas.transcript, 2)
    // strict mode refuses the whole batch before anything commits
    intercept[PoisonEventException] {
      MergeApply.merge(table, env, 0L)
    }
    assert(table.read().count() == 0)
    // quarantine mode applies the good row, dead-letters the two bad ones
    val r = MergeApply.merge(table, env, 1L,
      MergeConfig(invalidRows = "quarantine"))
    assert(r.rejectedEvents == 2)
    assert(table.read().select("text").as[String].collect().toSeq ==
      Seq("ok"))
  }

  test("streaming composition: json feed -> toEnvelope -> graft-table sink") {
    // the README's one-liner binlog-to-lake pipeline, end to end: a
    // file stream of Debezium JSON through the adapter into the
    // exactly-once sink
    val t0 = "2026-01-01T00:00:00Z"
    val feedDir = tmpDir("dbz-feed")
    val lines = Seq(
      rec("c", 1, null, rowJson("sc1", 0, "user", "hello", t0), wrapped = true),
      rec("c", 2, null, rowJson("sc1", 1, "assistant", "hi", t0), wrapped = false),
      rec("u", 3, null, rowJson("sc1", 1, "assistant", "hi!", t0), wrapped = true))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(feedDir, "batch-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val tableDir = tmpDir("dbz-sink")
    LakeTable.createTable(spark, tableDir, Schemas.transcript, 2)
    val raw = spark.readStream.text(feedDir) // fixed schema: value STRING
    val env = DebeziumAdapter.toEnvelope(raw, Schemas.transcript)
    val q = env.writeStream.format("graft-table")
      .option("path", tableDir)
      .option("checkpointLocation", tmpDir("dbz-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in time")
    val got = LakeTable.load(spark, tableDir).read()
      .select("turn_idx", "text").as[(Int, String)].collect().toSet
    assert(got == Set((0, "hello"), (1, "hi!")))
  }

  test("lsnField picks ONE ordering space per feed; missing field fails loud") {
    val t0 = "2026-01-01T00:00:00Z"
    val seqRec =
      s"""{"op":"c","before":null,"after":${rowJson("s1", 0, "user", "a", t0)},""" +
        s""""source":{"sequence":"42","ts_ms":5}}"""
    val tsRec =
      s"""{"op":"c","before":null,"after":${rowJson("s2", 0, "user", "b", t0)},""" +
        s""""ts_ms":77,"source":{"ts_ms":9}}"""
    val srcTsRec = // no payload ts_ms -> same-clock source.ts_ms fallback
      s"""{"op":"c","before":null,"after":${rowJson("s3", 0, "user", "c", t0)},""" +
        s""""source":{"ts_ms":9}}"""
    def lsns(field: String, recs: String*): Seq[Long] =
      DebeziumAdapter.toEnvelope(recs.toDF("value"), Schemas.transcript,
        lsnField = field)
        .orderBy("conv_id").select("lsn").as[java.lang.Long]
        .collect().toSeq.map(Long.unbox)
    assert(lsns("sequence", seqRec) == Seq(42L))
    assert(lsns("ts_ms", tsRec, srcTsRec) == Seq(77L, 9L))
    // the default space is source.lsn — a record without it gets a null
    // LSN and is REJECTED by validation, never silently mis-ordered
    // into a different clock's values
    val env = DebeziumAdapter.toEnvelope(
      Seq(seqRec).toDF("value"), Schemas.transcript)
    assert(env.select("lsn").head().isNullAt(0))
    val table = LakeTable.createTable(spark, tmpDir("dbz-space"),
      Schemas.transcript, 2)
    intercept[PoisonEventException] { MergeApply.merge(table, env, 0L) }
    intercept[IllegalArgumentException] {
      DebeziumAdapter.toEnvelope(Seq(seqRec).toDF("value"),
        Schemas.transcript, lsnField = "gtid")
    }
  }
}
