package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.model.ChangeEvent

/** Event-time streaming operators: windowed counts under a watermark,
  * built-in session windows, and the flatMapGroupsWithState per-key
  * state machine. All driven through MemoryStream so watermark
  * advancement and cross-batch state are exercised for real. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def ev(lsn: Long, conv: String, turn: Int, t: Timestamp) =
    ChangeEvent(lsn, "I", conv, turn, "user", s"t$turn", null, t)

  test("windowed op counts advance with the watermark and drop state") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = StreamOps.windowedOpCounts(in.toDF(), windowDur = "1 minute",
      watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("woc")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, "a", 0, ts(0)), ev(2, "a", 1, ts(0)), ev(3, "b", 0, ts(1)))
      q.processAllAvailable()
      // nothing emitted yet: watermark has not passed the first window
      assert(spark.table("woc").count() == 0)
      // an event far ahead advances the watermark past 10:00 and 10:01
      in.addData(ev(4, "c", 0, ts(30)))
      q.processAllAvailable()
      in.addData(ev(5, "c", 1, ts(31)))
      q.processAllAvailable()
      val rows = spark.table("woc").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(rows.toSet.contains(("2026-01-01 10:00:00.0", "I", 2L)))
      assert(rows.toSet.contains(("2026-01-01 10:01:00.0", "I", 1L)))
    } finally q.stop()
  }

  test("conversation sessions merge by inactivity gap (session_window)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = StreamOps.conversationSessions(in.toDF(), gap = "10 minutes",
      watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // conv a: turns at 10:00, 10:05 (one session), then 10:40 (a new one)
      in.addData(ev(1, "a", 0, ts(0)), ev(2, "a", 1, ts(5)), ev(3, "a", 2, ts(40)))
      q.processAllAvailable()
      in.addData(ev(4, "z", 0, Timestamp.valueOf("2026-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData(ev(5, "z", 1, Timestamp.valueOf("2026-01-01 12:30:00")))
      q.processAllAvailable()
      val sessions = spark.table("sess").filter($"conv_id" === "a")
        .orderBy("session_start").collect()
        .map(r => (r.getTimestamp(1).toString, r.getLong(2)))
      assert(sessions.toSeq == Seq(
        ("2026-01-01 10:00:00.0", 2L), ("2026-01-01 10:40:00.0", 1L)))
    } finally q.stop()
  }

  test("turn regressions: per-key high-watermark state survives across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Int, Long)]
    val q = StreamOps.turnRegressions(in.toDS())
      .writeStream.format("memory").queryName("regr")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(("a", 0, 10L), ("a", 3, 11L), ("b", 1, 12L))
      q.processAllAvailable()
      assert(spark.table("regr").count() == 0)
      // batch 2: a turn below conv a's max (3) — state crossed the batch
      in.addData(("a", 1, 20L), ("b", 2, 21L))
      q.processAllAvailable()
      val got = spark.table("regr").as[StreamOps.TurnRegression].collect()
      assert(got.toSeq == Seq(StreamOps.TurnRegression("a", 1, 3)))
    } finally q.stop()
  }
}
