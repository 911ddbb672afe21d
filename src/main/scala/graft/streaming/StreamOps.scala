package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the change feed — the event-time operators a
  * monitoring deployment runs NEXT TO the CDC apply path (the reference
  * has no streaming at all; its closest analog is the cron-window
  * alerting at reference: launchpad.py:107-113, 314-319).
  *
  * Composition preference per the engine's design rules: built-in
  * event-time operators (`window`, `session_window`, `withWatermark`)
  * wherever the semantics fit — they ride whole-stage codegen and the
  * streaming state store; `flatMapGroupsWithState` ONLY for the one
  * operator whose state machine the built-ins cannot express.
  */
object StreamOps {

  /** Event-time tumbling-window counts with a late-data watermark: the
    * standard ingest-monitoring aggregate (events/minute by op). State
    * scales with open windows × op values, not with events — the
    * watermark closes windows and evicts their state. */
  def windowedOpCounts(events: DataFrame, timeCol: String = "ts",
      windowDur: String = "1 minute",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowDur).as("w"), col("op"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("op"), col("n"))

  /** Conversation sessions: turns of one conv_id group into a session
    * until an inactivity gap — the built-in `session_window` (dynamic
    * merging windows in the state store; no custom state needed). */
  def conversationSessions(events: DataFrame, timeCol: String = "ts",
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .filter(col(timeCol).isNotNull)
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(col("conv_id"), session_window(col(timeCol), gap).as("s"))
      .agg(count(lit(1)).as("turns"),
        min(col(timeCol)).as("first_ts"), max(col(timeCol)).as("last_ts"))
      .select(col("conv_id"), col("s.start").as("session_start"),
        col("turns"), col("first_ts"), col("last_ts"))

  /** Per-conversation running high-watermark of turn_idx. */
  final case class ConvProgress(maxTurn: Int, events: Long)

  /** An out-of-order arrival: a turn below the conversation's
    * already-seen maximum (replayed/late upstream delivery — the per-key
    * analog of the lineage `lateEvents` metric). */
  final case class TurnRegression(
      conv_id: String, turn_idx: Int, max_seen: Int)

  /** Cross-batch per-key state machine: emit every event whose turn_idx
    * is below the max already seen for its conversation, in delivery
    * (LSN) order. Genuinely needs arbitrary state (a per-key
    * high-watermark that must survive across micro-batches), so this is
    * the `flatMapGroupsWithState` tier — state is one (int, long) per
    * conversation, partitioned by the groupBy key exactly like the
    * merge's bucket layout. Rows are (conv_id, turn_idx, lsn); the
    * group's events are re-ordered by LSN inside the batch because the
    * shuffle does NOT preserve upstream order (a group's per-batch
    * volume is bounded, so the in-memory sort is too). */
  def turnRegressions(
      events: Dataset[(String, Int, Long)]): Dataset[TurnRegression] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[ConvProgress, TurnRegression](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (conv: String, it: Iterator[(String, Int, Long)],
            state: GroupState[ConvProgress]) =>
          var st = state.getOption.getOrElse(ConvProgress(-1, 0L))
          val out = scala.collection.mutable.Buffer[TurnRegression]()
          it.toSeq.sortBy(_._3).foreach { case (_, turn, _) =>
            if (turn < st.maxTurn) out += TurnRegression(conv, turn, st.maxTurn)
            st = ConvProgress(math.max(st.maxTurn, turn), st.events + 1)
          }
          state.update(st)
          out.iterator
      }
  }
}
