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

  /** Per-conversation running high-watermark of turn_idx — the whole
    * per-key state (one int; anything more would multiply state-store
    * and checkpoint bytes by key cardinality for nothing). NOTE: this
    * shape IS the flatMapGroupsWithState state schema — changing it
    * invalidates existing query checkpoints (Spark's state-schema check
    * rejects the restart); treat any field change as a
    * new-checkpoint-required migration. */
  final case class ConvProgress(maxTurn: Int)

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
    * volume is bounded, so the in-memory sort is too).
    *
    * Pass `idleEviction` on any LONG-RUNNING deployment: with it, a
    * key's state is dropped after that long without new events — under
    * unbounded conv_id cardinality (conversations open and close
    * forever) un-evicted state grows monotonically until the state store
    * OOMs or checkpointing dominates the trigger. Two explicit trades:
    * an arrival later than the eviction window is judged against a
    * fresh watermark and not flagged (size the window to the feed's
    * out-of-orderness, same contract as any watermark), and Spark runs a
    * micro-batch EVERY trigger once processing-time timeouts are
    * registered — pair eviction with a real `Trigger.ProcessingTime`
    * interval (the default zero-interval trigger would busy-loop, and
    * `processAllAvailable` never quiesces — why the default here stays
    * NoTimeout for bounded tests/backfills). */
  def turnRegressions(events: Dataset[(String, Int, Long)],
      idleEviction: Option[String] = None): Dataset[TurnRegression] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleEviction.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_._1)
      .flatMapGroupsWithState[ConvProgress, TurnRegression](
        OutputMode.Append(), timeoutConf) {
        (conv: String, it: Iterator[(String, Int, Long)],
            state: GroupState[ConvProgress]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(ConvProgress(-1))
            val out = scala.collection.mutable.Buffer[TurnRegression]()
            it.toSeq.sortBy(_._3).foreach { case (_, turn, _) =>
              if (turn < st.maxTurn)
                out += TurnRegression(conv, turn, st.maxTurn)
              st = ConvProgress(math.max(st.maxTurn, turn))
            }
            state.update(st)
            idleEviction.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
