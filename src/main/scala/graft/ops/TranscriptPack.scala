package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/** The transcript pack bound to the lake table: one call runs a
  * q42-q48-shaped operator over a PINNED release of a `graft-table` —
  * "assemble release r1's transcripts" is
  * `TranscriptPack.assemble(table, Some("r1"))`. Refs resolve versions
  * AND tags ([[LakeTable.resolveRef]]); `None` reads the current
  * snapshot. The operators themselves are the generic frames in
  * [[TranscriptQueries]] (and [[ConvExport]] for the JSONL artifact) —
  * this object only binds the transcript schema
  * `(conv_id, turn_idx, role, text, tool, ts)` and the snapshot
  * pinning, so the driver-gated queries and the table-bound calls can
  * never drift. Scale shapes are therefore the gated ones: assembly and
  * dedup are one hash-agg + per-group O(k log k) sort; sessionize and
  * contextPack are ONE exchange + ONE sort with rollups reusing the
  * partitioning. For the actor/time-ordered operators, `conv_id` is the
  * actor and turns order by `(ts, turn_idx)`.
  */
object TranscriptPack {

  /** Pinned snapshot read: `ref` = tag name or version string (per
    * [[LakeTable.resolveRef]]), `None` = current. */
  def readAt(table: LakeTable, ref: Option[String] = None): DataFrame =
    table.read(ref.map(table.resolveRef))

  /** The transcript schema cast into the event-stream shape the
    * actor/time-ordered operators consume: conv_id is the actor,
    * turn_idx the unique in-actor order key, text the payload. The
    * transcript table has no numeric `value`; the null column makes
    * sessionize's `sum_value` null rather than fabricating a metric. */
  private def asEvents(transcripts: DataFrame): DataFrame =
    transcripts.select(
      col("conv_id").as("user_id"),
      col("turn_idx").cast("long").as("event_id"),
      col("text").as("event_type"),
      col("ts"),
      lit(null).cast("double").as("value"))

  /** Ordered per-conversation reassembly of a release — the north
    * rule's stable-turn-ordering invariant as a one-call read (q42
    * shape): (conv_id, transcript, n_turns, last_turn_idx). */
  def assemble(table: LakeTable, ref: Option[String] = None): DataFrame =
    TranscriptQueries.assemble(readAt(table, ref),
      "conv_id", "turn_idx", "text")

  /** Conversation-level exact-dedup clusters of a release (q46 shape):
    * md5 of the ordered assembly, (tx_hash, cluster_size,
    * canonical_id). */
  def convClusters(table: LakeTable, ref: Option[String] = None): DataFrame =
    TranscriptQueries.convClusters(readAt(table, ref),
      "conv_id", "turn_idx", "text")

  /** Inactivity-gap sessionization of a release (q43 shape), per
    * conversation: (conv_id, session_no, n_events, session_start,
    * session_end). */
  def sessionize(table: LakeTable, ref: Option[String] = None,
      gapUs: Long = TranscriptQueries.SessionGapUs): DataFrame =
    TranscriptQueries.sessionize(asEvents(readAt(table, ref)), gapUs)
      .drop("sum_value") // no numeric payload in the transcript schema
      .withColumnRenamed("user_id", "conv_id")

  /** Per-conversation context-window packing of a release (q48 shape):
    * (conv_id, chunk_no, n_events, chunk_tokens, chunk_start). */
  def contextPack(table: LakeTable, ref: Option[String] = None,
      budget: Long = TranscriptQueries.ContextBudgetTokens): DataFrame =
    TranscriptQueries.contextPack(asEvents(readAt(table, ref)), budget)
      .withColumnRenamed("user_id", "conv_id")

  /** One JSON document per conversation of a release (the training
    * artifact; [[ConvExport.conversationsJson]] — the TableMain
    * `export-conversations --at <ref>` twin as a library call). */
  def conversationsJson(table: LakeTable,
      ref: Option[String] = None): DataFrame =
    ConvExport.conversationsJson(readAt(table, ref))
}
