package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conversation-level JSONL export — the artifact a transcript training
  * pipeline actually ships: ONE JSON document per conversation, turns
  * ordered by `turn_idx`, one text line each, written distributed.
  *
  * Shape at scale: the q42 assembly shape — one hash aggregation keyed
  * by the conversation id (`collect_list` runs as partial+final
  * ObjectHashAggregate, so each conversation's text crosses the wire
  * exactly once, to the one reducer that owns it), a per-group
  * O(k log k) `array_sort` (conversations are bounded), then a per-row
  * codegen'd `to_json`. No window, no global sort, no driver loop;
  * output shards follow the aggregation's hash partitioning.
  *
  * Deterministic content: the unique turn index totally orders each
  * conversation's array (`array_sort` on a struct compares its FIRST
  * field first, which is why `turnCol` leads the struct), so the
  * nondeterministic collect_list arrival order can never leak into the
  * emitted JSON. Schema-evolved columns ride along automatically —
  * every non-key column lands in each turn object. */
object ConvExport {

  /** One row per conversation with a single string column `value`
    * holding the conversation's JSON document:
    * `{"conv_id":…,"n_turns":…,"turns":[{"turn_idx":0,…},…]}`. */
  def conversationsJson(transcripts: DataFrame, convCol: String = "conv_id",
      turnCol: String = "turn_idx"): DataFrame = {
    val payload = transcripts.columns.toSeq
      .filter(c => c != convCol && c != turnCol)
    val turnStruct = struct((turnCol +: payload).map(col): _*)
    transcripts
      .groupBy(col(convCol))
      .agg(array_sort(collect_list(turnStruct)).as("turns"))
      .select(to_json(struct(col(convCol),
        size(col("turns")).as("n_turns"), col("turns"))).as("value"))
  }

  /** Write the JSONL shards under `destDir` (error if it exists — an
    * export is a release artifact, never silently overwritten). */
  def writeJsonl(transcripts: DataFrame, destDir: String,
      convCol: String = "conv_id", turnCol: String = "turn_idx"): Unit =
    conversationsJson(transcripts, convCol, turnCol).write.text(destDir)
}
