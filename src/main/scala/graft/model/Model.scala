package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core data model of the engine, per the input hint in BASELINE.json and
  * SURVEY.md §1: a lake table of multi-turn conversation transcripts keyed
  * by `(conv_id, turn_idx)`, fed by a binlog/WAL-style change stream.
  *
  * The reference (rocket-etl) models a "record" as an ordered dict of
  * column→scalar (reference: engine/wprdc_etl/pipeline/extractors.py:162)
  * and declares per-job primary keys (reference: engine/etl_util.py:495).
  * Here the record is a typed case class with a fixed composite key.
  */
final case class TranscriptRow(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // nullable: tool name when role == "tool"
    ts: Timestamp)

/** One change event in the WAL/binlog envelope (SURVEY.md §1.1, FIXTURES.md
  * §2.2). `lsn` is the globally monotone sequence number used for
  * last-writer-wins conflict resolution; `op` is I(nsert)/U(pdate)/D(elete).
  * Payload columns are null on deletes.
  */
final case class ChangeEvent(
    lsn: Long,
    op: String,
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

object Schemas {
  /** Key columns of the transcript table — the MERGE `ON` clause. Mirrors
    * the reference's per-job `primary_key_fields`
    * (reference: engine/etl_util.py:495). */
  val keyCols: Seq[String] = Seq("conv_id", "turn_idx")

  val transcript: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  val changeEvent: StructType = StructType(
    StructField("lsn", LongType, nullable = false) +:
    StructField("op", StringType, nullable = false) +:
    transcript.fields.toSeq)

  /** v2 envelope: adds `extras` — an open map carrying values for columns
    * added by schema-registry events (op = "S", registry JSON in `text`;
    * see graft.cdc.SchemaRegistry). v1 parquet feeds read as extras=null,
    * so the two envelope generations interoperate. */
  val changeEventV2: StructType = StructType(changeEvent.fields.toSeq :+
    StructField("extras", MapType(StringType, StringType), nullable = true))

  /** Payload (non-key, non-envelope) columns carried by the change feed. */
  val payloadCols: Seq[String] = transcript.fieldNames.toSeq.diff(keyCols)
}
