package graft.cdc

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.lake.LakeTable

/** Schema-registry events carried IN the change stream (north rule:
  * "schema evolution … driven by a schema registry in the change
  * stream"). A registry event is a change-feed row with `op = "S"` whose
  * `text` column holds a compact JSON payload:
  *
  * {{{
  *   {"add":   {"name": "score", "type": "int", "doc": "…"}}
  *   {"widen": {"name": "score", "type": "long"}}
  * }}}
  *
  * Data events that follow an `add` carry the new column's value in the
  * generic `extras: map<string,string>` envelope column (Debezium-style
  * open after-image); [[MergeApply.normalize]] projects
  * `extras[name]::type` into the typed column. The static envelope stays
  * fully typed, so the hot path pays nothing when no evolution happened.
  *
  * Application is IDEMPOTENT (add of an existing column / widen to the
  * current type are no-ops), which makes the crash window between
  * schema-apply and merge-commit safe under at-least-once redelivery.
  *
  * This replaces the reference's destructive `migrate_schema` (drop +
  * recreate + data-dictionary stash/restore, reference:
  * engine/etl_util.py:630-664, 87-115) with additive in-place evolution:
  * old files are never rewritten, column docs ride along in the snapshot.
  */
object SchemaRegistry {

  final case class SchemaChange(kind: String, name: String, dt: DataType,
      doc: Option[String])

  private def parseType(s: String): DataType = s match {
    case "int" | "integer" => IntegerType
    case "long" | "bigint" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" | "text" => StringType
    case "boolean" | "bool" => BooleanType
    case "timestamp" => TimestampType
    case "date" => DateType
    case other => DataType.fromDDL(other)
  }

  def parse(json: String): SchemaChange = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    (j \ "add", j \ "widen") match {
      case (JObject(_), _) =>
        val a = j \ "add"
        SchemaChange("add", (a \ "name").extract[String],
          parseType((a \ "type").extract[String]),
          (a \ "doc").extractOpt[String])
      case (_, JObject(_)) =>
        val w = j \ "widen"
        SchemaChange("widen", (w \ "name").extract[String],
          parseType((w \ "type").extract[String]), None)
      case _ => throw new IllegalArgumentException(
        s"unrecognized schema-registry event: $json")
    }
  }

  /** Apply one registry event to the table; no-op if already applied. */
  def apply(table: LakeTable, json: String): Boolean = {
    val c = parse(json)
    val schema = table.snapshot.userSchema
    c.kind match {
      case "add" =>
        if (schema.fieldNames.contains(c.name)) false
        else { table.addColumn(c.name, c.dt, c.doc.orNull); true }
      case "widen" =>
        val current = schema(c.name).dataType
        // no-op not only when the type already matches but when it has
        // ALREADY BEEN WIDENED FURTHER: one redelivered batch can carry
        // widen int->long AND widen long->double; after a crash between
        // the schema apply and the data commit, the replayed first event
        // sees double and re-widening to long would throw — a permanent
        // poison-batch loop, breaking the idempotence contract above
        if (current == c.dt || LakeTable.canWiden(c.dt, current)) false
        else { table.widenColumn(c.name, c.dt); true }
    }
  }
}
