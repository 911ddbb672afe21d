package graft.spec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The reference's job-level row-filter DSL (reference:
  * engine/wprdc_etl/pipeline/pipeline.py:212-245): a list of
  * `[field, op, value]` triples AND-ed together, ops
  * `==, !=, >, >=, <, <=, in, not in, includes, excludes`.
  * Compiled to Catalyst `Column` predicates so they push down to the scan
  * (the reference applies them row-at-a-time in Python, pipeline.py:379-384;
  * here Catalyst's PushDownPredicates moves them into the parquet reader).
  */
object FilterDsl {
  sealed trait Value
  final case class Scalar(v: Any) extends Value
  final case class Many(vs: Seq[Any]) extends Value

  final case class Pred(field: String, op: String, value: Value)

  def compileOne(p: Pred): Column = {
    val c = col(p.field)
    (p.op, p.value) match {
      case ("==", Scalar(v)) => c === lit(v)
      case ("!=", Scalar(v)) => c =!= lit(v)
      case (">", Scalar(v)) => c > lit(v)
      case (">=", Scalar(v)) => c >= lit(v)
      case ("<", Scalar(v)) => c < lit(v)
      case ("<=", Scalar(v)) => c <= lit(v)
      case ("in", Many(vs)) => c.isin(vs: _*)
      case ("not in", Many(vs)) => !c.isin(vs: _*)
      // reference semantics: substring containment on the field value
      case ("includes", Scalar(v)) => c.contains(lit(v))
      case ("excludes", Scalar(v)) => !c.contains(lit(v))
      case (op, v) => throw new IllegalArgumentException(s"bad filter: $op $v")
    }
  }

  /** AND-fold, like `apply_filters` (reference: pipeline.py:236-245). */
  def compile(preds: Seq[Pred]): Column =
    preds.map(compileOne).reduceOption(_ && _).getOrElse(lit(true))

  def apply(df: DataFrame, preds: Seq[Pred]): DataFrame = df.filter(compile(preds))
}

/** Declarative projection: rename (load_from/dump_to, reference:
  * engine/payload/ac/dog_licenses.py:18-24), cast (marshmallow field
  * types, reference: engine/wprdc_etl/pipeline/schema.py:3-9), constant
  * defaults (dump_only+default, reference:
  * engine/payload/wprdc/pa_vaccination_stats.py:36), column-order
  * preservation (`Meta.ordered`, dog_licenses.py:26-27). */
object Projection {
  final case class Field(
      from: String, // source column ("" for synthesized)
      to: String, // output name
      cast: Option[DataType] = None,
      default: Option[Any] = None)

  def apply(df: DataFrame, fields: Seq[Field]): DataFrame =
    df.select(fields.map { f =>
      val base =
        if (f.from.nonEmpty) col(f.from)
        else lit(f.default.orNull)
      val withDefault =
        if (f.from.nonEmpty && f.default.isDefined)
          coalesce(base, lit(f.default.get))
        else base
      f.cast.fold(withDefault)(withDefault.cast).as(f.to)
    }: _*)

  /** Header normalization, as the reference does on extract (lowercase,
    * strip, spaces/hyphens → underscores; reference:
    * engine/wprdc_etl/pipeline/extractors.py:141-155). */
  def normalizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c =>
      c.trim.toLowerCase.replaceAll("[ -]+", "_")): _*)

  /** Drop rows whose values are all null (`ignore_empty_rows`,
    * reference: pipeline.py:203-204). */
  def dropEmptyRows(df: DataFrame): DataFrame =
    df.filter(!df.columns.map(col(_).isNull).reduce(_ && _))
}

/** Scalar cleanup operators beyond single casts. */
object ScalarOps {
  /** Multi-format fuzzy timestamp parse: try each pattern in order, first
    * success wins, all-fail → null. The coalesce-of-try_to_timestamp
    * chain stays a pure codegen'd per-row expression (no UDF). Nearly
    * every reference payload job hand-rolls this loop in Python
    * (reference: engine/payload/pgh/dpw_smart_trash_cans.py:45-53,
    * engine/payload/pgh/pull_monthly.py:31-39). */
  def fuzzyTimestamp(c: Column, formats: Seq[String]): Column = {
    require(formats.nonEmpty, "need at least one format")
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)
  }
}

/** Record-linkage merge: union heterogeneous sources on a shared key and
  * coalesce each field by source priority — the reusable core of the
  * reference's pairwise linkage merge (reference:
  * engine/payload/house_cat/_super_link.py:41-75: union N sources, keep
  * the preferred non-null value per field per id). */
object Linkage {
  import org.apache.spark.sql.functions.{min_by, when}

  /** Link `dfs` (each ≤ 1 row per `key`) into one row per key. Columns are
    * the union of all source columns; each field takes its value from the
    * EARLIEST source (by position in `dfs`) that has it non-null. One
    * hash aggregate — no iterative pairwise joins. */
  def linkSources(dfs: Seq[DataFrame], key: String): DataFrame = {
    require(dfs.nonEmpty, "need at least one source")
    val allCols = dfs.flatMap(_.columns).distinct.filterNot(_ == key)
    val aligned = dfs.zipWithIndex.map { case (df, i) =>
      val present = df.columns.toSet
      df.select(col(key) +: (allCols.map(c =>
        (if (present(c)) col(c) else lit(null)).as(c)) :+
        lit(i).as("__src")): _*)
    }
    val aggs = allCols.map(c =>
      min_by(col(c), when(col(c).isNotNull, col("__src"))
        .otherwise(lit(Int.MaxValue))).as(c))
    aligned.reduce(_ unionByName _)
      .groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
  }
}

/** Incremental time-window operators — the reference's per-resource
  * time-field registry + day-window fetch (reference:
  * engine/etl_util.py:314-348, engine/time_field_util.py:53-127). The
  * registered time column travels as the `watermark.column` table
  * property ([[graft.lake.LakeTable]] snapshot `properties`), so an
  * incremental puller needs only the table handle. */
object TimeField {
  /** Table-property key naming the event-time column. */
  val WatermarkColumn = "watermark.column"

  /** Rows newer than max(timeCol) - `days` — the time-gap incremental
    * window. One scan computes the max (tiny 1-row side), the filtered
    * re-scan prunes on the pushed predicate. */
  def timeGap(df: DataFrame, timeCol: String, days: Int): DataFrame = {
    val hi = df.agg(max(col(timeCol)).as("__max_t"))
    df.crossJoin(hi)
      .filter(col(timeCol) > col("__max_t") - expr(s"INTERVAL $days DAYS"))
      .drop("__max_t")
  }
}
