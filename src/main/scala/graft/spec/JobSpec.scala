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
  *
  * Null semantics: a null LITERAL means "match null" — `== null` compiles
  * to `IS NULL`, `!= null` to `IS NOT NULL`, and a null inside an
  * `in`/`not in` list adds (or negates) an `IS NULL` branch; ordering and
  * substring ops reject null at compile time. Null FIELD values follow
  * SQL three-valued logic: a null never satisfies `!=`/`not in` against a
  * non-null literal (Python's `None != "x"` is True; in SQL the row is
  * dropped) — the deliberate cost of predicates the scanner can push. */
object FilterDsl {
  sealed trait Value
  final case class Scalar(v: Any) extends Value
  final case class Many(vs: Seq[Any]) extends Value

  final case class Pred(field: String, op: String, value: Value)

  def compileOne(p: Pred): Column = {
    val c = col(p.field)
    // the non-null subset of an in/not-in list, plus whether null appears
    def split(vs: Seq[Any]): (Seq[Any], Boolean) =
      (vs.filter(_ != null), vs.contains(null))
    (p.op, p.value) match {
      // a null literal means "match null": SQL's `= NULL` is never true,
      // so compiling it blindly would silently drop every row
      case ("==", Scalar(null)) => c.isNull
      case ("!=", Scalar(null)) => c.isNotNull
      case ("==", Scalar(v)) => c === lit(v)
      case ("!=", Scalar(v)) => c =!= lit(v)
      case (op @ (">" | ">=" | "<" | "<=" | "includes" | "excludes"),
          Scalar(null)) =>
        throw new IllegalArgumentException(
          s"filter ${p.field} $op null: null has no ordering or substring " +
            "meaning (use == null / != null)")
      case (">", Scalar(v)) => c > lit(v)
      case (">=", Scalar(v)) => c >= lit(v)
      case ("<", Scalar(v)) => c < lit(v)
      case ("<=", Scalar(v)) => c <= lit(v)
      case ("in", Many(vs)) =>
        val (nn, hasNull) = split(vs)
        if (hasNull) c.isNull || c.isin(nn: _*) else c.isin(nn: _*)
      case ("not in", Many(vs)) =>
        val (nn, hasNull) = split(vs)
        if (hasNull) !(c.isNull || c.isin(nn: _*)) else !c.isin(nn: _*)
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
  def normalizeHeader(c: String): String =
    c.trim.toLowerCase.replaceAll("[ -]+", "_")

  def normalizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeHeader): _*)

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
  * the preferred non-null value per field per id).
  *
  * [[Linkage.resolveEntities]] is the full entity-resolution pipeline the
  * reference runs pairwise in Python (reference:
  * engine/payload/house_cat/_deduplicate.py:869-935: merge any two
  * records sharing a non-null candidate-key value, chained transitively;
  * 937-998: curated link-table forced merges): candidate-key equi-joins
  * produce the link graph, connected components (iterative min-label
  * propagation) assign entities, and one hash aggregate merges each
  * component's fields. The reference's field rules are order-dependent
  * (whichever pair merges first wins); ours are total-ordered and
  * permutation-invariant — required for a distributed engine, where
  * merge order is nondeterministic: single distinct value → itself,
  * conflicting strings → sorted `'|'`-join (the reference's conflict
  * union, _deduplicate.py:844), conflicting non-strings → max. */
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

  /** Link edges from shared candidate-key values: records a and b are
    * linked when `a[k] = b[k]` (non-null) for ANY k in `keyCols` — the
    * reference's "any shared candidate key" rule (_deduplicate.py:869).
    * One inverted-index equi-join per key, unioned and deduped; a hot key
    * value with df documents yields df²/2 edges, so boilerplate values
    * (empty strings, "N/A") must be nulled out upstream — same contract
    * as the reference's standardization pass (_deduplicate.py:24-85). */
  def keyEdges(records: DataFrame, idCol: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one candidate key")
    keyCols.map { k =>
      val kr = records.select(col(idCol).as("__id"), col(k).as("__v"))
        .filter(col("__v").isNotNull)
      kr.as("x").join(kr.as("y"),
          col("x.__v") === col("y.__v") && col("x.__id") < col("y.__id"))
        .select(col("x.__id").as("ida"), col("y.__id").as("idb"))
    }.reduce(_ union _).distinct()
  }

  /** Connected components over undirected `edges` (ida, idb) for `nodes`
    * (single column `id`). Returns (id, lbl) with lbl = min member id of
    * the component — deterministic regardless of edge order or plan.
    *
    * Size-adaptive, like broadcast-vs-shuffle join selection: a linkage
    * graph's EDGE list is tiny relative to the record corpus (only
    * records sharing a candidate key produce edges), so when the edge
    * count is within `broadcastEdgeLimit` the components are solved with
    * a path-compressed union-find on the driver and the (edge-touched
    * ids → label) map re-enters the plan as one broadcast left-join —
    * two jobs, no iteration, untouched nodes label themselves. Above the
    * limit it falls back to distributed min-label propagation: every
    * node takes the min of its own and its neighbors' labels until a
    * fixpoint — O(component diameter) rounds, each ONE shuffle-join +
    * hash aggregate (linkage clusters are near-cliques, so rounds ≈ 2-4;
    * `maxIter` guards pathological chains, and non-convergence throws
    * rather than returning a partial labelling). Every round is
    * localCheckpoint-ed: the round's labels feed two subtrees of the
    * next round, so without per-round lineage truncation the logical
    * plan doubles each round — Catalyst analysis, not the shuffle,
    * becomes the bottleneck — and callers also get a flat plan for
    * free.
    *
    * Contract: edge endpoints must be drawn from `nodes` — see
    * [[resolveEntities]], which enforces it for curated edges (the two
    * solver paths would otherwise disagree on stray endpoints).
    * `broadcastEdgeLimit` bounds the DRIVER-side fast path: 500k edges
    * collect to ~50-100 MB of boxed rows + two hash maps — safe under
    * common 1-4g driver heaps; raise it only with driver memory to
    * spare (the distributed path is correct at any size, just slower
    * on small graphs). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 30, broadcastEdgeLimit: Long = 500000L): DataFrame = {
    // persist BEFORE the size probe: the probe's count() is then the one
    // evaluation of the (possibly expensive) edge subtree, and whichever
    // path runs next — the union-find collect or the distributed rounds'
    // repartition — reads the cached blocks instead of recomputing it
    val e = edges.persist()
    try {
      if (broadcastEdgeLimit > 0 && e.count() <= broadcastEdgeLimit)
        componentsViaUnionFind(nodes, e)
      else connectedComponentsDistributed(nodes, e, maxIter)
    } finally e.unpersist()
  }

  /** Driver union-find fast path of [[connectedComponents]]. */
  private def componentsViaUnionFind(nodes: DataFrame,
      edges: DataFrame): DataFrame = {
    import scala.collection.mutable
    val parent = mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val touched = mutable.HashSet.empty[Any]
    edges.collect().foreach { e =>
      touched += e.get(0); touched += e.get(1)
      val (ra, rb) = (find(e.get(0)), find(e.get(1)))
      if (ra != rb) parent(rb) = ra
    }
    // canonical label = MIN member id (ids are Comparable: the
    // distributed path's least() makes the same demand)
    val minOf = mutable.HashMap.empty[Any, Any]
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    touched.foreach { id =>
      val r = find(id)
      minOf.updateWith(r)(cur => Some(cur.fold(id)(c => if (lt(id, c)) id else c)))
    }
    val idType = nodes.schema("id").dataType
    val spark = nodes.sparkSession
    val rows: java.util.List[org.apache.spark.sql.Row] =
      new java.util.ArrayList
    touched.foreach(id =>
      rows.add(org.apache.spark.sql.Row(id, minOf(find(id)))))
    val mapDf = spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("__lbl", idType))))
    nodes.join(broadcast(mapDf), Seq("id"), "left")
      .select(col("id"), coalesce(col("__lbl"), col("id")).as("lbl"))
  }

  /** Distributed min-label propagation path of [[connectedComponents]]. */
  private def connectedComponentsDistributed(nodes: DataFrame,
      edges: DataFrame, maxIter: Int): DataFrame = {
    // no distinct: a duplicate edge (two shared keys already deduped by
    // keyEdges; forced + key edge can coincide) is absorbed by the
    // min-aggregate below, so deduping here would buy nothing for a
    // shuffle it costs. Pre-partitioned on the join key: the cached
    // partitioning is reused every round, so each round only exchanges
    // the (much smaller) label frame.
    val und = edges.select(col("ida").as("a"), col("idb").as("b"))
      .union(edges.select(col("idb").as("a"), col("ida").as("b")))
      .repartition(col("b")).persist()
    var labels = nodes.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    var prev: DataFrame = labels
    var iter = 0
    var converged = false
    try {
      while (!converged && iter < maxIter) {
        val prop = und
          .join(labels.select(col("id").as("bid"), col("lbl")),
            col("b") === col("bid"))
          .groupBy(col("a")).agg(min(col("lbl")).as("nlbl"))
        // LAZY localCheckpoint, materialized by the ONE action below:
        // the round's labels feed TWO subtrees of the next round (the
        // propagation join and the carry side), so without per-round
        // lineage truncation the logical plan DOUBLES every round and
        // Catalyst analysis — not the shuffle — becomes the bottleneck
        // (exponential plan, OOM building the explain string by ~r30).
        val merged = labels.select(col("id"), col("lbl").as("olbl"))
          .join(prop, col("id") === col("a"), "left")
          .select(col("id"), col("olbl"),
            least(col("olbl"), coalesce(col("nlbl"), col("olbl"))).as("lbl"))
          .localCheckpoint(false)
        // ONE action per round: the changed-count agg materializes the
        // round's checkpoint AND answers the convergence question
        converged = merged
          .agg(count(when(col("lbl") =!= col("olbl"), 1)))
          .collect()(0).getLong(0) == 0L
        // round k-1's blocks are dead once round k is materialized
        prev.unpersist()
        prev = merged
        labels = merged.select(col("id"), col("lbl"))
        iter += 1
      }
      if (!converged) throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
      labels
    } finally { und.unpersist() }
  }

  /** Merge each component to one row: canonical_id = min member id (the
    * component label), n_members, then every non-id field under the
    * total-ordered conflict rules documented on [[Linkage]]. */
  def mergeComponents(records: DataFrame, idCol: String,
      labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val fields = records.schema.fields.filterNot(_.name == idCol)
    val aggs = fields.toSeq.map { f =>
      f.dataType match {
        case StringType =>
          // single value → itself; conflict → sorted '|'-join
          // (_deduplicate.py:844); all-null → null (collect_set drops
          // nulls, so guard the empty set)
          when(size(collect_set(col(f.name))) === 0, lit(null))
            .otherwise(array_join(array_sort(collect_set(col(f.name))), "|"))
            .as(f.name)
        case _ => max(col(f.name)).as(f.name)
      }
    }
    records.join(labels, records(idCol) === labels("id"))
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_members"), aggs: _*)
      .withColumnRenamed("lbl", "canonical_id")
  }

  /** Full entity resolution: candidate-key link graph (+ optional curated
    * forced-link edges — the reference's unidirectional_links.csv,
    * _deduplicate.py:937-998) → connected components → field merge. */
  def resolveEntities(records: DataFrame, idCol: String,
      keyCols: Seq[String], forcedEdges: Option[DataFrame] = None,
      broadcastEdgeLimit: Long = 500000L): DataFrame = {
    // records feeds many subtrees (both sides of each key's self-join,
    // the node list, the final merge) — persist for the duration of the
    // resolution, as any iterative graph algorithm does with its input.
    // The returned frame is materialized (localCheckpoint) so the cache
    // can be dropped before returning.
    val cached = records.persist()
    try {
      val edges = forcedEdges.fold(keyEdges(cached, idCol, keyCols)) { f =>
        // curated links may reference retired/mistyped ids. An endpoint
        // absent from records would make the two component solvers
        // DISAGREE on the same input: driver union-find bridges through
        // the stray id (and can emit it as a canonical_id that exists in
        // no record) while distributed label propagation silently drops
        // the edge. Restricting edges to the record id set gives both
        // paths the same graph — the [[connectedComponents]] contract
        // (endpoints ⊆ nodes).
        val ids = cached.select(col(idCol))
        val clean = f.toDF("ida", "idb")
          .join(ids.select(col(idCol).as("ida")), Seq("ida"), "left_semi")
          .join(ids.select(col(idCol).as("idb")), Seq("idb"), "left_semi")
          .select(col("ida"), col("idb"))
        keyEdges(cached, idCol, keyCols).union(clean).distinct()
      }
      val labels = connectedComponents(cached.select(col(idCol).as("id")),
        edges, broadcastEdgeLimit = broadcastEdgeLimit)
      mergeComponents(cached, idCol, labels).localCheckpoint(true)
    } finally cached.unpersist()
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
