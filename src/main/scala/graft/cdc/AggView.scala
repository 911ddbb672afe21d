package graft.cdc

import java.io.FileNotFoundException

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.lake.LakeTable

/** Outcome of one [[AggView.refresh]] round. `mode` is `noop` (view
  * already at the source version), `incremental` (maintained from the
  * change feed), or `full` (bootstrap, or fallback when the feed window's
  * from-snapshot was vacuumed). `keysTouched` = conversations whose
  * aggregate row was rewritten or tombstoned this round. */
final case class AggViewResult(
    applied: Boolean,
    mode: String,
    fromVersion: Long,
    toVersion: Long,
    keysTouched: Long,
    merge: Option[MergeResult])

/** Incremental materialized-aggregate maintenance — the consumer the
  * change feed exists for. Maintains a per-conversation aggregate table
  * (`n_turns` plus caller-named sums over arbitrary Catalyst expressions)
  * as a [[graft.lake.LakeTable]] keyed `(conv_id, 0)`, refreshed from
  * [[LakeTable.changeFeed]] deltas instead of recomputing — the
  * CDC-native form of the reference's recomputed-per-run groupby+sum
  * report (reference: engine/payload/wprdc/g_analytics.py:149-159).
  *
  * Maintenance algebra: count and sum are retractable, so each feed row
  * contributes a SIGNED delta — `insert`/`update_postimage` add, `delete`/
  * `update_preimage` subtract — and one hash aggregate over the feed
  * yields per-conversation deltas. New values are `old + delta`; a
  * conversation whose turn count reaches zero is tombstoned from the
  * view. Null sum contributions count as 0 (exprs are null-coalesced in
  * BOTH the incremental and recompute paths, so the two stay bit-equal
  * for integral exprs — AggViewSpec proves it; non-retractable aggregates
  * like min/max need the recompute path by nature and are out of scope).
  *
  * Scale shape, per refresh at a 10^10-row source: the feed is
  * manifest-LSN-pruned (O(changed data)); the delta aggregate map-side
  * combines before one shuffle of O(changed conversations) rows; the old
  * values are read via [[LakeTable.readBuckets]] restricted to the
  * buckets the changed keys map to (the bucket set is collected — bounded
  * by the view's nBuckets, a config constant, never by data); the merge
  * is the engine's bucket-pruned MERGE. Nothing in the round scans the
  * source table or the full view.
  *
  * Exactly-once: the consumed source VERSION rides in the view table's
  * app-scoped txn slot (`cfg.txnApp` pattern — Delta's txnAppId), so it
  * commits atomically with the data; a crashed or replayed refresh is a
  * no-op, and a refresh that raced another writer re-reads and retries
  * inside [[MergeApply.merge]]. If the window's from-snapshot has been
  * vacuumed from the source, the refresh falls back to a full recompute
  * (with stale-key tombstoning), so the view self-heals rather than
  * wedging — size the source's `vacuum(keepSnapshots=…)` to the refresh
  * cadence to stay on the incremental path. */
object AggView {

  /** Create-or-refresh the view `dst` over `src`'s current snapshot.
    *
    * @param sums  (columnName, expression-over-source-user-columns) pairs,
    *              each maintained as `sum(coalesce(expr, 0))`. Use
    *              integral expressions for bit-exact maintenance
    *              (floating-point addition is not associative).
    * @param app   txn-slot identity; one view table per `app`.
    * @param nBuckets bucket count when this call creates the view table
    *              (default: the source's — one row per conversation needs
    *              no more).
    * @param cfg   merge tuning for the view writes; `txnApp` must be
    *              empty (the view owns its slot).
    * @param asOf  pin the refresh target to a source snapshot version
    *              instead of the latest — refresh-to-a-consistent-cut,
    *              and the lever replay harnesses use to exercise many
    *              incremental rounds over one committed history. */
  def refresh(src: LakeTable, dst: LakeTable,
      sums: Seq[(String, Column)] = Nil,
      app: String = "aggview",
      nBuckets: Int = -1,
      cfg: MergeConfig = MergeConfig(),
      asOf: Option[Long] = None): AggViewResult = {
    require(cfg.txnApp.isEmpty,
      "AggView tracks the consumed source version in its own txn slot; " +
        "pass the writer identity via `app`, not cfg.txnApp")
    val mcfg = cfg.copy(txnApp = Some(app))
    val srcSnap = asOf.map(src.snapshotAt).getOrElse(src.snapshot)
    val toV = srcSnap.version
    val fp = sumsFingerprint(sums)
    if (!dst.exists) {
      val proto = viewRows(src.readBuckets(Set.empty), sums, toV)
      dst.create(StructType(proto.schema.fields.filterNot(f =>
        f.name == "lsn" || f.name == "op")),
        if (nBuckets > 0) nBuckets else srcSnap.nBuckets,
        properties = Map(SumsProp -> fp),
        columnDocs = Map(
          "n_turns" -> "live turns in the conversation (AggView-maintained)"))
    } else dst.snapshot.properties.get(SumsProp) match {
      // redefining an expression under an unchanged column name would
      // otherwise add deltas of the NEW expression to stored sums of the
      // OLD one — a silent mixture equal to neither definition. The
      // defining expressions are stamped on create and must match on
      // every refresh; changing a definition means a new view table (or
      // dropping the old one).
      case Some(have) => require(have == fp,
        s"view ${dst.dir} was created with sums [$have], this refresh " +
          s"passes [$fp] - incremental maintenance over a changed " +
          "definition silently corrupts; recreate the view to redefine")
      case None => dst.setProperty(SumsProp, fp): Unit // legacy: stamp now
    }
    val lastV = dst.snapshot.txns.get(app).map(_.batch)
    lastV match {
      case Some(v) if v >= toV =>
        AggViewResult(applied = false, "noop", v, v, 0L, None)
      case Some(v) =>
        try incremental(src, dst, sums, v, toV, mcfg)
        catch {
          // the from-snapshot (or its data files, mid-job) was vacuumed
          // out from under the window — self-heal with a recompute rather
          // than wedging the view. Executor-side misses surface wrapped
          // in SparkException, hence the cause-chain walk.
          case e: Exception if fnfInChain(e) =>
            full(src, dst, sums, v, toV, mcfg)
        }
      case None => full(src, dst, sums, -1L, toV, mcfg)
    }
  }

  /** Table property holding the view's defining (name, expression) list —
    * the guard against silently refreshing with changed definitions. */
  private val SumsProp = "graft.aggview.sums"

  /** Length-prefixed encoding — injective regardless of ':' or '; ' in
    * names/renderings (a plain join could let two different definitions
    * collide across a shifted separator). Note the rendering is
    * Column.toString: rebuild the SAME definition the same way (e.g.
    * always `col("x") * 2`, not sometimes `expr("x * 2")`) — two
    * renderings of one logical expression read as a changed definition,
    * which fails safe (a require, never corruption). */
  private def sumsFingerprint(sums: Seq[(String, Column)]): String =
    sums.map { case (n, c) =>
      val r = c.toString
      s"${n.length}:$n=${r.length}:$r"
    }.mkString("; ")

  private def fnfInChain(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
      .exists(_.isInstanceOf[FileNotFoundException])

  /** Null contributions count as 0 in both maintenance paths. */
  private def z(c: Column): Column = coalesce(c, lit(0L))

  /** The view's defining aggregate over a source-state frame. */
  private def aggState(state: DataFrame,
      sums: Seq[(String, Column)]): DataFrame =
    state.groupBy(col("conv_id")).agg(
      count(lit(1)).as("n_turns"),
      sums.map { case (n, c) => sum(z(c)).as(n) }: _*)

  /** Recomputed state as merge-envelope upsert rows. */
  private def viewRows(state: DataFrame, sums: Seq[(String, Column)],
      toV: Long): DataFrame =
    aggState(state, sums).select(
      lit(toV).as("lsn") +: lit("U").as("op") +:
        col("conv_id") +: lit(0).cast(IntegerType).as("turn_idx") +:
        col("n_turns") +: sums.map { case (n, _) => col(n) }: _*)

  /** Full recompute: bootstrap, and the vacuumed-window fallback. Keys in
    * the view but absent from the fresh state are tombstoned (conversations
    * fully deleted while the view was offline). */
  private def full(src: LakeTable, dst: LakeTable,
      sums: Seq[(String, Column)], fromV: Long, toV: Long,
      mcfg: MergeConfig): AggViewResult = {
    // persist: the full-source aggregate feeds the batch TWICE (its own
    // upsert rows + the stale-key anti-join) and merge runs more than
    // one action over the batch — without it the source scan+aggregate
    // would re-execute up to 4x per full refresh
    val fresh = viewRows(src.read(asOf = Some(toV)), sums, toV).persist()
    try {
      val viewSchema = dst.snapshot.userSchema
      val stale = dst.read()
        .join(fresh.select("conv_id"), Seq("conv_id"), "left_anti")
        .select(
          lit(toV).as("lsn") +: lit("D").as("op") +:
            col("conv_id") +: lit(0).cast(IntegerType).as("turn_idx") +:
            viewSchema.fields.filter(f =>
              f.name != "conv_id" && f.name != "turn_idx")
              .map(f => lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
      val res = MergeApply.merge(dst, fresh.unionByName(stale), toV, mcfg)
      AggViewResult(res.applied, "full", fromV, toV, res.rowsInBatch, Some(res))
    } finally fresh.unpersist()
  }

  /** Change-feed maintenance: signed per-key deltas, old values from a
    * bucket-pruned view read, one MERGE. */
  private def incremental(src: LakeTable, dst: LakeTable,
      sums: Seq[(String, Column)], fromV: Long, toV: Long,
      mcfg: MergeConfig): AggViewResult = {
    val feed = src.changeFeed(fromV, Some(toV))
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val delta = feed.groupBy(col("conv_id")).agg(
      sum(sign).as("__d_turns"),
      sums.map { case (n, c) => sum(sign * z(c)).as(s"__d_$n") }: _*)
    // keys whose net contribution is zero across every aggregate (e.g. a
    // text edit that left the token count unchanged) skip the rewrite
    val moved = (col("__d_turns") =!= lit(0L)) +:
      sums.map { case (n, _) => z(col(s"__d_$n")) =!= lit(0L) }
    val changed = delta.filter(moved.reduce(_ || _)).persist()
    try {
      // ONE pinned view snapshot feeds both the bucket-id computation and
      // the pruned read: resolving them from two unpinned reads races a
      // concurrent rebucket of the view — ids computed in the old bucket
      // space, pruning applied in the new one, changed keys' old rows
      // silently excluded and their aggregates overwritten by bare deltas
      val dstSnap = dst.snapshot
      val nB = dstSnap.nBuckets
      // bounded by the view's bucket count (config, not data)
      val buckets = changed
        .select(LakeTable.bucketExpr(nB).as("b")).distinct()
        .collect().map(_.getInt(0)).toSet
      val old = dst.readBuckets(buckets, asOf = Some(dstSnap.version))
      val joined = changed.join(old, Seq("conv_id"), "left")
      val newTurns = z(col("n_turns")) + col("__d_turns")
      val batch = joined.select(
        lit(toV).as("lsn") +:
          when(newTurns === lit(0L), lit("D")).otherwise(lit("U")).as("op") +:
          col("conv_id") +: lit(0).cast(IntegerType).as("turn_idx") +:
          newTurns.as("n_turns") +:
          sums.map { case (n, _) => (z(col(n)) + col(s"__d_$n")).as(n) }: _*)
      val res = MergeApply.merge(dst, batch, toV, mcfg)
      AggViewResult(res.applied, "incremental", fromV, toV,
        res.rowsInBatch, Some(res))
    } finally changed.unpersist()
  }
}
