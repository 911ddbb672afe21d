package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamShim, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.lake.{LakeTable, Snapshot}

/** Streaming offset into a lake table's change history: the snapshot
  * version paired with that snapshot's high LSN. The LSN is the cut (the
  * table's total modification order); the version pins `getBatch`'s scan
  * to one immutable snapshot, so a replayed range always reproduces the
  * same rows regardless of later commits. Equality is json-based (the
  * Offset contract), so the json must stay byte-deterministic. */
final case class GraftOffset(version: Long, lsn: Long) extends V1Offset {
  override def json: String = s"""{"version":$version,"lsn":$lsn}"""
}

object GraftOffset {
  private val Re = """\{"version":(-?\d+),"lsn":(-?\d+)\}""".r

  /** Accept this source's own offsets or checkpoint-restored
    * `SerializedOffset`s — anything whose json this source wrote. */
  def parse(o: org.apache.spark.sql.connector.read.streaming.Offset): GraftOffset =
    o match {
      case g: GraftOffset => g
      case other => other.json match {
        case Re(v, l) => GraftOffset(v.toLong, l.toLong)
        case j => throw new IllegalArgumentException(
          s"not a graft-table offset: $j")
      }
    }
}

/** `spark.readStream.format("graft-table").option("path", dir).load()` —
  * tail a lake table as a Structured Streaming source (the
  * downstream-consumption half of CDC as a first-class stream, the
  * surface Delta calls Change Data Feed). Each micro-batch is
  * [[LakeTable.readSince]] between two offsets' LSN cuts, pinned to the
  * end offset's snapshot: every key whose winning version landed in the
  * range, tombstones included (`op = "D"`), manifest-pruned to O(new
  * data). Emitted columns are the merge-ready change envelope (user
  * columns + `lsn` + `op`), so `foreachBatch` + [[graft.cdc.MergeApply]]
  * gives exactly-once table-to-table replication: the streaming
  * checkpoint replays offset ranges at-least-once, version-pinned
  * `getBatch` makes replays byte-identical, and the destination's epoch
  * guard makes them no-ops.
  *
  * Operational contract (same as Iceberg/Delta streaming reads):
  *  - vacuum retention bounds restartability — a checkpointed end
  *    version that has been expired fails `snapshotAt` with a clear
  *    error; keep `vacuumKeepSnapshots` above the worst-case downtime.
  *  - schema is fixed at stream start; if the table evolves mid-stream
  *    the source fails fast (restart picks up the new schema) rather
  *    than silently dropping or miscasting the new columns. Ranges
  *    pinned to PRE-evolution snapshots (a restart's replay of its last
  *    committed batch) align up losslessly — null-filled added columns,
  *    upcast widened ones — so evolution never wedges a checkpoint.
  *  - `.option("startingLsn", n | "latest")` starts a fresh checkpoint
  *    after the given cut instead of bootstrapping the full table;
  *    "latest" is resolved once and frozen in the stream's metadata
  *    directory so restarts keep the same cut.
  *  - a `followOnce`-driven table uses source LSNs as epoch ids; this
  *    source uses Spark's own micro-batch ids — don't mix the two sync
  *    mechanisms on one destination table.
  *  - `.option("maxLsnsPerTrigger", n)` caps the LSN range per
  *    micro-batch (≈ an event cap for dense LSNs): a from-scratch
  *    bootstrap of a 10^10-event table arrives as bounded batches, not
  *    one table-sized one. Batches under a cut skip keys whose winner
  *    lies beyond it; the later batch covering the winner delivers them
  *    — the LWW composition reaches the identical final state.
  */
class LakeTableSource(sqlContext: SQLContext, tableDir: String,
    maxLsnsPerTrigger: Option[Long] = None,
    startingLsn: Option[Long] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  private val table = LakeTable.load(sqlContext.sparkSession, tableDir)
  private val startSchema: StructType = table.snapshot.userSchema

  override val schema: StructType = LakeTableSourceProvider.changeSchema(startSchema)

  /** Latest end offset handed out or consumed — only the legacy
    * [[getOffset]] path needs it (the engine replays the last committed
    * range through `getBatch` on restart, re-seating this cursor); the
    * admission-control path receives its start offset explicitly. Kept
    * as a full offset so a metadata-only commit (new version, same LSN)
    * re-serves the SAME json and never looks like new data. */
  @volatile private var lastKnown: Option[GraftOffset] = None

  /** Target frozen by [[prepareForTriggerAvailableNow]]: an AvailableNow
    * run drains up to here in rate-limited batches and then STOPS, even
    * while writers keep committing. Outer None = not prepared (tail
    * mode, chase the live high); Some(None) = prepared on an empty
    * table — drain nothing and stop, do NOT fall back to chasing. */
  @volatile private var preparedTarget: Option[Option[GraftOffset]] = None

  private def liveTarget(): Option[GraftOffset] = {
    val snap = table.snapshot
    val high = table.highLsn(snap) // manifest stats only — no Spark job
    if (high < 0) None else Some(GraftOffset(snap.version, high))
  }

  override def prepareForTriggerAvailableNow(): Unit =
    preparedTarget = Some(liveTarget())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): OffsetV2 = liveTarget().orNull

  /** The engine's offset negotiation (it prefers this over the legacy
    * [[getOffset]] because the source declares admission control, and —
    * crucially — uses the source NATIVELY under Trigger.AvailableNow
    * instead of wrapping it in a one-shot-getOffset wrapper that would
    * freeze a rate-limited cut as the final target).
    *
    * Rate limit: cap the LSN range per micro-batch (≈ an event cap for
    * dense LSNs) so a from-scratch bootstrap or a long catch-up becomes
    * a sequence of bounded batches instead of one table-sized one. The
    * cut stays pinned to the target's snapshot; a key whose winner lies
    * beyond the cut is simply delivered in the later batch that covers
    * the winner — LWW composition converges to the same final state.
    * Returning `start` verbatim (json-equal) signals no new data, so
    * metadata-only commits never trigger micro-batches. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val target = preparedTarget.getOrElse(liveTarget()).getOrElse(return start)
    // a fresh stream (no checkpointed start) begins at startingLsn when
    // given — attach-without-bootstrap, Delta's startingVersion analog;
    // "latest" resolved at source creation. Default -1 = full copy.
    val from = Option(start).map(GraftOffset.parse(_).lsn)
      .orElse(startingLsn).getOrElse(-1L)
    if (target.lsn <= from)
      // quiet fresh stream with a startingLsn: hand the engine the cut
      // itself as the first (empty) offset, so the checkpoint RECORDS
      // the starting point — otherwise a restart re-resolves "latest"
      // and silently skips everything committed in between
      return if (start == null && startingLsn.isDefined)
        GraftOffset(target.version, from)
      else start
    val cut = maxLsnsPerTrigger.fold(target.lsn)(m =>
      math.min(target.lsn, from + m))
    GraftOffset(target.version, cut)
  }

  /** Legacy DSv1 negotiation — kept correct for direct users of the
    * Source API; the engine itself routes through [[latestOffset]]. The
    * start handed to [[latestOffset]] is the cached last end offset
    * VERBATIM, so a quiescent table (including metadata-only version
    * bumps) re-serves identical json and triggers nothing. */
  override def getOffset: Option[V1Offset] = {
    val o = Option(latestOffset(lastKnown.orNull, getDefaultReadLimit))
      .map(GraftOffset.parse)
    lastKnown = o.orElse(lastKnown)
    o
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endO = GraftOffset.parse(end)
    if (lastKnown.forall(_.lsn < endO.lsn)) lastKnown = Some(endO)
    val fromLsn = start.map(GraftOffset.parse(_).lsn)
      .orElse(startingLsn).getOrElse(-1L)
    val snap = table.snapshotAt(endO.version)
    val changes = table.readSince(fromLsn, asOf = Some(endO.version))
      // the rate-limit cut (and, unlimited, a guard for files registered
      // without LSN stats): under maxLsnsPerTrigger the end offset's LSN
      // sits BELOW the pinned snapshot's high, and a key whose winner
      // lies beyond the cut is deferred to the batch that covers it
      .filter(col("__lsn") <= endO.lsn)
      .withColumnRenamed("__lsn", "lsn")
      .withColumnRenamed("__op", "op")
    GraftStreamShim.asStreamingBatch(alignToStart(changes, snap))
  }

  /** Project a pinned-snapshot batch into the stream's declared schema.
    *
    * A restart replays the last committed range against its OLD end
    * snapshot while the stream has already adopted the table's current
    * schema — that older schema is by construction an ancestor of the
    * declared one (evolution only adds and widens), so the batch aligns
    * losslessly: missing columns null-fill, narrower types upcast. The
    * reverse direction — the end snapshot evolved BEYOND the declared
    * schema, i.e. the table changed under a running stream — cannot be
    * delivered without dropping or down-casting columns, so it fails
    * fast and a restart adopts the new schema. */
  private def alignToStart(changes: DataFrame, snap: Snapshot): DataFrame = {
    val have = snap.userSchema
    val ancestor = have == startSchema || have.fields.forall(f =>
      startSchema.fields.find(_.name == f.name).exists(g =>
        LakeTable.canWiden(f.dataType, g.dataType)))
    if (!ancestor)
      throw new IllegalStateException(
        s"table $tableDir schema evolved under a running stream " +
          s"(started with ${startSchema.simpleString}, pinned snapshot " +
          s"has ${have.simpleString}); restart the stream to adopt it")
    // the projection itself is the table's standard align (null-fill +
    // upcast + order); the ancestor check above is what makes it lossless
    LakeTable.align(changes, schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"LakeTableSource[$tableDir]"
}

/** `df.writeStream.format("graft-table").option("path", dir).start()` —
  * the sink half: every micro-batch lands through the engine's
  * epoch-guarded MERGE (method `upsert`, default) or blind append
  * (`insert`), exactly like [[graft.cdc.CdcPipeline]]'s foreachBatch but
  * without writing one. Spark's micro-batch id is the epoch id, so
  * checkpoint redelivery is a no-op — exactly-once end to end; chaining
  * a `graft-table` source into a `graft-table` sink is complete
  * table-to-table replication in one `readStream → writeStream` line.
  * The batch must carry the change envelope (`lsn`, `op`, key/payload
  * columns) — which is exactly what the source emits. */
class LakeTableSink(sqlContext: SQLContext, tableDir: String,
    method: String, cfg: graft.cdc.MergeConfig)
    extends org.apache.spark.sql.execution.streaming.Sink {

  private val table = LakeTable.load(sqlContext.sparkSession, tableDir)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine hands a streaming-flagged frame; merge runs batch-only
    // operations (observe) on it — re-plan as a plain batch first
    val b = GraftStreamShim.asPlainBatch(data)
    if (method == "insert") graft.cdc.MergeApply.append(table, b, batchId, cfg)
    else graft.cdc.MergeApply.merge(table, b, batchId, cfg)
    ()
  }

  override def toString: String = s"LakeTableSink[$tableDir]"
}

/** Registers short name `graft-table` (META-INF/services). */
class LakeTableSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def dir(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      """graft-table requires .option("path", <table dir>)"""))

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-table manages its own bucket layout; partitionBy is not supported")
    require(outputMode != org.apache.spark.sql.streaming.OutputMode.Complete(),
      "graft-table is an incremental upsert sink; Complete mode is not supported")
    val d = dir(parameters)
    require(LakeTable.load(sqlContext.sparkSession, d).exists,
      s"no lake table at $d — create it first (LakeTable.createTable)")
    val method = parameters.getOrElse("method", "upsert")
    require(method == "upsert" || method == "insert",
      s"method must be upsert or insert, got '$method'")
    val mode = parameters.getOrElse("writeMode", "mor")
    require(mode == "mor" || mode == "cow",
      s"writeMode must be mor or cow, got '$mode'")
    // writer identity for app-scoped idempotence (Delta's txnAppId): the
    // sink's batch ids start at 0 per checkpoint, so they must live in
    // their own txn slot — in the GLOBAL epoch space they would collide
    // with epochs other writers already committed (a seeded or
    // previously-followed destination) and SILENTLY no-op every batch.
    // That failure mode is why a missing identity is a hard error, not a
    // fallback: the checkpoint location canonicalized through its
    // filesystem ('ckpt' / '/abs/ckpt' / 'file:/abs/ckpt' agree) is the
    // stream's stable identity; txnAppId overrides it; and a table this
    // stream EXCLUSIVELY owns may opt into the global space explicitly
    // with globalEpochSpace=true — a dedicated boolean, NOT a sentinel
    // value inside the txnAppId namespace, where a user innocently
    // naming their app "global" would lose the slot. (A session-conf
    // checkpoint resolves after createSink and is invisible here — pass
    // it as a writer option.)
    // FOOTGUN (same as Delta's documented txnAppId contract): the slot
    // outlives the checkpoint — deleting the checkpoint to force a
    // re-sync restarts batch ids at 0 under the SAME identity, and the
    // old slot no-ops them. Pass a NEW txnAppId after deleting a
    // checkpoint.
    val txnApp =
      if (parameters.get("globalEpochSpace").exists(_.toBoolean)) None
      else Some(parameters.get("txnAppId")
        .orElse(parameters.get("checkpointLocation").map { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(
            sqlContext.sparkSession.sessionState.newHadoopConf())
          "ckpt:" + fs.makeQualified(hp).toString
        })
        .getOrElse(throw new IllegalArgumentException(
          "graft-table sink needs a writer identity: pass " +
            "checkpointLocation as a WRITER option (a session-conf " +
            "checkpoint is invisible here), or set .option(\"txnAppId\", " +
            "<stable id>); a table this stream exclusively owns may opt " +
            "into the global epoch space with " +
            ".option(\"globalEpochSpace\", \"true\")")))
    new LakeTableSink(sqlContext, d, method,
      graft.cdc.MergeConfig(writeMode = mode, txnApp = txnApp))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-table derives its schema from the table")
    val user = LakeTable.load(sqlContext.sparkSession, dir(parameters))
      .snapshot.userSchema
    (shortName(), LakeTableSourceProvider.changeSchema(user))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val limit = parameters.get("maxLsnsPerTrigger").map(_.toLong)
    require(limit.forall(_ > 0), "maxLsnsPerTrigger must be positive")
    // startingLsn: first batch of a FRESH checkpoint starts after this
    // cut instead of bootstrapping the full table; "latest" = tail only
    // changes committed from now on. The resolved value is PERSISTED in
    // the stream's metadata directory: batch 0's start offset is always
    // None in the checkpoint, so replay determinism requires the same
    // resolved cut on every restart — re-resolving "latest" against the
    // live table would silently skip everything committed while batch 0
    // sat unfinished in the offset log.
    val startLsn = parameters.get("startingLsn").map {
      case "latest" => resolvedLatest(sqlContext, metadataPath, dir(parameters))
      case n => n.toLong
    }
    new LakeTableSource(sqlContext, dir(parameters), limit, startLsn)
  }

  /** Resolve `startingLsn=latest` exactly once per stream: first call
    * writes the live high LSN under the stream's metadata path
    * (create-if-absent = the arbiter); every later call — including
    * after a restart — reads that value back. Direct Source-API users
    * with no metadata path get a live resolve (single-instance use). */
  private def resolvedLatest(sqlContext: SQLContext, metadataPath: String,
      tableDir: String): Long = {
    def live: Long = {
      val t = LakeTable.load(sqlContext.sparkSession, tableDir)
      t.highLsn(t.snapshot)
    }
    if (metadataPath == null || metadataPath.isEmpty) return live
    val p = new org.apache.hadoop.fs.Path(metadataPath, "graft-starting-lsn")
    val fs = p.getFileSystem(
      sqlContext.sparkSession.sessionState.newHadoopConf())
    def read(): Long = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
    if (fs.exists(p)) return read()
    val v = live
    // atomic publish, two phases: (1) the value lands COMPLETE in a temp
    // file — a create-then-write under the final name could be killed
    // mid-write and leave a torn file that wedges every restart; (2) the
    // temp enters under the final name through an arbiter that REFUSES
    // an existing destination — local rename(2) silently replaces, so on
    // the local fs the arbiter is an atomic hard link (EEXIST = lost the
    // race); HDFS-like stores get rename, which fails on an existing
    // destination there. Either way the loser defers to the winner's
    // complete value, and the temp is reclaimed on every exit path.
    val tmp = new org.apache.hadoop.fs.Path(metadataPath,
      s"graft-starting-lsn.tmp-${java.util.UUID.randomUUID()}")
    fs.mkdirs(p.getParent)
    val local = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    try {
      if (local) {
        val tmpNio = java.nio.file.Paths.get(tmp.toUri.getPath)
        java.nio.file.Files.write(tmpNio, v.toString.getBytes("UTF-8"))
        try { java.nio.file.Files.createLink(
          java.nio.file.Paths.get(p.toUri.getPath), tmpNio); v }
        catch { case _: java.nio.file.FileAlreadyExistsException => read() }
      } else {
        val out = fs.create(tmp, true)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
        if (fs.rename(tmp, p)) v else read()
      }
    } finally { try fs.delete(tmp, false) catch { case _: java.io.IOException => () } }
  }
}

object LakeTableSourceProvider {
  /** The change envelope: user columns + (`lsn`, `op`) — the column
    * contract [[graft.cdc.MergeApply.merge]] consumes directly. */
  def changeSchema(user: StructType): StructType =
    StructType(user.fields.toSeq :+
      StructField("lsn", LongType, nullable = false) :+
      StructField("op", StringType, nullable = false))
}
