package graft.lake

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** One data file registered in a snapshot. `bucket` is the hash-bucket of
  * `conv_id` the file belongs to (all rows in the file share it) — the unit
  * of copy-on-write pruning. `schemaVersion` names the schema the file was
  * written under (schema evolution never rewrites old files). `kind` is
  * "base" (one version per key within the bucket) or "delta" (a
  * merge-on-read increment: the key's winning version is resolved at read
  * time by LWW over all of the bucket's files, until compaction folds the
  * deltas back into a base file). */
final case class DataFileEntry(
    path: String,
    bucket: Int,
    rows: Long,
    schemaVersion: Int,
    kind: String = "base")

/** Per-commit lineage record (north rule: "per-partition lineage rows —
  * source offset range, rows applied, watermark"). The reference's analog
  * is the per-run status row (reference:
  * engine/wprdc_etl/pipeline/status.py:1-50, scripts.py:56-68). */
final case class LineageEntry(
    epochId: Long,
    version: Long,
    rowsInBatch: Long,
    rowsApplied: Long,
    bucketsTouched: Seq[Int],
    filesRewritten: Int,
    filesCarried: Int,
    maxLsn: Long,
    watermarkTs: String,
    durationMs: Long,
    /** Events in this batch whose `ts` was below the previous commit's
      * watermark — the late-data signal a deployment would alarm on
      * (watermark semantics without discarding: CDC must apply late
      * events; LWW ordering is by LSN, not ts). */
    lateEvents: Long = 0L,
    /** Low end of the batch's LSN range — with [[maxLsn]] this is the
      * "source offset range" the north rule asks lineage to carry
      * (-1 when not computed, e.g. blind appends / compactions). */
    minLsn: Long = -1L)

/** An immutable snapshot of the table: schema history, file manifest,
  * committed-epoch map (exactly-once guard) and lineage log. Serialized as
  * `_snapshots/v%012d.json`; `_snapshots/CURRENT` points at the live one. */
final case class Snapshot(
    version: Long,
    nBuckets: Int,
    currentSchemaVersion: Int,
    // schemaVersion -> StructType.json (user-facing schema; the on-disk
    // files additionally carry __lsn/__op meta columns)
    schemas: Map[String, String],
    // column-level metadata preserved across schema changes — the analog of
    // the reference's "data dictionary" stash/restore
    // (reference: engine/etl_util.py:87-115, 630-664)
    columnDocs: Map[String, String],
    files: Seq[DataFileEntry],
    // epochId -> version that committed it (idempotent-commit guard,
    // mirroring the input-checksum duplicate-run suppression at
    // reference: engine/wprdc_etl/pipeline/pipeline.py:338-341)
    committedEpochs: Map[String, Long],
    lineage: Seq[LineageEntry],
    properties: Map[String, String]) {

  def userSchema: StructType =
    DataType.fromJson(schemas(currentSchemaVersion.toString)).asInstanceOf[StructType]
  def schemaAt(v: Int): StructType =
    DataType.fromJson(schemas(v.toString)).asInstanceOf[StructType]
  def isCommitted(epochId: Long): Boolean =
    committedEpochs.contains(epochId.toString)
}

/** A from-scratch snapshot-log lake table (SURVEY.md §7.0/§7.1 item 3):
  * Parquet data files + a JSON snapshot log with atomic commits. This is
  * the Iceberg-shaped core the sandbox forces us to build ourselves (no
  * Iceberg/Delta jar is available offline). Guarantees:
  *
  *   - **Atomic commit**: a snapshot file `vN.json` is created with
  *     overwrite=false (optimistic concurrency: a second writer racing on N
  *     fails), then the `CURRENT` pointer is swapped with an atomic rename.
  *     Readers only ever see a fully-written snapshot.
  *   - **Epoch idempotence**: each commit records its `epochId`; replaying
  *     a committed epoch is a no-op (exactly-once sink on top of
  *     at-least-once delivery).
  *   - **Copy-on-write at bucket granularity**: `conv_id` is hash-bucketed
  *     into `nBuckets`; a merge rewrites only files of touched buckets and
  *     carries the rest over by reference. At 100 TB / 4096 buckets a batch
  *     touching k buckets rewrites ~k/4096 of the data, not all of it.
  *   - **Schema evolution without rewrite**: add-column and type widening
  *     bump `currentSchemaVersion`; old files keep their version and are
  *     projected (null-fill / upcast) at read time. Column docs survive —
  *     no destructive clear (contrast reference `migrate_schema`,
  *     reference: engine/etl_util.py:630-664).
  *
  * On-disk meta columns: `__lsn` (long, LWW tiebreaker across batches) and
  * `__op` (`U` upsert / `D` tombstone). Tombstones are retained so a
  * late-arriving lower-LSN update cannot resurrect a deleted key; user
  * reads filter them out.
  */
class LakeTable(val spark: SparkSession, val dir: String) {
  import LakeTable._

  private val tablePath = new Path(dir)
  private val snapsPath = new Path(tablePath, "_snapshots")
  private val currentPtr = new Path(snapsPath, "CURRENT")
  private def fs: FileSystem =
    tablePath.getFileSystem(spark.sessionState.newHadoopConf())

  // ----------------------------------------------------------------- state

  def exists: Boolean = fs.exists(currentPtr)

  def snapshot: Snapshot = {
    val in = fs.open(currentPtr)
    val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    readSnapshot(new Path(snapsPath, name))
  }

  def snapshotAt(version: Long): Snapshot =
    readSnapshot(new Path(snapsPath, f"v$version%012d.json"))

  private def readSnapshot(p: Path): Snapshot = {
    implicit val fmt: Formats = DefaultFormats
    val in = fs.open(p)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    JsonMethods.parse(s).extract[Snapshot]
  }

  // --------------------------------------------------------------- create

  /** Create the table (≈ datastore_create,
    * reference: engine/wprdc_etl/pipeline/loaders.py:387-438). */
  def create(schema: StructType, nBuckets: Int,
      columnDocs: Map[String, String] = Map.empty,
      properties: Map[String, String] = Map.empty): LakeTable = {
    require(!exists, s"table already exists at $dir")
    fs.mkdirs(snapsPath)
    fs.mkdirs(new Path(tablePath, "data"))
    val snap = Snapshot(
      version = 0L, nBuckets = nBuckets, currentSchemaVersion = 0,
      schemas = Map("0" -> schema.json), columnDocs = columnDocs,
      files = Nil, committedEpochs = Map.empty, lineage = Nil,
      properties = properties)
    writeSnapshot(snap)
    this
  }

  // --------------------------------------------------------------- commit

  /** Atomically publish a new snapshot. Fails if `snap.version` was already
    * committed by someone else (optimistic concurrency). */
  private[graft] def writeSnapshot(snap: Snapshot): Unit = {
    implicit val fmt: Formats = DefaultFormats
    val p = new Path(snapsPath, f"v${snap.version}%012d.json")
    // overwrite=false → atomic create-if-absent (the commit race arbiter)
    val out = fs.create(p, false)
    try out.write(Serialization.write(snap).getBytes("UTF-8"))
    finally out.close()
    val tmp = new Path(snapsPath, s".CURRENT.tmp.${snap.version}")
    val t = fs.create(tmp, true)
    try t.write(p.getName.getBytes("UTF-8")) finally t.close()
    // FileContext.rename supports atomic overwrite (FileSystem's doesn't)
    val fc = FileContext.getFileContext(tablePath.toUri,
      spark.sessionState.newHadoopConf())
    fc.rename(tmp, currentPtr, Options.Rename.OVERWRITE)
  }

  /** Commit a new file manifest. `replacedBuckets` files are dropped from
    * the manifest (their storage is GC-able, not eagerly deleted — old
    * snapshots remain readable = time travel). */
  private[graft] def commit(
      base: Snapshot,
      newFiles: Seq[DataFileEntry],
      replacedBuckets: Set[Int],
      epochId: Option[Long],
      lineage: Option[LineageEntry],
      schemaUpdate: Option[(Int, StructType)] = None,
      newColumnDocs: Map[String, String] = Map.empty): Snapshot = {
    val carried = base.files.filterNot(f => replacedBuckets.contains(f.bucket))
    val snap = base.copy(
      version = base.version + 1,
      files = carried ++ newFiles,
      committedEpochs = base.committedEpochs ++
        epochId.map(e => e.toString -> (base.version + 1)).toMap,
      lineage = (base.lineage ++ lineage.map(_.copy(version = base.version + 1)))
        .takeRight(maxLineageInSnapshot),
      currentSchemaVersion =
        schemaUpdate.map(_._1).getOrElse(base.currentSchemaVersion),
      schemas = base.schemas ++
        schemaUpdate.map { case (v, s) => v.toString -> s.json }.toMap,
      columnDocs = base.columnDocs ++ newColumnDocs)
    writeSnapshot(snap)
    lineage.foreach(writeLineageMirror(_, snap.version))
    snap
  }

  /** Append the commit's lineage row to the `_lineage` mirror table as a
    * single JSON-lines file named by snapshot version — idempotent under
    * replay (same version -> same name, create-if-absent). */
  private def writeLineageMirror(entry: LineageEntry, version: Long): Unit = {
    implicit val fmt: Formats = DefaultFormats
    val dir = new Path(tablePath, "_lineage")
    val p = new Path(dir, f"v$version%012d.json")
    try {
      fs.mkdirs(dir)
      val out = fs.create(p, false)
      try out.write(
        (Serialization.write(entry.copy(version = version)) + "\n")
          .getBytes("UTF-8"))
      finally out.close()
    } catch { case _: java.io.IOException => () /* already written */ }
  }

  // ----------------------------------------------------------------- read

  /** Raw read (meta columns retained, tombstones retained), optionally
    * pruned to a bucket subset and a snapshot version. Files are read
    * grouped by schema version and projected to the current user schema
    * (+meta), so add-column / widening never rewrites data. */
  def readRaw(buckets: Option[Set[Int]] = None,
      asOf: Option[Long] = None): DataFrame = {
    val snap = asOf.map(snapshotAt).getOrElse(snapshot)
    val want = snap.userSchema
    val files = buckets match {
      case Some(bs) => snap.files.filter(f => bs.contains(f.bucket))
      case None => snap.files
    }
    if (files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        withMeta(want))
    } else {
      files.groupBy(_.schemaVersion).map { case (sv, fgroup) =>
        val fileSchema = withMeta(snap.schemaAt(sv))
        val df = spark.read.schema(fileSchema).parquet(fgroup.map(_.path): _*)
        align(df, withMeta(want))
      }.reduce(_ unionByName _)
    }
  }

  /** LWW-resolve a raw frame that may hold several versions per key
    * (merge-on-read deltas): keep the max-__lsn row per (conv_id,
    * turn_idx). Shuffle shape: ONE exchange to the table's bucket
    * layout, sort within partition, lag-window under the bucket
    * partitioning — a key group can never span buckets, and bucket-sized
    * window partitions avoid the millions of tiny per-key groups a
    * key-partitioned window would create at scale. */
  private def lwwResolve(raw: DataFrame, nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.functions.{lag, struct}
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b"))
      .orderBy(col("conv_id").asc, col("turn_idx").asc, col("__lsn").desc)
    val k = struct(col("conv_id"), col("turn_idx"))
    raw.withColumn("__b", LakeTable.bucketExpr(nBuckets))
      .repartition(col("__b"))
      .withColumn("__prev", lag(k, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= k)
      .drop("__b", "__prev")
  }

  /** User-facing read: merge-on-read resolution (skipped when the
    * snapshot holds no delta files), tombstones filtered, meta columns
    * dropped. */
  def read(asOf: Option[Long] = None): DataFrame = {
    val snap = asOf.map(snapshotAt).getOrElse(snapshot)
    val raw = readRaw(None, asOf)
    val resolved =
      if (snap.files.exists(_.kind == "delta")) lwwResolve(raw, snap.nBuckets)
      else raw
    resolved
      .filter(col("__op") =!= lit("D"))
      .select(snap.userSchema.fieldNames.map(col).toSeq: _*)
  }

  def lineage: Seq[LineageEntry] = snapshot.lineage

  def lineageDF: DataFrame = {
    import spark.implicits._
    spark.createDataset(snapshot.lineage).toDF()
  }

  /** The lineage MIRROR table: one JSON-lines row per commit under
    * `_lineage/`, written by [[commit]] at zero per-epoch Spark-job cost
    * (north rule: per-batch lineage rows + metrics emitted to a lineage
    * table). Unlike the in-snapshot log — which ages out at
    * [[LakeTable.maxLineageInSnapshot]] — the mirror is append-only and
    * complete, and queryable like any table. */
  def lineageTable: DataFrame =
    spark.read.schema(LakeTable.lineageSchema)
      .json(new Path(tablePath, "_lineage").toString)

  // ------------------------------------------------------------------ DDL

  /** Delete all rows, keep schema + column docs (≈ wipe_data,
    * reference: engine/wprdc_etl/pipeline/loaders.py:440-467). */
  def truncate(): Snapshot = {
    val base = snapshot
    commit(base, Nil, base.files.map(_.bucket).toSet, None, None)
  }

  /** Drop and recreate with a new schema (≈ clear_first,
    * reference: engine/wprdc_etl/pipeline/loaders.py:469-505). Column docs
    * are preserved for columns that still exist — the data-dictionary
    * restore (reference: engine/etl_util.py:87-115). */
  def replaceSchema(schema: StructType): Snapshot = {
    val base = snapshot
    val keptDocs = base.columnDocs.filter { case (c, _) =>
      schema.fieldNames.contains(c) }
    val v = base.currentSchemaVersion + 1
    val snap = base.copy(
      version = base.version + 1,
      files = Nil,
      currentSchemaVersion = v,
      schemas = base.schemas + (v.toString -> schema.json),
      columnDocs = keptDocs)
    writeSnapshot(snap)
    snap
  }

  /** Additive schema evolution: add a nullable column at the end. Old files
    * are projected with nulls at read. */
  def addColumn(name: String, dt: DataType, doc: String = null): Snapshot = {
    val base = snapshot
    require(!base.userSchema.fieldNames.contains(name), s"column $name exists")
    val v = base.currentSchemaVersion + 1
    val newSchema = StructType(base.userSchema.fields :+
      StructField(name, dt, nullable = true))
    commit(base, Nil, Set.empty, None, None,
      schemaUpdate = Some((v, newSchema)),
      newColumnDocs = Option(doc).map(name -> _).toMap)
  }

  /** Expire old snapshots and delete data files no snapshot references
    * anymore — the maintenance operation every snapshot-log table needs
    * at scale (COW/compaction replace files in the manifest but leave
    * the bytes for time travel; unbounded retention is unbounded
    * storage). Keeps the newest `keepSnapshots` versions (plus CURRENT);
    * any data file referenced only by older versions is deleted, then
    * the old `vN.json` files themselves. The `_lineage` mirror is never
    * touched (it is the permanent audit log). Returns
    * (snapshotsExpired, dataFilesDeleted). */
  def vacuum(keepSnapshots: Int = 1): (Int, Int) = {
    require(keepSnapshots >= 1, "must keep at least the current snapshot")
    val cur = snapshot
    val all = fs.listStatus(snapsPath).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted
    val keep = all.filter(v => v > cur.version - keepSnapshots || v == cur.version)
    val expire = all.filterNot(keep.contains)
    val live: Set[String] =
      keep.map(snapshotAt).flatMap(_.files.map(_.path)).toSet
    val dead = expire.map(snapshotAt).flatMap(_.files.map(_.path)).toSet -- live
    dead.foreach(p => fs.delete(new Path(p), false))
    expire.foreach(v => fs.delete(new Path(snapsPath, f"v$v%012d.json"), false))
    (expire.size, dead.size)
  }

  /** Type widening (int→long, float→double, …). Old files upcast at read. */
  def widenColumn(name: String, dt: DataType): Snapshot = {
    val base = snapshot
    val old = base.userSchema(name).dataType
    require(canWiden(old, dt), s"cannot widen $old -> $dt for $name")
    val v = base.currentSchemaVersion + 1
    val newSchema = StructType(base.userSchema.fields.map(f =>
      if (f.name == name) f.copy(dataType = dt) else f))
    commit(base, Nil, Set.empty, None, None, schemaUpdate = Some((v, newSchema)))
  }
}

object LakeTable {
  /** Lineage kept inline in the snapshot; older entries age out (a real
    * deployment would also mirror them to a lineage table — see
    * graft.cdc.CdcPipeline). */
  val maxLineageInSnapshot = 10000

  /** Explicit schema for the `_lineage` mirror (JSON-lines) so reads
    * never pay schema inference. */
  val lineageSchema: StructType = StructType(Seq(
    StructField("epochId", LongType), StructField("version", LongType),
    StructField("rowsInBatch", LongType), StructField("rowsApplied", LongType),
    StructField("bucketsTouched", ArrayType(IntegerType)),
    StructField("filesRewritten", IntegerType),
    StructField("filesCarried", IntegerType),
    StructField("maxLsn", LongType), StructField("watermarkTs", StringType),
    StructField("durationMs", LongType), StructField("lateEvents", LongType),
    StructField("minLsn", LongType)))

  def metaFields: Seq[StructField] = Seq(
    StructField("__lsn", LongType, nullable = false),
    StructField("__op", StringType, nullable = false))

  def withMeta(user: StructType): StructType =
    StructType(user.fields.toSeq ++ metaFields)

  /** Bucket of a conv_id: non-negative murmur3 hash mod nBuckets. Stable
    * across Spark versions within a deployment (documented contract). */
  def bucketExpr(nBuckets: Int) =
    pmod(hash(col("conv_id")), lit(nBuckets)).cast(IntegerType)

  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (IntegerType, LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (FloatType, DoubleType) => true
    case (IntegerType | LongType, DoubleType) => true
    case _ => false
  }

  /** Project `df` onto `target` schema: missing columns null-filled, type
    * mismatches upcast, column order normalized. */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val present = df.schema.fieldNames.toSet
    df.select(target.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  def load(spark: SparkSession, dir: String): LakeTable = new LakeTable(spark, dir)

  def createTable(spark: SparkSession, dir: String, schema: StructType,
      nBuckets: Int, columnDocs: Map[String, String] = Map.empty): LakeTable =
    new LakeTable(spark, dir).create(schema, nBuckets, columnDocs)
}
