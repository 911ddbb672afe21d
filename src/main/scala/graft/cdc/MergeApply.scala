package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{DataFileEntry, LakeTable, LineageEntry, Snapshot}
import graft.model.Schemas

/** Result of one merge attempt. */
final case class MergeResult(
    applied: Boolean,
    version: Long,
    rowsInBatch: Long,
    rowsApplied: Long,
    bucketsTouched: Seq[Int],
    durationMs: Long)

final case class MergeConfig(
    /** Target max rows per output file; buckets whose merged size exceeds
      * this are salted into multiple write tasks (skew defense). */
    maxRowsPerFile: Long = 4L * 1000 * 1000,
    /** Use a window (sort) for LWW instead of the max_by hash aggregate.
      * Kept for A/B verification; the aggregate is the scale path. */
    useWindowDedup: Boolean = false)

/** The MERGE kernel (SURVEY.md §4 item 1, §7.1 item 4): applies one
  * micro-batch of change events to a [[LakeTable]] as an idempotent,
  * copy-on-write upsert keyed on `(conv_id, turn_idx)`.
  *
  * Replaces the reference's server-side Postgres `datastore_upsert`
  * (reference: engine/wprdc_etl/pipeline/loaders.py:507-533) with a
  * distributed plan of built-in operators:
  *
  *  1. **LWW dedup** of the batch: keep the max-LSN event per key. Done as
  *     `max_by(struct(*), __lsn)` under `groupBy(key)` — a hash aggregate
  *     with map-side partial aggregation, so duplicate-heavy or hot-key
  *     batches collapse *before* the shuffle (a window sort — the textbook
  *     formulation — shuffles every row; the aggregate is semantically
  *     identical and strictly cheaper; both are implemented and tested
  *     equal).
  *  2. **Bucket pruning**: only the hash-buckets of `conv_id` present in
  *     the batch are read back; all other files carry over by reference.
  *  3. **Cross-batch LWW**: union current bucket contents (which retain
  *     `__lsn` and `D` tombstones) with the batch and re-apply max_by — so
  *     out-of-order delivery across batches resolves correctly, and a
  *     delete cannot be resurrected by a late lower-LSN update.
  *  4. **Salted write**: per-bucket output sizes are known *before* the
  *     write (manifest row counts + batch per-bucket counts), so hot
  *     buckets get extra write parallelism deterministically rather than
  *     reactively.
  *  5. **Idempotent commit**: the epoch guard makes redelivered epochs
  *     no-ops (exactly-once on top of at-least-once).
  */
object MergeApply {

  private val KEY = Schemas.keyCols

  /** Normalize a raw change-event frame to the on-disk layout: user
    * columns + `__lsn` + `__op` (I and U both become upsert `U`). Columns
    * the table gained through schema-registry evolution are not top-level
    * envelope fields — they are projected out of the open `extras` map
    * (cast from string to the registered type); a feed without `extras`
    * yields nulls for them. */
  def normalize(batch: DataFrame, userSchema: StructType): DataFrame = {
    val present = batch.columns.toSet
    val cols = userSchema.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else if (present.contains("extras"))
        element_at(col("extras"), f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    batch.select(cols ++ Seq(
      col("lsn").cast(LongType).as("__lsn"),
      when(col("op") === "D", lit("D")).otherwise(lit("U")).as("__op")): _*)
  }

  /** Extract schema-registry events (op = "S") from a v2 batch and apply
    * them to the table in LSN order (idempotently — safe under
    * redelivery). Returns the data-only remainder of the batch. Feeds
    * without the `extras` envelope column skip the scan entirely, so the
    * v1 hot path is untouched. */
  def applySchemaEvents(table: LakeTable, batch: DataFrame): DataFrame = {
    if (!batch.columns.contains("extras")) return batch
    val events = batch.filter(col("op") === "S")
      .select(col("lsn"), col("text")).collect().sortBy(_.getLong(0))
    events.foreach(r => SchemaRegistry(table, r.getString(1)))
    if (events.isEmpty) batch else batch.filter(col("op") =!= "S")
  }

  /** LWW: one row per key, the max-__lsn one. */
  def dedupLww(df: DataFrame, cfg: MergeConfig): DataFrame = {
    if (cfg.useWindowDedup) {
      val w = Window.partitionBy(KEY.map(col): _*).orderBy(col("__lsn").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    } else {
      val payload = df.columns.toSeq
      df.groupBy(KEY.map(col): _*)
        .agg(max_by(struct(payload.map(col): _*), col("__lsn")).as("__r"))
        .select(col("__r.*"))
    }
  }

  /** Apply one batch. `batch` must have the change-event envelope columns
    * (`lsn`, `op`, key + payload). Returns a no-op result if `epochId` was
    * already committed (exactly-once guard). */
  def merge(table: LakeTable, batch: DataFrame, epochId: Long,
      cfg: MergeConfig = MergeConfig()): MergeResult = {
    val t0 = System.nanoTime()
    val snap0 = table.snapshot
    if (snap0.isCommitted(epochId)) {
      return MergeResult(applied = false, snap0.version, 0L, 0L, Nil,
        (System.nanoTime() - t0) / 1000000L)
    }
    // registry events evolve the schema first (their own snapshot
    // commits, idempotent), then the data merges under the new schema
    val dataBatch = applySchemaEvents(table, batch)
    val snap = table.snapshot
    val spark = table.spark
    val nB = snap.nBuckets

    val deduped = dedupLww(normalize(dataBatch, snap.userSchema), cfg)
      .withColumn("__bucket", LakeTable.bucketExpr(nB))
      .persist()
    try {
      // one job: per-bucket batch stats (buckets touched + sizes + lineage)
      val stats = deduped.groupBy(col("__bucket"))
        .agg(count(lit(1)).as("n"), max(col("__lsn")).as("maxLsn"),
          max(col("ts")).as("maxTs"))
        .collect()
      if (stats.isEmpty) {
        val entry = LineageEntry(epochId, snap.version + 1, 0L, 0L, Nil, 0,
          snap.files.size, -1L, "", (System.nanoTime() - t0) / 1000000L)
        table.commit(snap, Nil, Set.empty, Some(epochId), Some(entry))
        return MergeResult(applied = true, snap.version + 1, 0L, 0L, Nil,
          (System.nanoTime() - t0) / 1000000L)
      }
      val buckets = stats.map(_.getInt(0)).toSet
      val batchRows = stats.map(_.getLong(1)).sum
      val maxLsn = stats.map(_.getLong(2)).max
      val tsVals = stats.flatMap(r => Option(r.get(3))).map(_.toString)
      val maxTs = if (tsVals.isEmpty) "" else tsVals.max

      val currentPerBucket: Map[Int, Long] = snap.files
        .filter(f => buckets.contains(f.bucket))
        .groupBy(_.bucket).map { case (b, fs) => b -> fs.map(_.rows).sum }
      val batchPerBucket: Map[Int, Long] =
        stats.map(r => r.getInt(0) -> r.getLong(1)).toMap
      val worstBucket = buckets.map(b =>
        currentPerBucket.getOrElse(b, 0L) + batchPerBucket(b)).max
      val salt = math.max(1L,
        (worstBucket + cfg.maxRowsPerFile - 1) / cfg.maxRowsPerFile).toInt

      val current = table.readRaw(Some(buckets))
        .withColumn("__bucket", LakeTable.bucketExpr(nB))
      val merged = dedupLww(current.unionByName(deduped), cfg)

      val newFiles = writeBuckets(table, merged, salt, snap)
      val entry = LineageEntry(epochId, snap.version + 1,
        batchRows, batchRows, buckets.toSeq.sorted, newFiles.size,
        snap.files.count(f => !buckets.contains(f.bucket)), maxLsn, maxTs,
        (System.nanoTime() - t0) / 1000000L)
      table.commit(snap, newFiles, buckets, Some(epochId), Some(entry))
      MergeResult(applied = true, snap.version + 1, batchRows, batchRows,
        buckets.toSeq.sorted, (System.nanoTime() - t0) / 1000000L)
    } finally deduped.unpersist()
  }

  /** Insert-only fast path (≈ the reference's Express-Loader bulk append,
    * reference: engine/post_processors.py:18-63, and `method='insert'`,
    * reference: engine/wprdc_etl/pipeline/loaders.py:370): write the batch
    * as new files without reading current data. Correct only when keys are
    * known fresh (e.g. time-gap incremental loads). Still LWW-dedups within
    * the batch and keeps the epoch guard. */
  def append(table: LakeTable, batch: DataFrame, epochId: Long,
      cfg: MergeConfig = MergeConfig()): MergeResult = {
    val t0 = System.nanoTime()
    val snap0 = table.snapshot
    if (snap0.isCommitted(epochId))
      return MergeResult(applied = false, snap0.version, 0L, 0L, Nil,
        (System.nanoTime() - t0) / 1000000L)
    val dataBatch = applySchemaEvents(table, batch)
    val snap = table.snapshot
    val deduped = dedupLww(normalize(dataBatch, snap.userSchema), cfg)
      .withColumn("__bucket", LakeTable.bucketExpr(snap.nBuckets))
    val newFiles = writeBuckets(table, deduped, 1, snap)
    val rows = newFiles.map(_.rows).sum
    val entry = LineageEntry(epochId, snap.version + 1, rows, rows,
      newFiles.map(_.bucket).distinct.sorted, newFiles.size, snap.files.size,
      -1L, "", (System.nanoTime() - t0) / 1000000L)
    table.commit(snap, newFiles, Set.empty, Some(epochId), Some(entry))
    MergeResult(applied = true, snap.version + 1, rows, rows,
      newFiles.map(_.bucket).distinct.sorted,
      (System.nanoTime() - t0) / 1000000L)
  }

  /** Write `df` (user cols + __lsn + __op + __bucket) under
    * `data/commit-<v>/`, one directory per bucket via partitionBy, with
    * `salt`-way intra-bucket write parallelism. Returns the manifest
    * entries (rows per file read from parquet footers — metadata only). */
  private def writeBuckets(table: LakeTable, df: DataFrame, salt: Int,
      snap: Snapshot): Seq[DataFileEntry] = {
    val spark = table.spark
    val outDir = s"${table.dir}/data/commit-${snap.version + 1}-${java.util.UUID.randomUUID().toString.take(8)}"
    val writeDf =
      if (salt <= 1) df.repartition(col("__bucket"))
      else df.repartition(col("__bucket"),
        pmod(hash(col("turn_idx")), lit(salt)))
    writeDf.write
      .partitionBy("__bucket")
      .mode("overwrite")
      .parquet(outDir)
    listDataFiles(spark, outDir, snap.currentSchemaVersion)
  }

  /** Enumerate part files under a partitionBy(__bucket) output dir and read
    * row counts from parquet footers (no data scan). */
  def listDataFiles(spark: SparkSession, outDir: String,
      schemaVersion: Int): Seq[DataFileEntry] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(outDir)
    val fs = root.getFileSystem(conf)
    val bucketDirs = fs.listStatus(root).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("__bucket="))
    bucketDirs.toSeq.flatMap { bd =>
      val bucket = bd.getPath.getName.stripPrefix("__bucket=").toInt
      fs.listStatus(bd.getPath).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map { f =>
          val rows = parquetRowCount(conf, f.getPath)
          DataFileEntry(f.getPath.toString, bucket, rows, schemaVersion)
        }
    }
  }

  private def parquetRowCount(conf: org.apache.hadoop.conf.Configuration,
      p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}
