package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.{MergeApply, MergeConfig}
import graft.model.Schemas

/** Event-time zone maps: per-file ts min/max in the manifest (parquet
  * footer stats, like the LSN ranges) and the file-skipping time-window
  * read built on them ([[LakeTable.tsCandidates]],
  * [[LakeTable.incrementalTail]]). */
class TsSkipSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 12) =
    Timestamp.valueOf(f"2026-01-$day%02d $hour%02d:00:00")
  private def micros(t: Timestamp) = t.getTime * 1000L

  private def ev(lsn: Long, op: String, conv: String, turn: Int, t: Timestamp) =
    (lsn, op, conv, turn, "user", s"text-$lsn", null: String, t)
  private def batch(rows: (Long, String, String, Int, String, String, String, Timestamp)*) =
    rows.toDF("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")

  private def entry(bucket: Int, kind: String, maxTs: Option[Long],
      path: String = "f", col: String = "ts") =
    DataFileEntry(path, bucket, 1L, 0, kind, maxTs = maxTs,
      minTs = maxTs.map(_ - 1), tsCol = Some(col))

  test("merge registers footer-derived event-time ranges in the manifest") {
    val t = LakeTable.createTable(spark, tmpDir("ts-stats"),
      Schemas.transcript, 4)
    MergeApply.merge(t, batch(
      ev(1, "I", "a", 0, ts(1)), ev(2, "I", "b", 0, ts(10)),
      ev(3, "I", "c", 0, ts(25))), 0L)
    val files = t.snapshot.files
    assert(files.nonEmpty)
    assert(files.forall(f => f.minTs.isDefined && f.maxTs.isDefined),
      s"every file statted: $files")
    // global envelope matches the data exactly (UTC epoch micros)
    assert(files.flatMap(_.minTs).min == micros(ts(1)))
    assert(files.flatMap(_.maxTs).max == micros(ts(25)))
    assert(files.forall(f => f.minTs.get <= f.maxTs.get))
  }

  test("tsCandidates: the three pruning rules and the stats-less fallback") {
    val cut = 1000L
    // base-only bucket: per-file pruning, STRICTLY-above boundary
    val b0 = Seq(entry(0, "base", Some(1000L), "at-cut"), // == cutoff: out
      entry(0, "base", Some(1001L), "above"), // > cutoff: kept
      entry(0, "base", Some(999L), "below")) // out
    // delta-bearing bucket with one file above: keep ALL files (LWW)
    val b1 = Seq(entry(1, "base", Some(10L), "stale-base"),
      entry(1, "delta", Some(2000L), "hot-delta"),
      entry(1, "delta", Some(5L), "stale-delta"))
    // fully-stale bucket, deltas included: skipped whole
    val b2 = Seq(entry(2, "base", Some(900L)), entry(2, "delta", Some(800L)))
    // a stats-less file keeps itself AND (may-exceed) its bucket
    val b3 = Seq(entry(3, "base", None, "unstatted"),
      entry(3, "base", Some(1L), "stale"))
    // stats registered for ANOTHER column (watermark.column repointed
    // since) are as good as absent: kept, never misread for ts
    val b4 = Seq(entry(4, "base", Some(1L), "alien-col", col = "updated_at"))
    val got = LakeTable.tsCandidates(b0 ++ b1 ++ b2 ++ b3 ++ b4, cut, "ts")
    assert(got.filter(_.bucket == 0).map(_.path) == Seq("above"))
    assert(got.filter(_.bucket == 1).toSet == b1.toSet)
    assert(!got.exists(_.bucket == 2))
    // base-only bucket with an unstatted member still prunes the statted
    // stale file; the unstatted one is kept conservatively
    assert(got.filter(_.bucket == 3).map(_.path) == Seq("unstatted"))
    assert(got.filter(_.bucket == 4).map(_.path) == Seq("alien-col"))
  }

  /** First conv id with the given prefix hashing to `bucket` of 4 — the
    * pruning assertion below needs KNOWN bucket placement. */
  private def convIn(bucket: Int, tag: String): String =
    Iterator.from(0).map(i => s"$tag$i")
      .find(s => LakeTable.bucketOf(s, 4) == bucket).get

  test("incrementalTail prunes files and matches the unpruned window") {
    val t = LakeTable.createTable(spark, tmpDir("ts-tail"),
      Schemas.transcript, 4,
      properties = Map(graft.spec.TimeField.WatermarkColumn -> "ts"))
    // old epochs land one conv in EVERY bucket; the recent epoch touches
    // only bucket 0 — buckets 1-3 then hold exclusively stale files
    val recent = convIn(0, "w3-")
    MergeApply.merge(t, batch(
      ev(1, "I", convIn(0, "w1-"), 0, ts(1)),
      ev(2, "I", convIn(1, "w1-"), 0, ts(2)),
      ev(3, "I", convIn(2, "w1-"), 0, ts(2)),
      ev(4, "I", convIn(3, "w1-"), 0, ts(3))), 0L)
    MergeApply.merge(t, batch(
      ev(5, "I", convIn(1, "w2-"), 0, ts(12)),
      ev(6, "I", convIn(2, "w2-"), 0, ts(13))), 1L)
    MergeApply.merge(t, batch(ev(7, "I", recent, 0, ts(25))), 2L)
    val tail = t.incrementalTail(7)
    assert(tail.select("conv_id").as[String].collect().toSet == Set(recent))
    // the same window computed the unpruned way agrees
    val legacy = graft.spec.TimeField.timeGap(t.read(), "ts", 7)
    assert(tail.select("conv_id").as[String].collect().toSet ==
      legacy.select("conv_id").as[String].collect().toSet)
    // and pruning actually engaged: buckets 1-3 are all-stale, so the
    // candidate set is a strict subset of the manifest
    val cutoff = micros(ts(25)) - 7L * 86400000000L
    val cands = LakeTable.tsCandidates(t.snapshot.files, cutoff, "ts")
    assert(cands.size < t.snapshot.files.size,
      s"expected pruning: ${cands.size} of ${t.snapshot.files.size}")
    assert(cands.forall(_.bucket == 0), s"only bucket 0 survives: $cands")
  }

  test("readTimeTail: arbitrary cutoff prunes files, matches brute filter") {
    val t = LakeTable.createTable(spark, tmpDir("ts-rtt"),
      Schemas.transcript, 4,
      properties = Map(graft.spec.TimeField.WatermarkColumn -> "ts"))
    val recent = convIn(0, "r3-")
    MergeApply.merge(t, batch(
      ev(1, "I", convIn(0, "r1-"), 0, ts(1)),
      ev(2, "I", convIn(1, "r1-"), 0, ts(2)),
      ev(3, "I", convIn(2, "r1-"), 0, ts(2)),
      ev(4, "I", convIn(3, "r1-"), 0, ts(3))), 0L)
    MergeApply.merge(t, batch(
      ev(5, "I", convIn(1, "r2-"), 0, ts(12)),
      ev(6, "I", convIn(2, "r2-"), 0, ts(13))), 1L)
    MergeApply.merge(t, batch(ev(7, "I", recent, 0, ts(25))), 2L)
    val cutoff = micros(ts(20))
    val got = t.readTimeTail("ts", cutoff)
      .select("conv_id").as[String].collect().toSet
    assert(got == Set(recent))
    val brute = t.read().filter(col("ts") > timestamp_micros(lit(cutoff)))
      .select("conv_id").as[String].collect().toSet
    assert(got == brute)
    // pruning engaged: only bucket 0 can hold post-cutoff rows
    val cands = LakeTable.tsCandidates(t.snapshot.files, cutoff, "ts")
    assert(cands.size < t.snapshot.files.size && cands.forall(_.bucket == 0))
    // boundary is strict, like the filter it serves
    assert(t.readTimeTail("ts", micros(ts(25))).count() == 0)
    assert(t.readTimeTail("ts", micros(ts(25)) - 1).count() == 1)
    // a non-timestamp column is rejected up front
    intercept[IllegalArgumentException] { t.readTimeTail("role", 0L) }
  }

  test("LWW trap: event time is not aligned with LSN; tail stays exact") {
    val t = LakeTable.createTable(spark, tmpDir("ts-lww"),
      Schemas.transcript, 2,
      properties = Map(graft.spec.TimeField.WatermarkColumn -> "ts"))
    // K1: winner (higher LSN) carries the OLD ts -> out of the window
    // even though its bucket holds a recent-looking delta file
    MergeApply.merge(t, batch(
      ev(1, "I", "K1", 0, ts(25)), ev(2, "I", "K2", 0, ts(25)),
      ev(3, "I", "K3", 0, ts(1)), ev(4, "I", "K4", 0, ts(20))), 0L)
    MergeApply.merge(t, batch(
      ev(5, "U", "K1", 0, ts(1)), // K1's winner: old ts
      ev(6, "U", "K3", 0, ts(24))), 1L) // K3's winner: new ts
    MergeApply.merge(t, batch(
      ev(7, "D", "K4", 0, ts(26))), 2L) // tombstone carries the max ts
    // anchor = max RETAINED event time = the tombstone's Jan 26;
    // window (Jan 19, Jan 26]: K2 (25) and K3 (24) in; K1's winner is
    // Jan 1 (out), K4 is deleted (out)
    assert(t.incrementalTail(7).select("conv_id").as[String].collect()
      .toSet == Set("K2", "K3"))
    // full correctness cross-check: pruned plan == brute filter on read()
    val brute = t.read()
      .filter(col("ts") > lit(ts(26)) - expr("INTERVAL 7 DAYS"))
      .select("conv_id").as[String].collect().toSet
    assert(brute == Set("K2", "K3"))
  }

  test("compaction refreshes event-time stats on folded base files") {
    val t = LakeTable.createTable(spark, tmpDir("ts-compact"),
      Schemas.transcript, 2)
    val cfg = MergeConfig(maxDeltaFilesPerBucket = 2)
    (0 to 4).foreach { i =>
      MergeApply.merge(t, batch(
        ev(i * 2 + 1, "I", s"c$i", 0, ts(i + 1)),
        ev(i * 2 + 2, "I", s"d$i", 0, ts(i + 2))), i.toLong, cfg)
    }
    // compaction ran (delta cap 2) and every surviving file is statted
    assert(t.snapshot.files.forall(f => f.minTs.isDefined && f.maxTs.isDefined),
      s"post-compaction stats: ${t.snapshot.files}")
    assert(t.snapshot.files.flatMap(_.maxTs).max == micros(ts(6)))
  }

  test("INT96 files carry no stats and every read stays conservative") {
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    val t = LakeTable.createTable(spark, tmpDir("ts-int96"),
      Schemas.transcript, 2,
      properties = Map(graft.spec.TimeField.WatermarkColumn -> "ts"))
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      MergeApply.merge(t, batch(
        ev(1, "I", "old", 0, ts(1)), ev(2, "I", "new", 0, ts(25))), 0L)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    assert(t.snapshot.files.forall(f => f.minTs.isEmpty && f.maxTs.isEmpty))
    // footer gave no ranges, but the entries still name the tracked
    // column: the batch fed the snapshot's high-water mark, which now
    // anchors the window with no scan; result is exact
    assert(t.snapshot.files.forall(_.tsCol.contains("ts")))
    assert(t.snapshot.properties.get(LakeTable.TsHwmColProp).contains("ts"))
    assert(t.incrementalTail(7).select("conv_id").as[String].collect()
      .toSet == Set("new"))
    // a statted epoch on top mixes fine with the unstatted history
    MergeApply.merge(t, batch(ev(3, "I", "newer", 0, ts(26))), 1L)
    assert(t.incrementalTail(7).select("conv_id").as[String].collect()
      .toSet == Set("new", "newer"))
  }

  test("compaction does not move the window anchor (high-water mark)") {
    val t = LakeTable.createTable(spark, tmpDir("ts-hwm"),
      Schemas.transcript, 1,
      properties = Map(graft.spec.TimeField.WatermarkColumn -> "ts"))
    val cfg = MergeConfig(maxDeltaFilesPerBucket = 2)
    MergeApply.merge(t, batch(
      ev(1, "I", "K1", 0, ts(25)), // the feed max — superseded below
      ev(2, "I", "K3", 0, ts(15)),
      ev(3, "I", "K2", 0, ts(20))), 0L, cfg)
    MergeApply.merge(t, batch(
      ev(4, "U", "K1", 0, ts(1))), 1L, cfg) // K1's winner: old ts
    // anchor = feed high-water Jan 25; window (Jan 18, ∞): K2 only
    assert(t.snapshot.properties(LakeTable.TsHwmProp)
      .startsWith("2026-01-25"))
    assert(t.incrementalTail(7).select("conv_id").as[String].collect()
      .toSet == Set("K2"))
    // third delta tips the bucket over the cap: compaction folds away
    // K1's superseded Jan-25 version — the retained max drops to Jan 20,
    // but the monotone mark holds the anchor at Jan 25, so K3 (Jan 15)
    // and K4 (Jan 17) do NOT suddenly appear in the "same" window
    MergeApply.merge(t, batch(ev(5, "I", "K4", 0, ts(17))), 2L, cfg)
    assert(t.snapshot.files.forall(_.kind == "base"), "compaction ran")
    assert(t.snapshot.files.flatMap(_.maxTs).max == micros(ts(20)))
    assert(t.snapshot.properties(LakeTable.TsHwmProp)
      .startsWith("2026-01-25"))
    assert(t.incrementalTail(7).select("conv_id").as[String].collect()
      .toSet == Set("K2"))
  }

  test("truncate drops the high-water mark; the next feed re-anchors") {
    val t = LakeTable.createTable(spark, tmpDir("ts-hwm-wipe"),
      Schemas.transcript, 2,
      properties = Map(graft.spec.TimeField.WatermarkColumn -> "ts"))
    MergeApply.merge(t, batch(ev(1, "I", "a", 0, ts(25))), 0L)
    assert(t.snapshot.properties.contains(LakeTable.TsHwmProp))
    t.truncate()
    assert(!t.snapshot.properties.contains(LakeTable.TsHwmProp))
    assert(!t.snapshot.properties.contains(LakeTable.TsHwmColProp))
    // a reload with OLDER event times anchors on ITS max, not the
    // departed feed's
    MergeApply.merge(t, batch(
      ev(2, "I", "b", 0, ts(10)), ev(3, "I", "c", 0, ts(2))), 1L)
    assert(t.incrementalTail(7).select("conv_id").as[String].collect()
      .toSet == Set("b"))
  }

  private val twoTs = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("conv_id",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("turn_idx",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("seen_at",
      org.apache.spark.sql.types.TimestampType)))

  test("repointing watermark.column never misreads the old column's stats") {
    val t = LakeTable.createTable(spark, tmpDir("ts-repoint"), twoTs, 2)
    // no watermark.column: stats register under the ts fallback.
    // A: recent ts / old seen_at; B: old ts / recent seen_at
    MergeApply.merge(t, Seq(
      (1L, "I", "A", 0, ts(25), ts(1)),
      (2L, "I", "B", 0, ts(1), ts(25)))
      .toDF("lsn", "op", "conv_id", "turn_idx", "ts", "seen_at"), 0L)
    assert(t.snapshot.files.forall(_.tsCol.contains("ts")))
    t.setProperty(graft.spec.TimeField.WatermarkColumn, "seen_at")
    // a seen_at window must return B — ts-registered ranges (which say
    // the opposite) are invalidated by the recorded column, and the
    // mark (registered under ts) is ignored too
    assert(t.incrementalTail(7).select("conv_id").as[String].collect()
      .toSet == Set("B"))
    // the next merge re-registers stats and the mark under seen_at
    MergeApply.merge(t, Seq((3L, "I", "C", 0, ts(2), ts(26)))
      .toDF("lsn", "op", "conv_id", "turn_idx", "ts", "seen_at"), 1L)
    assert(t.snapshot.properties.get(LakeTable.TsHwmColProp)
      .contains("seen_at"))
    assert(t.incrementalTail(7).select("conv_id").as[String].collect()
      .toSet == Set("B", "C"))
  }

  test("pre-zone-map manifests (no stats, no mark) use the lazy window") {
    // a schema with no `ts` column and no watermark.column at merge time
    // registers NO event-time stats and NO high-water mark — exactly a
    // pre-zone-map manifest. Setting the property afterwards must give
    // an exact (unpruned, lazily-anchored) window, not an eager scan of
    // nothing.
    val noTs = org.apache.spark.sql.types.StructType(
      twoTs.fields.filterNot(_.name == "ts"))
    val t = LakeTable.createTable(spark, tmpDir("ts-prezone"), noTs, 2)
    MergeApply.merge(t, Seq(
      (1L, "I", "old", 0, ts(1)), (2L, "I", "new", 0, ts(25)))
      .toDF("lsn", "op", "conv_id", "turn_idx", "seen_at"), 0L)
    assert(t.snapshot.files.forall(_.tsCol.isEmpty))
    assert(!t.snapshot.properties.contains(LakeTable.TsHwmProp))
    t.setProperty(graft.spec.TimeField.WatermarkColumn, "seen_at")
    assert(t.incrementalTail(7).select("conv_id").as[String].collect()
      .toSet == Set("new"))
  }

  test("an all-null event-time row group does not poison the file's stats") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    val dir = tmpDir("ts-nullblock")
    val f = new org.apache.hadoop.fs.Path(s"$dir/__bucket=0/part-0.parquet")
    val schema = MessageTypeParser.parseMessageType(
      "message m { required int64 __lsn; optional int64 ts (TIMESTAMP(MICROS,true)); }")
    val conf = spark.sessionState.newHadoopConf()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(f).withConf(conf).withType(schema)
      .withRowGroupSize(1024L).withPageSize(512) // force several row groups
      .build()
    val base = micros(ts(20))
    val fac = new SimpleGroupFactory(schema)
    try {
      // the leading groups hold ONLY null ts; the trailing ones carry values
      (1 to 400).foreach { i =>
        w.write(fac.newGroup().append("__lsn", i.toLong)) }
      (401 to 800).foreach { i =>
        w.write(fac.newGroup().append("__lsn", i.toLong)
          .append("ts", base + i)) }
    } finally w.close()
    // precondition: the layout really has an all-null leading group
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
    val blocks = try {
      r.getFooter.getBlocks.size -> !r.getFooter.getBlocks.get(0)
        .getColumns.get(1).getStatistics.hasNonNullValue
    } finally r.close()
    assert(blocks._1 >= 2 && blocks._2,
      s"expected a leading all-null row group, got $blocks")
    val entries = MergeApply.listDataFiles(spark, dir, 0, "base", Some("ts"))
    assert(entries.size == 1)
    assert(entries.head.maxTs.contains(base + 800),
      s"valued blocks must still bound the file: ${entries.head}")
    assert(entries.head.minTs.contains(base + 401))
  }

  test("the mark is the running max since the last wipe or repoint") {
    // property-style: a random interleaving of watermark-bearing commits
    // (under two columns), mark-less commits, and truncates — after every
    // step the property pair equals the fold the scaladoc promises
    val t = LakeTable.createTable(spark, tmpDir("ts-hwm-prop"),
      Schemas.transcript, 2)
    val rnd = new scala.util.Random(7)
    var exp: Option[(String, String)] = None // (column, running max)
    (1 to 60).foreach { i =>
      rnd.nextInt(10) match {
        case 0 =>
          t.truncate()
          exp = None
        case n =>
          val colName = if (n == 1) "other" else "ts"
          val w = f"2026-01-${1 + rnd.nextInt(28)}%02d 00:00:00.000000"
          val e = LineageEntry(-1L, 0L, 0L, 0L, Nil, 0, 0, -1L,
            if (n == 2) "" else w, 0L, // n==2: a mark-less commit (no-op)
            watermarkCol = colName)
          t.commit(t.snapshot, Seq(DataFileEntry(s"f-$i", 0, 1L, 0)),
            Set.empty, None, Some(e))
          if (n != 2) exp = exp match {
            case Some((c, m)) if c == colName =>
              Some((c, if (m > w) m else w))
            case _ => Some((colName, w)) // repoint restarts the mark
          }
      }
      val got = for {
        c <- t.snapshot.properties.get(LakeTable.TsHwmColProp)
        m <- t.snapshot.properties.get(LakeTable.TsHwmProp)
      } yield (c, m)
      assert(got == exp, s"step $i")
    }
  }

  test("an empty table yields an empty tail with the user schema") {
    val t = LakeTable.createTable(spark, tmpDir("ts-empty"),
      Schemas.transcript, 2,
      properties = Map(graft.spec.TimeField.WatermarkColumn -> "ts"))
    val tail = t.incrementalTail(7)
    assert(tail.columns.toSeq == Schemas.transcript.fieldNames.toSeq)
    assert(tail.count() == 0)
  }
}
