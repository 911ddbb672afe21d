package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.cdc.{MergeApply, MergeConfig}

/** Table-maintenance CLI — the ops surface a deployed lake table needs
  * (the reference has no table maintenance because CKAN owns its storage;
  * a snapshot-log table owns its own, so compaction / snapshot expiry /
  * orphan cleanup / layout evolution are first-class operations here, as
  * they are in any production lakehouse). Thin arg-parse over the library
  * calls — every command is one [[LakeTable]] / [[MergeApply]] method, so
  * anything scriptable here is equally scriptable in Scala.
  *
  * Usage: runMain graft.lake.TableMain <tableDir> <command> [args]
  *
  *  - `status`                     snapshot version, layout, file/row
  *                                 counts (base vs delta), epoch
  *                                 watermark, properties
  *  - `history [n]`                newest `n` (default 20) lineage rows
  *                                 (the full log lives in `_lineage`)
  *  - `schema`                     user schema as DDL + column docs
  *  - `show [n] [--at <ref>]`      sample rows, optionally time-traveled
  *                                 (`ref` = version number or tag name)
  *  - `tail <days> [n]`            sample rows from the last `days` days
  *                                 of event time ([[LakeTable
  *                                 .incrementalTail]] — file-skipping via
  *                                 the manifest's zone maps; needs the
  *                                 `watermark.column` property)
  *  - `compact [b1,b2,…|all]`      fold MoR deltas into base files
  *                                 (default: exactly the delta-bearing
  *                                 buckets — the no-op-safe invocation)
  *  - `rebucket <newN>`            partition-layout evolution
  *                                 ([[MergeApply.rebucket]])
  *  - `vacuum [keepSnapshots]`     expire old snapshots + unreferenced
  *                                 data files (default keep 1)
  *  - `vacuum-orphans [graceMs]`   delete commit dirs no snapshot
  *                                 references, older than the grace
  *                                 window (default 1h)
  *  - `recover [graceMs]`          roll FORWARD after a writer crash:
  *                                 adopt the newest fully-written
  *                                 orphan snapshot as committed and
  *                                 delete torn snapshot files older
  *                                 than the grace window
  *  - `set-property <key> <value>` snapshot property (e.g.
  *                                 `watermark.column`)
  *  - `tag <name> [version] [--replace]`
  *                                 pin a snapshot under a name (a
  *                                 dataset release; vacuum never
  *                                 expires a tagged version)
  *  - `tags`                       list tags
  *  - `drop-tag <name>`            unpin (the version becomes
  *                                 vacuumable again)
  *  - `diff <fromRef> [toRef]`     endpoint change summary between two
  *                                 refs ([[LakeTable.changeFeed]]):
  *                                 counts per change type + sample rows
  *  - `revert <ref>`               restore the table's DATA state to a
  *                                 ref by merging compensating changes
  *                                 ([[graft.cdc.Revert]] — incremental
  *                                 consumers see the revert as ordinary
  *                                 changes, no re-bootstrap)
  *  - `export <outDir> [--at <ref>]`
  *                                 materialize a snapshot (e.g. a tagged
  *                                 dataset release) as plain parquet for
  *                                 downstream consumers; fails if
  *                                 `outDir` exists
  *  - `staged`                     pending write-audit-publish intents
  *                                 ([[LakeTable.stagedIds]]) with base
  *                                 version, file/row counts, epoch
  *  - `publish <wapId>`            publish a staged intent through the
  *                                 ordinary commit protocol
  *                                 ([[LakeTable.publishStaged]])
  *  - `abort-staged <wapId>`       discard a staged intent and its files
  *  - `fsck`                       integrity audit: manifest vs disk
  *                                 (file existence, footer row counts,
  *                                 stat sanity, lineage-mirror
  *                                 completeness). Read-only; exit 1
  *                                 with one line per problem.
  *
  * Exit code 0 on success, 1 on a usage or execution error. */
object TableMain {

  /** Run one command against the table; returns the process exit code.
    * Factored from [[main]] so tests drive the CLI without forking. */
  def run(spark: SparkSession, args: Seq[String],
      out: String => Unit = println): Int = {
    if (args.length < 2) {
      System.err.println(
        "usage: TableMain <tableDir> <command> [args] — commands: status " +
          "history schema show tail tail-after compact rebucket vacuum " +
          "vacuum-orphans recover set-property tag tags drop-tag diff " +
          "revert export export-conversations staged publish abort-staged " +
          "rejects purge purge-verify fsck")
      return 1
    }
    val dir = args.head
    val cmd = args(1)
    val rest = args.drop(2)
    try {
      // inside the try: an empty/bad path or unsupported scheme throws
      // from the Path constructor — that's an execution error, not a
      // stack trace. recover gets no carve-out: it too starts from the
      // CURRENT pointer, so a table with no CURRENT is "no table" for
      // every command.
      val table = LakeTable.load(spark, dir)
      if (!table.exists) {
        System.err.println(s"[table] no table at $dir")
        return 1
      }
      cmd match {
        case "status" =>
          val s = table.snapshot
          val (base, delta) = s.files.partition(_.kind == "base")
          out(s"version:          ${s.version}")
          out(s"buckets:          ${s.nBuckets}")
          out(s"schema version:   ${s.currentSchemaVersion}")
          out(s"files:            ${s.files.size} " +
            s"(${base.size} base, ${delta.size} delta)")
          out(s"rows (pre-LWW):   ${s.files.map(_.rows).sum}")
          out(s"epoch watermark:  ${s.epochWatermark}" +
            (if (s.recentEpochs.nonEmpty)
              s" (+${s.recentEpochs.size} out-of-order)" else ""))
          out(s"delta buckets:    " +
            delta.map(_.bucket).distinct.sorted.mkString(","))
          // one snapshot read serves both listings (a second
          // table.linkedResources call could land on a different
          // version under a concurrent writer), and link.* properties
          // print once, under their own heading
          val (links, props) = s.properties.partition(_._1.startsWith("link."))
          props.toSeq.sortBy(_._1).foreach { case (k, v) =>
            out(s"property:         $k=$v") }
          links.toSeq.sortBy(_._1).foreach { case (k, v) =>
            out(s"linked:           ${k.stripPrefix("link.")} -> $v") }
          0
        case "history" =>
          // history [n] [--epoch-from A] [--epoch-to B] [--rejects-only]
          // filters make the quarantine/lineage path operable without
          // reading parquet by hand: "which epochs rejected events?",
          // "what landed between epochs 40 and 60?". Filtered reads go
          // through the FULL append-only `_lineage` mirror (the inline
          // snapshot log is bounded at maxLineageInSnapshot rows).
          var n = 20
          var from = Long.MinValue
          var to = Long.MaxValue
          var rejOnly = false
          var asJson = false
          var args = rest.toList
          while (args.nonEmpty) args match {
            case "--epoch-from" :: v :: t => from = v.toLong; args = t
            case "--epoch-to" :: v :: t => to = v.toLong; args = t
            case "--rejects-only" :: t => rejOnly = true; args = t
            case "--json" :: t => asJson = true; args = t
            case ("--epoch-from" | "--epoch-to") :: Nil =>
              throw new IllegalArgumentException(s"${args.head} needs a value")
            case v :: t => n = v.toInt; args = t
            case Nil => () // unreachable under the nonEmpty guard
          }
          val filtered = from != Long.MinValue || to != Long.MaxValue || rejOnly
          val mirrorPath = new Path(dir, "_lineage")
          val mirrorExists = mirrorPath
            .getFileSystem(spark.sessionState.newHadoopConf())
            .exists(mirrorPath)
          val entries: Seq[LineageEntry] =
            if (!filtered) table.lineage
            else if (!mirrorExists)
              // a fresh table has no mirror yet — filter the (equally
              // fresh) inline log instead of failing on a missing path
              table.lineage.filter(e => e.epochId >= from &&
                e.epochId <= to && (!rejOnly || e.rejectedEvents > 0))
            else {
              import org.apache.spark.sql.functions.col
              val mirror = table.lineageTable
                .filter(col("epochId") >= from && col("epochId") <= to)
              val bounded =
                if (rejOnly) mirror.filter(col("rejectedEvents") > 0)
                else mirror
              bounded.orderBy(col("version")).collect().toSeq.map(r =>
                LineageEntry(
                  epochId = r.getAs[Long]("epochId"),
                  version = r.getAs[Long]("version"),
                  rowsInBatch = r.getAs[Long]("rowsInBatch"),
                  rowsApplied = r.getAs[Long]("rowsApplied"),
                  bucketsTouched = Option(r.getAs[scala.collection.Seq[Int]](
                    "bucketsTouched")).map(_.toSeq).getOrElse(Nil),
                  filesRewritten = r.getAs[Int]("filesRewritten"),
                  filesCarried = r.getAs[Int]("filesCarried"),
                  maxLsn = r.getAs[Long]("maxLsn"),
                  watermarkTs = Option(r.getAs[String]("watermarkTs"))
                    .getOrElse(""),
                  durationMs = r.getAs[Long]("durationMs"),
                  minLsn = r.getAs[Long]("minLsn"),
                  rejectedEvents = r.getAs[Long]("rejectedEvents")))
            }
          entries.takeRight(n).reverse.foreach { e =>
            if (asJson)
              // machine-readable lineage for audit tooling: one JSON
              // object per line, newest first (all fields numeric or
              // fixed-format — no string escaping surface)
              out(s"""{"version":${e.version},"epochId":${e.epochId},""" +
                s""""rowsInBatch":${e.rowsInBatch},""" +
                s""""rowsApplied":${e.rowsApplied},""" +
                s""""buckets":[${e.bucketsTouched.mkString(",")}],""" +
                s""""filesRewritten":${e.filesRewritten},""" +
                s""""filesCarried":${e.filesCarried},""" +
                s""""minLsn":${e.minLsn},"maxLsn":${e.maxLsn},""" +
                s""""watermarkTs":"${e.watermarkTs}",""" +
                s""""durationMs":${e.durationMs},""" +
                s""""rejectedEvents":${e.rejectedEvents}}""")
            else {
              val rej = if (e.rejectedEvents > 0)
                f" REJECTED=${e.rejectedEvents}" else ""
              out(f"v${e.version}%-6d epoch=${e.epochId}%-8d " +
                f"rows=${e.rowsApplied}%-9d buckets=${e.bucketsTouched.size}%-4d " +
                f"files+${e.filesRewritten}/~${e.filesCarried} " +
                f"lsn=[${e.minLsn},${e.maxLsn}] ${e.durationMs} ms$rej")
            }
          }
          0
        case "schema" =>
          val s = table.snapshot
          out(s.userSchema.toDDL)
          s.columnDocs.toSeq.sortBy(_._1).foreach { case (c, d) =>
            out(s"-- $c: $d") }
          0
        case "show" =>
          val i = rest.indexOf("--at")
          val (asOf, posArgs) =
            if (i < 0) (None, rest)
            else {
              require(i + 1 < rest.length, "--at needs a version or tag")
              (Some(table.resolveRef(rest(i + 1))),
                rest.take(i) ++ rest.drop(i + 2))
            }
          val n = posArgs.headOption.map(_.toInt).getOrElse(20)
          table.read(asOf = asOf).limit(n).collect()
            .foreach(r => out(r.toString))
          0
        case "tail" =>
          require(rest.nonEmpty, "tail needs the window size in days")
          val days = rest.head.toInt
          val n = rest.drop(1).headOption.map(_.toInt).getOrElse(20)
          table.incrementalTail(days).limit(n).collect()
            .foreach(r => out(r.toString))
          0
        case "tail-after" =>
          // arbitrary-cutoff sibling of `tail`: rows with event time
          // strictly after an ISO instant (2026-01-20T00:00:00 or a
          // bare date), zone-map file-skipped (LakeTable.readTimeTail)
          require(rest.nonEmpty,
            "tail-after needs an ISO timestamp (yyyy-MM-ddTHH:mm:ss) " +
              "or date (yyyy-MM-dd)")
          val c = table.snapshot.eventTimeColumn.getOrElse(
            throw new IllegalArgumentException(
              "table has no timestamp event-time column " +
                "(watermark.column or ts)"))
          val raw = rest.head
          val zone = java.time.ZoneId.of(
            spark.conf.get("spark.sql.session.timeZone"))
          // accept the three common ISO spellings: instant (trailing Z
          // or offset), local date-time (session zone), bare date
          // Instant.parse accepts only ISO_INSTANT (trailing Z), so a
          // numeric offset like +05:00 needs the OffsetDateTime branch
          // before the zone-less fallbacks
          val inst =
            try java.time.Instant.parse(raw)
            catch { case _: java.time.format.DateTimeParseException =>
              try java.time.OffsetDateTime.parse(raw).toInstant
              catch { case _: java.time.format.DateTimeParseException =>
                (if (raw.contains("T")) java.time.LocalDateTime.parse(raw)
                 else java.time.LocalDate.parse(raw).atStartOfDay())
                  .atZone(zone).toInstant
              }
            }
          val micros = LakeTable.microsOf(inst)
          val n = rest.drop(1).headOption.map(_.toInt).getOrElse(20)
          table.readTimeTail(c, micros).limit(n).collect()
            .foreach(r => out(r.toString))
          0
        case "compact" =>
          val snap = table.snapshot
          val present = snap.files.map(_.bucket).toSet
          val requested = rest.headOption match {
            case None =>
              snap.files.filter(_.kind == "delta").map(_.bucket).toSet
            case Some("all") => present
            case Some(csv) => csv.split(",").map(_.trim.toInt).toSet
          }
          // a typo'd or stale bucket id must not report success
          val unknown = requested -- present
          unknown.toSeq.sorted.foreach(b => System.err.println(
            s"[table] WARNING: bucket $b holds no files, skipping"))
          val target = requested & present
          if (target.isEmpty) { out("[table] nothing to compact"); 0 }
          else {
            // pin the snapshot the target was computed from, so the ids
            // and the folded files come from the same version
            val s2 = MergeApply.compactBuckets(table, target, MergeConfig(),
              at = Some(snap))
            out(s"[table] compacted ${target.size} bucket(s) -> v${s2.version}")
            0
          }
        case "rebucket" =>
          require(rest.nonEmpty, "rebucket needs the new bucket count")
          val s2 = MergeApply.rebucket(table, rest.head.toInt, MergeConfig())
          out(s"[table] rebucketed to ${s2.nBuckets} -> v${s2.version}")
          0
        case "vacuum" =>
          val keep = rest.headOption.map(_.toInt).getOrElse(1)
          val (snaps, files) = table.vacuum(keep)
          out(s"[table] expired $snaps snapshot(s), deleted $files file(s)")
          0
        case "vacuum-orphans" =>
          val grace = rest.headOption.map(_.toLong).getOrElse(3600000L)
          val n = table.vacuumOrphans(grace)
          out(s"[table] removed $n orphan commit dir(s)")
          0
        case "recover" =>
          val grace = rest.headOption.map(_.toLong).getOrElse(300000L)
          val v = table.recover(grace)
          out(s"[table] rolled forward to v$v")
          0
        case "set-property" =>
          require(rest.length == 2, "set-property needs <key> <value>")
          val s2 = table.setProperty(rest(0), rest(1))
          out(s"[table] ${rest(0)}=${rest(1)} -> v${s2.version}")
          0
        case "tag" =>
          val (flags, pos) = rest.partition(_ == "--replace")
          require(pos.nonEmpty && pos.length <= 2,
            "tag needs <name> [version] [--replace]")
          val target = pos.drop(1).headOption.map(_.toLong)
          val s2 = table.tag(pos.head, target, replace = flags.nonEmpty)
          out(s"[table] tag ${pos.head} -> " +
            s"v${s2.properties(s"tag.${pos.head}")} (at v${s2.version})")
          0
        case "tags" =>
          table.tags.toSeq.sortBy(_._1).foreach { case (n, v) =>
            out(f"$n%-30s v$v") }
          0
        case "drop-tag" =>
          require(rest.length == 1, "drop-tag needs <name>")
          val s2 = table.dropTag(rest.head)
          out(s"[table] dropped tag ${rest.head} -> v${s2.version}")
          0
        case "diff" =>
          require(rest.nonEmpty && rest.length <= 2,
            "diff needs <fromRef> [toRef]")
          val from = table.resolveRef(rest.head)
          val to = rest.drop(1).headOption.map(table.resolveRef)
          val feed = table.changeFeed(from, to).cache()
          try {
            val counts = feed.groupBy("_change_type").count().collect()
              .map(r => r.getString(0) -> r.getLong(1)).toMap
            // one update = one pre/post pair
            out(s"insert=${counts.getOrElse("insert", 0L)} " +
              s"update=${counts.getOrElse("update_postimage", 0L)} " +
              s"delete=${counts.getOrElse("delete", 0L)}")
            feed.orderBy("_lsn").limit(20).collect()
              .foreach(r => out(r.toString))
          } finally feed.unpersist(): Unit
          0
        case "revert" =>
          require(rest.length == 1, "revert needs <ref>")
          val r = graft.cdc.Revert.revertTo(table, rest.head)
          out(if (r.applied)
            s"[table] reverted to ${rest.head}: ${r.rowsApplied} " +
              s"compensating row(s) -> v${r.version}"
          else s"[table] already at ${rest.head} state (no-op)")
          0
        case "purge" =>
          // right-to-be-forgotten: tombstone + bucket-pruned history
          // rewrite + reject scrub (graft.cdc.Purge). Erasure completes
          // at the next vacuum past retention; blocking tags reported.
          // --scrub-tombstones = the post-convergence full-key-erasure
          // pass (drops even the null-payload tombstones).
          val scrub = rest.contains("--scrub-tombstones")
          val posArgs = rest.filterNot(_ == "--scrub-tombstones")
          require(posArgs.length == 1,
            "purge needs a comma-separated conv_id list " +
              "[--scrub-tombstones]")
          val ids = posArgs.head.split(",").map(_.trim).filter(_.nonEmpty).toSet
          val r = graft.cdc.Purge.purgeConversations(table, ids,
            scrubTombstones = scrub)
          out(s"[table] purged ${ids.size} conversation(s): " +
            s"${r.liveRowsTombstoned} live turn(s) tombstoned" +
            r.tombstoneVersion.map(v => s" (v$v)").getOrElse("") +
            s", ${r.bucketsRewritten.size} bucket(s) rewritten " +
            s"-> v${r.rewriteVersion}, ${r.rejectsScrubbed} reject row(s) " +
            "scrubbed")
          if (r.blockingTags.nonEmpty)
            out("[table] WARNING: erasure blocked by tag(s) pinning " +
              "pre-purge versions: " +
              r.blockingTags.toSeq.sorted.map { case (t, v) => s"$t(v$v)" }
                .mkString(", ") + " — drop them, then vacuum")
          else
            out("[table] pre-purge snapshots remain readable until vacuum " +
              "— run vacuum past retention to complete erasure")
          0
        case "purge-verify" =>
          // erasure evidence: scan every parquet file under the table
          // (all snapshots, orphans, staged intents, rejects) for the
          // ids; report residuals + what pins them, or a clean bill
          val vJson = rest.contains("--json")
          val vArgs = rest.filterNot(_ == "--json")
          require(vArgs.length == 1,
            "purge-verify needs a comma-separated conv_id list [--json]")
          val ids = vArgs.head.split(",").map(_.trim).filter(_.nonEmpty).toSet
          val rep = graft.cdc.Purge.verifyErasure(table, ids)
          if (vJson) {
            // machine-readable: one object per residual file + a summary
            // line (paths/tags/ids are engine-generated — no exotic
            // escaping surface beyond quotes, handled here)
            def q(s: String) =
              "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
            rep.residuals.foreach { r =>
              out(s"""{"path":${q(r.path)},""" +
                s""""payloadRows":${r.payloadRows},""" +
                s""""keyOnlyRows":${r.keyOnlyRows},""" +
                s""""versions":[${r.versions.mkString(",")}],""" +
                s""""pinningTags":[${r.pinningTags.map(q).mkString(",")}],""" +
                s""""stagedIds":[${r.stagedIds.map(q).mkString(",")}]}""")
            }
            out(s"""{"summary":true,"residualFiles":${rep.residuals.size},""" +
              s""""payloadClean":${rep.payloadClean},""" +
              s""""fullyClean":${rep.fullyClean}}""")
            if (rep.payloadClean) 0 else 1
          } else if (rep.fullyClean) {
            out(s"[table] purge-verify: CLEAN — no trace of " +
              s"${ids.size} conversation(s) in any data file, snapshot, " +
              "staged intent, or reject dir")
            0
          } else {
            rep.residuals.foreach { r =>
              val where =
                (if (r.versions.nonEmpty)
                  Seq(s"versions ${r.versions.mkString(",")}") else Nil) ++
                (if (r.pinningTags.nonEmpty)
                  Seq(s"PINNED by ${r.pinningTags.mkString(",")}") else Nil) ++
                (if (r.stagedIds.nonEmpty)
                  Seq(s"staged ${r.stagedIds.mkString(",")}") else Nil)
              out(s"[table] residual ${r.path}: " +
                s"payload=${r.payloadRows} keyOnly=${r.keyOnlyRows}" +
                (if (where.nonEmpty) where.mkString(" (", "; ", ")") else ""))
            }
            if (rep.payloadClean)
              out("[table] purge-verify: payload clean — only key-only " +
                "tombstones remain (run purge --scrub-tombstones after " +
                "downstream convergence for full key erasure)")
            else {
              val tags = rep.residuals.flatMap(_.pinningTags).distinct.sorted
              out("[table] purge-verify: PAYLOAD RESIDUALS remain — " +
                (if (tags.nonEmpty)
                  s"drop tag(s) ${tags.mkString(", ")} and vacuum"
                else "run vacuum past retention (and purge again if new " +
                  "payload arrived)"))
            }
            if (rep.payloadClean) 0 else 1
          }
        case "export" =>
          val i = rest.indexOf("--at")
          val (asOf, posArgs) =
            if (i < 0) (None, rest)
            else {
              require(i + 1 < rest.length, "--at needs a version or tag")
              (Some(table.resolveRef(rest(i + 1))),
                rest.take(i) ++ rest.drop(i + 2))
            }
          require(posArgs.length == 1, "export needs <outDir> [--at <ref>]")
          table.read(asOf = asOf).write.parquet(posArgs.head)
          out(s"[table] exported " +
            s"v${asOf.getOrElse(table.snapshot.version)} -> ${posArgs.head}")
          0
        case "export-conversations" =>
          // the training-artifact export: one JSON document per
          // conversation, turns in order, one line each (ConvExport)
          val i = rest.indexOf("--at")
          val (asOf, posArgs) =
            if (i < 0) (None, rest)
            else {
              require(i + 1 < rest.length, "--at needs a version or tag")
              (Some(table.resolveRef(rest(i + 1))),
                rest.take(i) ++ rest.drop(i + 2))
            }
          require(posArgs.length == 1,
            "export-conversations needs <outDir> [--at <ref>]")
          graft.ops.ConvExport.writeJsonl(table.read(asOf = asOf),
            posArgs.head)
          out(s"[table] exported conversations " +
            s"v${asOf.getOrElse(table.snapshot.version)} -> ${posArgs.head}")
          0
        case "staged" =>
          table.stagedIds.foreach { id =>
            val it = table.stagedIntent(id)
            out(f"$id%-24s base=v${it.baseVersion} " +
              f"files=${it.files.size} rows=${it.files.map(_.rows).sum} " +
              s"epoch=${it.epochId.orElse(it.txnBatch).getOrElse(-1L)}")
          }
          0
        case "publish" =>
          require(rest.length == 1, "publish needs <wapId>")
          val s2 = table.publishStaged(rest.head)
          out(s"[table] published ${rest.head} -> v${s2.version}")
          0
        case "abort-staged" =>
          require(rest.length == 1, "abort-staged needs <wapId>")
          table.abortStaged(rest.head)
          out(s"[table] aborted ${rest.head}")
          0
        case "rejects" =>
          // dead-letter inventory (MergeConfig.invalidRows="quarantine"):
          // one line per quarantined epoch, then a per-reason rollup —
          // the triage view for "what is the feed sending us?"
          val root = new Path(dir, "_rejects")
          val fs = root.getFileSystem(
            spark.sessionState.newHadoopConf())
          if (!fs.exists(root)) { out("[table] no rejects"); 0 }
          else {
            val epochDirs = fs.listStatus(root).filter(_.isDirectory)
              .flatMap(app => fs.listStatus(app.getPath)
                .filter(d => d.isDirectory &&
                  d.getPath.getName.startsWith("epoch=")))
              .map(_.getPath.toString).sorted
            if (epochDirs.isEmpty) { out("[table] no rejects"); 0 }
            else {
              val all = spark.read.parquet(epochDirs: _*)
              epochDirs.foreach { d =>
                val n = spark.read.parquet(d).count()
                val tail = d.split("/_rejects/").last
                out(f"$tail%-32s $n%6d event(s)")
              }
              all.groupBy("reject_reason").count()
                .orderBy(org.apache.spark.sql.functions.col("count").desc)
                .collect().foreach(r =>
                  out(f"reason ${r.getString(0)}%-24s ${r.getLong(1)}%6d"))
              0
            }
          }
        case "fsck" =>
          val problems = table.fsck()
          if (problems.isEmpty) {
            out(s"[table] OK — ${table.snapshot.files.size} file(s) clean")
            0
          } else {
            problems.foreach(p => out(s"[table] PROBLEM: $p"))
            1
          }
        case other =>
          System.err.println(s"[table] unknown command '$other'")
          1
      }
    } catch {
      case e if scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[table] $cmd failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
        1
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSpark.session("graft-table")
    val code =
      try run(spark, args.toSeq)
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
