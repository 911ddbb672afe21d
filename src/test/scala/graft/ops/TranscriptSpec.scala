package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transcript pack: ordered conversation assembly + gap sessionization.
  * Structural invariants here; value-exactness is the driver's DuckDB
  * oracle gate. */
class TranscriptSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)
  private def events = spark.read.parquet(s"$sf/events.parquet")

  test("assembly emits one row per conversation, every turn exactly once, in turn order") {
    val out = q("q42_assemble_transcript").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    val want = events
      .select(col("user_id"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        val sorted = rows.sortBy(_._2)
        u -> (sorted.map(_._3).mkString("|"), sorted.length.toLong,
          sorted.map(_._2).max)
      }
    assert(out == want)
  }

  test("assembly is order-stable: shuffled input assembles identically") {
    val base = TranscriptQueries
      .assemble(events, "user_id", "event_id", "event_type")
      .collect().map(_.toSeq).toSet
    // adversarial arrival order: collect_list sees turns backwards
    val reversed = TranscriptQueries.assemble(
      events.orderBy(col("event_id").desc), "user_id", "event_id", "event_type")
      .collect().map(_.toSeq).toSet
    assert(base == reversed)
  }

  test("assembly plan: hash aggregation only — no window, no global sort") {
    val plan = q("q42_assemble_transcript")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"collect_list not running as a hash aggregate:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window exchange:\n$plan")
  }

  test("sessionization partitions the stream; every cut is a real gap") {
    val out = q("q43_sessionize").collect()
    assert(out.map(_.getLong(2)).sum == events.count(),
      "sessions must partition the event stream")
    // recompute per-actor timelines and check each boundary decision
    val gap = TranscriptQueries.SessionGapUs
    val byUser = events.select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))
      .groupBy(_._1).map { case (u, rs) =>
        u -> rs.map(_._2).sortBy(_.toInstant(java.time.ZoneOffset.UTC)) }
    val sessions = out.map { r =>
      (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](3), r.getAs[java.time.LocalDateTime](4))
    }
    def us(i: java.time.LocalDateTime): Long = {
      val inst = i.toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    }
    sessions.groupBy(_._1).foreach { case (u, ss) =>
      val ordered = ss.sortBy(_._2)
      // contiguous ordinals starting at 1; inter-session gaps exceed the cut
      assert(ordered.map(_._2).toSeq == (1L to ordered.length).toSeq)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(us(b._3) - us(a._4) > gap,
          s"user $u sessions ${a._2}/${b._2} not separated by > $gap us")
        case _ =>
      }
      // within a session no internal gap exceeds the cut
      val spans = ordered.map(s => (us(s._3), us(s._4)))
      val times = byUser(u).map(us)
      spans.foreach { case (lo, hi) =>
        val inside = times.filter(t => t >= lo && t <= hi).sorted
        inside.sliding(2).foreach {
          case Array(x, y) => assert(y - x <= gap)
          case _ =>
        }
      }
    }
  }

  test("sessionization plan: one exchange, one sort — rollup reuses the window partitioning") {
    val plan = TranscriptQueries.sessionize(events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window:\n$plan")
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"whole operator should cost exactly one exchange, found $exchanges:\n$plan")
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(sorts == 1,
      s"both window frames should share one sort, found $sorts:\n$plan")
  }

  test("sessionization is independent of the session time zone (DST zones included)") {
    val utc = q("q43_sessionize").collect().map(_.toSeq).toSet
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York") // DST transitions
      val nyc = q("q43_sessionize").collect().map(_.toSeq).toSet
      assert(nyc == utc,
        "gap math must be wall-clock (NTZ interval), never instant-cast")
    } finally spark.conf.set(tzKey, saved)
  }

  test("turn transitions: every adjacent pair counted exactly once") {
    val out = q("q44_turn_transitions").collect()
    val users = events.select(countDistinct(col("user_id"))).head().getLong(0)
    // each actor with k events contributes k-1 adjacent pairs
    assert(out.map(_.getLong(2)).sum == events.count() - users)
    // recompute one actor's timeline by hand and spot-check a transition
    val one = events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .groupBy(_.getLong(0)).maxBy(_._2.length)._2
      .sortBy(r => (r.getAs[java.time.LocalDateTime](1)
        .toInstant(java.time.ZoneOffset.UTC), r.getLong(2)))
      .map(_.getString(3))
    val want = one.sliding(2).collect { case Array(a, b) => (a, b) }.toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    want.foreach { case (k, n) => assert(got(k) >= n, s"missing pairs $k") }
  }

  test("funnel: stage counts and latency recompute by hand") {
    val row = q("q45_funnel_conversion").head()
    val evs = events
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC),
        r.getString(2)))
    val byUser = evs.groupBy(_._1)
    val firstFrom = byUser.flatMap { case (u, rs) =>
      val s = rs.filter(_._3 == "signup").map(_._2)
      if (s.isEmpty) None else Some(u -> s.min)
    }
    val firstTo = firstFrom.flatMap { case (u, fs) =>
      val p = byUser(u).filter(r => r._3 == "purchase" && !r._2.isBefore(fs))
        .map(_._2)
      if (p.isEmpty) None else Some(u -> (fs, p.min))
    }
    def us(i: java.time.Instant) =
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    assert(row.getLong(0) == byUser.size)
    assert(row.getLong(1) == firstFrom.size)
    assert(row.getLong(2) == firstTo.size)
    assert(row.getLong(3) ==
      firstTo.values.map { case (a, b) => us(b) - us(a) }.sum)
  }

  test("funnel stages are monotone and latency non-negative") {
    val row = q("q45_funnel_conversion").head()
    assert(row.getLong(0) >= row.getLong(1))
    assert(row.getLong(1) >= row.getLong(2))
    assert(row.getLong(3) >= 0L)
  }

  test("conversation dedup: clusters partition the conversations; canonical is a member") {
    val out = q("q46_conv_dedup_exact").collect()
    val users = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(out.map(_.getLong(1)).sum == users,
      "cluster sizes must sum to the conversation count")
    assert(out.map(_.getString(0)).distinct.length == out.length)
    // identical transcripts hash together: duplicate one conversation
    // under a fresh id and the cluster containing it must grow by one
    val dup = events.withColumn("user_id",
      when(col("user_id") === 0L, lit(100000L)).otherwise(col("user_id")))
    val merged = TranscriptQueries.convClusters(
      events.unionAll(dup.filter(col("user_id") === 100000L)),
      "user_id", "event_id", "event_type").collect()
    val grew = merged.map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grew.values.sum == users + 1)
    assert(grew.count { case (h, n) => base.get(h).exists(_ == n - 1) } == 1,
      "exactly one cluster must absorb the duplicated conversation")
  }

  test("props extraction: per-type sums recompute by hand") {
    val got = q("q47_props_json_stats").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = events.select(col("event_type"), col("props")).collect()
      .map { r =>
        val m = """"k":\s*(-?\d+)""".r.findFirstMatchIn(r.getString(1))
        (r.getString(0), m.map(_.group(1).toLong))
      }
      .groupBy(_._1).map { case (t, rs) =>
        val ks = rs.flatMap(_._2)
        t -> (ks.length.toLong, ks.sum)
      }
    assert(got == want)
  }

  test("context packing: chunks are contiguous, cover every turn, and respect the budget") {
    val out = q("q48_context_pack_conv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._3).sum == events.count(),
      "chunks must partition the turn stream")
    val budget = TranscriptQueries.ContextBudgetTokens
    val maxTok = events.select(max(length(col("event_type")))).head().getInt(0)
    out.groupBy(_._1).foreach { case (u, chunks) =>
      val nos = chunks.map(_._2).sorted.toSeq
      assert(nos == (0L until nos.length).toSeq,
        s"user $u chunk ordinals not contiguous from 0: $nos")
      // a chunk closes once the running total passes the budget, so it
      // can overshoot by at most one turn's tokens
      chunks.foreach { case (_, no, _, tok) =>
        assert(tok < budget + maxTok, s"user $u chunk $no size $tok")
      }
      // every chunk except the last must have CONSUMED the budget
      chunks.sortBy(_._2).dropRight(1).foreach { case (_, no, _, tok) =>
        assert(tok >= budget - maxTok + 1,
          s"user $u non-final chunk $no under-filled: $tok")
      }
    }
  }

  test("context packing plan: one exchange, one sort — rollup reuses the window partitioning") {
    val plan = TranscriptQueries.contextPack(events)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"whole operator should cost exactly one exchange, found $exchanges:\n$plan")
  }

  test("sessionization gap knob: a huge gap yields one session per actor") {
    val one = TranscriptQueries.sessionize(events, gapUs = Long.MaxValue)
    val users = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(one.count() == users)
    assert(one.select(max(col("session_no"))).head().getLong(0) == 1L)
  }

  test("transcript pack over a tagged lake table: assemble a pinned release in one call") {
    import graft.cdc.MergeApply
    import graft.gen.{ChangeLogGen, GenConfig}
    import graft.lake.LakeTable
    import graft.model.Schemas
    val t = LakeTable.createTable(spark, tmpDir("pack-tag"),
      Schemas.transcript, 4)
    val cfg = GenConfig(nEvents = 3000L, nConvs = 40L, maxTurns = 8)
    MergeApply.merge(t, ChangeLogGen.changeLogDF(spark, cfg), 0L)
    t.tag("release-1")
    val atTag = TranscriptPack.assemble(t, Some("release-1"))
      .collect().map(_.toSeq).toSet
    // the release equals an assembly over the tag-pinned raw read
    val expect = TranscriptQueries.assemble(
      t.read(Some(t.resolveRef("release-1"))), "conv_id", "turn_idx", "text")
      .collect().map(_.toSeq).toSet
    assert(atTag == expect)
    // more changes land after the tag: the pinned release must not move,
    // the current assembly must
    val more = ChangeLogGen.changeLogDF(spark,
      cfg.copy(nEvents = 1500L, seed = cfg.seed + 1))
    MergeApply.merge(t, more, 1L)
    assert(TranscriptPack.assemble(t, Some("release-1"))
      .collect().map(_.toSeq).toSet == atTag)
    assert(TranscriptPack.assemble(t).collect().map(_.toSeq).toSet != atTag)
    // the sibling pack calls run over the same pinned snapshot
    val sess = TranscriptPack.sessionize(t, Some("release-1"))
    assert(sess.columns.head == "conv_id" && sess.count() > 0)
    val packed = TranscriptPack.contextPack(t, Some("release-1"))
    assert(packed.columns.head == "conv_id" && packed.count() > 0)
    val js = TranscriptPack.conversationsJson(t, Some("release-1"))
    assert(js.count() == atTag.size) // one JSON document per conversation
  }
}
