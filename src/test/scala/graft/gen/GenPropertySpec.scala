package graft.gen

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.SchemaRegistry
import graft.model.ChangeEvent

/** Property tests for the pure (non-Spark) kernels — the SURVEY.md §5
  * plan's permutation-invariance / idempotence / LWW laws, checked over
  * many seeded random instances (deterministic: no flaky seeds). The
  * Spark merge paths are pinned to the same laws by
  * MergeSpec/MorSpec/StreamSpec on concrete replays. */
class GenPropertySpec extends AnyFunSuite {

  private def cases(n: Int): Seq[GenConfig] = {
    val rnd = new scala.util.Random(20260817L)
    (0 until n).map { _ =>
      GenConfig(
        seed = rnd.nextLong().abs % 1000000L,
        nEvents = 1L + rnd.nextLong().abs % 4000L,
        nConvs = 2L + rnd.nextLong().abs % 50L,
        maxTurns = 10)
    }
  }

  private def delivered(cfg: GenConfig): Seq[ChangeEvent] =
    (0L until cfg.nEvents)
      .map(s => ChangeLogGen.eventAt(cfg, ChangeLogGen.deliveredLsn(cfg, s)))

  private def fold(events: Seq[ChangeEvent]): Map[(String, Int), ChangeEvent] =
    events.foldLeft(Map.empty[(String, Int), ChangeEvent]) { (m, e) =>
      val k = (e.conv_id, e.turn_idx)
      if (m.get(k).exists(_.lsn > e.lsn)) m else m + (k -> e)
    }

  test("slotToLsn is a bijection on [0, n) for arbitrary n (incl. n sharing factors with the multiplier)") {
    // 5² divides the base multiplier 0x2545F491|1: without the coprime
    // adjustment, n divisible by 5 silently drops/duplicates lsns
    val sizes = Seq(5L, 25L, 7L, 49L, 443L, 7L * 443L, 1000L, 4096L, 9999L)
    val cfg = GenConfig()
    sizes.foreach { n =>
      val image = (0L until n).map(s => ChangeLogGen.slotToLsn(cfg, s, n))
      assert(image.toSet.size == n, s"not bijective for n=$n")
      assert(image.forall(x => x >= 0 && x < n))
    }
  }

  test("LWW fold is order-independent: any permutation of delivery yields the same final state") {
    cases(25).zipWithIndex.foreach { case (cfg, i) =>
      val d = delivered(cfg)
      val shuffled = new scala.util.Random(i * 7919L).shuffle(d)
      assert(fold(shuffled) == fold(d), s"case $i: $cfg")
    }
  }

  test("replay idempotence: folding any prefix twice changes nothing") {
    cases(25).zipWithIndex.foreach { case (cfg, i) =>
      val d = delivered(cfg)
      val k = ((i * 37) % 100) * d.size / 100
      assert(fold(d ++ d.take(k)) == fold(d), s"case $i: $cfg")
    }
  }

  test("oracle matches a sort-by-lsn sequential application") {
    cases(15).foreach { cfg =>
      val seq = delivered(cfg).distinct.sortBy(_.lsn)
        .foldLeft(Map.empty[(String, Int), ChangeEvent]) { (m, e) =>
          m + ((e.conv_id, e.turn_idx) -> e) // ascending lsn: last write wins
        }
        .values.filter(_.op != "D")
        .map(e => graft.model.TranscriptRow(e.conv_id, e.turn_idx, e.role,
          e.text, e.tool, e.ts))
        .toSeq.sortBy(r => (r.conv_id, r.turn_idx))
      assert(seq == ChangeLogGen.oracleFinalState(cfg), cfg.toString)
    }
  }

  test("eventAt is pure: same (cfg, lsn) always yields the same event") {
    cases(50).foreach { cfg =>
      val lsn = cfg.seed % cfg.nEvents
      assert(ChangeLogGen.eventAt(cfg, lsn) == ChangeLogGen.eventAt(cfg, lsn))
    }
  }

  test("SchemaRegistry parses and round-trips add/widen payloads") {
    import org.apache.spark.sql.types._
    val add = SchemaRegistry.parse(
      """{"add":{"name":"score","type":"int","doc":"d"}}""")
    assert(add == SchemaRegistry.SchemaChange("add", "score", IntegerType, Some("d")))
    val widen = SchemaRegistry.parse("""{"widen":{"name":"score","type":"long"}}""")
    assert(widen == SchemaRegistry.SchemaChange("widen", "score", LongType, None))
    assertThrows[IllegalArgumentException](SchemaRegistry.parse("""{"nope":1}"""))
  }
}
