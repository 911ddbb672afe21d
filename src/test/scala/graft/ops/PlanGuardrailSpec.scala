package graft.ops

import graft.SparkSpec

/** Scale guardrail over every gated query: no physical plan may contain
  * an unbounded all-pairs join. The round-2 review's top finding was a
  * cartesian hiding behind a gate id (q28's broadcast-nested-loop
  * all-pairs plan, since replaced by the blocked equi-join) — this spec
  * makes that class of regression impossible to ship silently.
  *
  * Two nodes are banned outright:
  *  - `CartesianProduct`: always O(|L|·|R|) with both sides shuffled.
  *  - `BroadcastNestedLoopJoin`: O(|stream|·|broadcast|) AND ships the
  *    broadcast side to every task — fatal when that side grows with
  *    the corpus.
  *
  * A BNLJ is tolerated only where the broadcast side is bounded by a
  * CONSTANT independent of table size, each entry justified here:
  *  - q14_incremental_time_gap: the broadcast side is a 1-row aggregate
  *    (`max(ts)`) — the scalar-subquery shape (JobSpec.TimeField.timeGap).
  *  - q29_knn_brute_cosine: the broadcast side is the fixed 16-row query
  *    set; the corpus streams (the plan Spark builds unaided — corpus
  *    broadcast — is the fatal one, and the explicit `broadcast(qs)`
  *    hint exists precisely to forbid it).
  * The whitelist is asserted EXACT in both directions: a fix that
  * removes a listed BNLJ must also remove its entry, so the list can
  * never accumulate stale justifications.
  */
class PlanGuardrailSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val boundedBnlj = Map(
    "q14_incremental_time_gap" -> "1-row max(ts) aggregate broadcast",
    "q29_knn_brute_cosine" -> "fixed 16-row query-set broadcast")

  test("cached-frame discipline: the persisting queries release every cache on return") {
    // the r3 verdict's leak class: shingleRows/banded/v/assigned were
    // df.persist()ed and never unpersisted — Verify runs 48 queries in
    // one session, so each leak held blocks for the session's life.
    // The queries now materialize their result via an eager
    // localCheckpoint and unpersist in try/finally, so the ONLY
    // persistent RDDs a query may add are its checkpoint blocks (one
    // per materializeAndRelease/localCheckpoint call — bounded and
    // small), never the data-sized cached intermediates.
    assume(new java.io.File(sfDir).isDirectory)
    val sc = spark.sparkContext
    for ((name, maxCheckpointRdds) <- Seq(
        "q25_dedup_ngram_jaccard" -> 1, // result checkpoint
        "q26_dedup_minhash_lsh" -> 1, // result checkpoint
        "q27_dedup_simhash" -> 2, // candidate + result checkpoints
        "q30_knn_ann_ivf" -> 1)) { // result checkpoint
      val before = sc.getPersistentRDDs.keySet
      graft.SparkEntry.queries(name)(spark, sfDir)
      val added = sc.getPersistentRDDs.keySet -- before
      assert(added.size <= maxCheckpointRdds,
        s"$name left ${added.size} persistent RDDs (max $maxCheckpointRdds " +
          "checkpoint blocks expected) — a persist() lost its unpersist")
    }
  }

  test("no gated query plans a cartesian or an unbounded nested-loop join") {
    assume(new java.io.File(sfDir).isDirectory)
    // inspect the REAL plans: eagerly checkpointed results would show an
    // opaque `Scan ExistingRDD` and exempt everything upstream of the
    // checkpoint from this guardrail
    val plans =
      try {
        EagerRelease.enabled = false
        graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
          case (name, fn) =>
            name -> fn(spark, sfDir).queryExecution.executedPlan.toString
        }
      } finally EagerRelease.enabled = true
    val cartesians = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(cartesians.isEmpty,
      s"CartesianProduct in gated plans: ${cartesians.mkString(", ")}")

    val bnlj = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") => n
    }.toSet
    val unexpected = bnlj -- boundedBnlj.keySet
    assert(unexpected.isEmpty,
      s"unjustified BroadcastNestedLoopJoin in gated plans: " +
        s"${unexpected.mkString(", ")} — either rewrite as an equi-join " +
        "or add a bounded-side justification to the whitelist")
    val stale = boundedBnlj.keySet -- bnlj
    assert(stale.isEmpty,
      s"stale BNLJ whitelist entries (plan no longer has one): " +
        s"${stale.mkString(", ")}")
  }
}
