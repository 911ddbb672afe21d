package graft.spec

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Entity resolution ([[Linkage.resolveEntities]]): candidate-key link
  * graph, connected components, total-ordered field merge — the engine's
  * permutation-invariant replacement for the reference's order-dependent
  * pairwise merge (reference:
  * engine/payload/house_cat/_deduplicate.py:869-998). */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("rid", "phone", "email", "name")

  test("transitive chain across different candidate keys") {
    // a-b share phone, b-c share email: a and c share nothing directly
    val recs = Seq(
      ("a", "555", null, "Ann Smith"),
      ("b", "555", "x@y.z", null),
      ("c", null, "x@y.z", "A. Smith"),
      ("d", "777", null, "Unrelated")).toDF(cols: _*)
    val out = Linkage.resolveEntities(recs, "rid", Seq("phone", "email"))
      .orderBy("canonical_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4)))
    assert(out.toSeq == Seq(
      // name conflict -> sorted '|'-join; phone/email single-valued
      ("a", 3L, "555", "x@y.z", "A. Smith|Ann Smith"),
      ("d", 1L, "777", null, "Unrelated")))
  }

  test("long chain converges (diameter > 2) and labels reach the min id") {
    // path graph r0-r1-...-r5: adjacent pairs share a value, alternating
    // between the two key columns, so no non-adjacent pair links directly
    val recs = Seq(
      ("r0", "s0", null: String),
      ("r1", "s0", "s1"),
      ("r2", "s2", "s1"),
      ("r3", "s2", "s3"),
      ("r4", "s4", "s3"),
      ("r5", "s4", null: String)).toDF("rid", "ka", "kb")
    val out = Linkage.resolveEntities(recs, "rid", Seq("ka", "kb"))
    assert(out.count() == 1L)
    assert(out.select("canonical_id").as[String].head() == "r0")
    assert(out.select("n_members").as[Long].head() == 6L)
  }

  test("driver union-find and distributed propagation label identically") {
    val recs = Seq(
      ("a", "555", null: String, "Ann"),
      ("b", "555", "x@y.z", null: String),
      ("c", null: String, "x@y.z", "A."),
      ("d", "777", null: String, "Solo")).toDF(cols: _*)
    def run(limit: Long) =
      Linkage.resolveEntities(recs, "rid", Seq("phone", "email"),
          broadcastEdgeLimit = limit)
        .orderBy("canonical_id").collect().toSeq.map(_.toSeq)
    assert(run(4000000L) == run(0L)) // fast path == iterative path
  }

  test("curated forced-link edges merge records sharing no key") {
    val recs = Seq(
      ("a", "111", null, "Left"),
      ("b", "222", null, "Right")).toDF(cols: _*)
    val unforced = Linkage.resolveEntities(recs, "rid", Seq("phone", "email"))
    assert(unforced.count() == 2L)
    val forced = Seq(("a", "b")).toDF("ida", "idb")
    val out = Linkage.resolveEntities(recs, "rid", Seq("phone", "email"),
      forcedEdges = Some(forced)).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "a" && out.head.getLong(1) == 2L)
    assert(out.head.getString(4) == "Left|Right")
  }

  test("components match a brute-force closure on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 20 + rnd.nextInt(20)
      val edges = (0 until n).flatMap { _ =>
        val (a, b) = (rnd.nextInt(n), rnd.nextInt(n))
        if (a == b) None else Some((s"n${math.min(a, b)}", s"n${math.max(a, b)}"))
      }.distinct
      val nodes = (0 until n).map(i => s"n$i")
      // in-test oracle: repeated relaxation until fixpoint
      val lbl = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = Ordering[String].min(lbl(a), lbl(b))
          if (lbl(a) != m) { lbl(a) = m; changed = true }
          if (lbl(b) != m) { lbl(b) = m; changed = true }
        }
      }
      val nodesDf = nodes.toDF("id")
      val edgesDf = edges.toDF("ida", "idb")
      Seq(0L, 1000000L).foreach { limit => // both paths
        val got = Linkage.connectedComponents(nodesDf, edgesDf,
            maxIter = 100, broadcastEdgeLimit = limit)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(got == lbl.toMap, s"limit=$limit n=$n")
      }
    }
  }

  test("all-null string field merges to null, not empty string") {
    val recs = Seq(
      ("a", "555", null: String, null: String),
      ("b", "555", null: String, null: String)).toDF(cols: _*)
    val out = Linkage.resolveEntities(recs, "rid", Seq("phone")).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(3) && out.head.isNullAt(4))
  }

  test("non-string conflicts take max; edges deduped across shared keys") {
    val recs = Seq(
      ("a", "555", "e@e", 10L),
      ("b", "555", "e@e", 25L)). // share BOTH keys -> still one edge
      toDF("rid", "phone", "email", "score")
    val out = Linkage.resolveEntities(recs, "rid", Seq("phone", "email"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("score") == 25L)
  }
}
