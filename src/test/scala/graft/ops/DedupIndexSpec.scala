package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DedupIndex]] — incremental MinHash dedup against a persisted
  * signature index. The planted corpus: 12 docs in disjoint-vocabulary
  * families; three near-dup pairs (20-word texts differing in the last
  * word ⇒ jac = 15/17 ≈ 0.88, ~9σ above the 0.5 estimate threshold at 64
  * permutations), everything else pairwise disjoint (jac = 0). */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def text(f: Int, alt: Boolean): String = {
    val ws = (0 until 20).map(j => s"f${f}w$j").toArray
    if (alt) ws(19) = s"f${f}alt"
    ws.mkString(" ")
  }

  // near-dup pairs: (d00,d01) (d02,d03) (d04,d05); d06..d11 singletons
  private val corpus: Seq[(String, String)] =
    (0 until 3).flatMap(f => Seq(
      (f"d${2 * f}%02d", text(f, alt = false)),
      (f"d${2 * f + 1}%02d", text(f, alt = true)))) ++
      (6 until 12).map(i => (f"d$i%02d", text(i, alt = false)))

  private val plantedPairs =
    Set(("d00", "d01"), ("d02", "d03"), ("d04", "d05"))

  private def df(rows: Seq[(String, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def bands(docs: DataFrame): DataFrame =
    DedupIndex.bandRows(DedupIndex.signatures(
      docs.select(col("doc_id"),
        explode(DedupIndex.shingles(col("text"))).as("sh"))))

  private def pairSet(p: DataFrame): Set[(String, String)] =
    p.select("ida", "idb").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  /** Exact Jaccard >= 0.5 pairs, computed from scratch — the ground
    * truth the signature estimate must reproduce on this corpus. */
  private def exactPairs(docs: DataFrame): Set[(String, String)] = {
    val sh = docs.select(col("doc_id"),
      explode(DedupIndex.shingles(col("text"))).as("sh")).persist()
    try {
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val got = sh.select(col("doc_id").as("ida"), col("sh"))
        .join(sh.select(col("doc_id").as("idb"), col("sh").as("shb")),
          col("sh") === col("shb") && col("ida") < col("idb"))
        .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("shared"))
        .join(cnt.select(col("doc_id").as("ida"), col("n").as("na")), "ida")
        .join(cnt.select(col("doc_id").as("idb"), col("n").as("nb")), "idb")
        .filter(col("shared") * 3 >= col("na") + col("nb"))
      pairSet(got)
    } finally sh.unpersist()
  }

  test("candidate decomposition: self(A∪B) = self(A) ∪ self(B) ∪ cross(A,B)") {
    val (a, b) = corpus.splitAt(5) // splits the d04/d05 pair across sides
    val all = pairSet(DedupIndex.selfCandidates(bands(df(corpus))))
    val parts = pairSet(DedupIndex.selfCandidates(bands(df(a)))) ++
      pairSet(DedupIndex.selfCandidates(bands(df(b)))) ++
      pairSet(DedupIndex.crossCandidates(bands(df(a)), bands(df(b))))
    assert(all == parts)
    assert(plantedPairs.subsetOf(all))
  }

  test("incremental rounds over batches equal the one-shot batch run") {
    // batch boundaries exercise both pair topologies: (d00,d01) spans
    // rounds 1-2, (d02,d03) is within round 2, (d04,d05) within round 3
    val b1 = corpus.filter(r => Set("d00", "d06", "d07")(r._1))
    val b2 = corpus.filter(r => Set("d01", "d02", "d03", "d08")(r._1))
    val b3 = corpus.filterNot(r => (b1 ++ b2).map(_._1).contains(r._1))

    val incDir = tmpDir("ddx-inc")
    val inc = Seq(b1, b2, b3)
      .map(b => pairSet(DedupIndex.round(spark, incDir, df(b))))
      .reduce(_ ++ _)
    val oneShot =
      pairSet(DedupIndex.round(spark, tmpDir("ddx-one"), df(corpus)))
    assert(inc == oneShot)
    assert(inc == plantedPairs)
  }

  test("estimate-verified pairs equal exact-Jaccard pairs on this corpus") {
    val got = pairSet(DedupIndex.round(spark, tmpDir("ddx-est"), df(corpus)))
    assert(got == exactPairs(df(corpus)))
  }

  test("replayed round returns the same pairs and leaves the index sane") {
    val dir = tmpDir("ddx-replay")
    val b1 = corpus.take(6) // all three dup pairs
    val first = pairSet(DedupIndex.round(spark, dir, df(b1)))
    assert(first == plantedPairs)
    // crash-replay of the SAME batch: same pair set (its docs now also
    // sit in the index; dedup keeps the estimate join single-valued)
    val replay = DedupIndex.round(spark, dir, df(b1))
    assert(pairSet(replay) == plantedPairs)
    assert(replay.count() == plantedPairs.size) // no doubled rows
    // and a later round over fresh docs still behaves
    val b2 = corpus.drop(6)
    assert(pairSet(DedupIndex.round(spark, dir, df(b2))).isEmpty)
  }
}
