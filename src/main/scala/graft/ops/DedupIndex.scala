package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Incremental MinHash+LSH dedup against a persisted signature index —
  * the 100 TB shape of q26. Batch dedup re-signs the whole corpus every
  * run: O(corpus) per arrival. At a 10^10-doc corpus fed by a CDC-style
  * stream of new documents, the production shape is an INDEX: each doc is
  * signed once, its 16 band keys and 64-slot signature are appended to a
  * persistent index, and a new batch is deduplicated by (a) a self-join
  * within the batch and (b) one equi-join of the batch's band rows
  * against the index's — O(batch · bands + collisions) per round, never
  * O(corpus).
  *
  * The signature math here is THE definition — `CorpusQueries`' gated
  * q26 calls these same functions, so the incremental pair set equals the
  * batch pair set by construction, not by hoping two implementations
  * agree. The decomposition identity is also tested directly
  * (DedupIndexSpec): selfCandidates(A ∪ B) =
  * selfCandidates(A) ∪ selfCandidates(B) ∪ crossCandidates(A, B).
  *
  * Verification: at index scale the corpus text is not re-read, so
  * candidate pairs are verified with the 64-slot SIGNATURE estimate of
  * Jaccard (matching-slot fraction; unbiased, σ = √(J(1−J)/64) ≈ 0.06
  * worst-case — 64 permutations put a 0.5 threshold >5σ from both
  * planted-dup (≥0.9) and background (≤0.1) similarity). The estimate is
  * integer arithmetic (slot-match count vs ⌈τ·64⌉), bit-stable across
  * runs. Where the corpus supports keyed point reads, exact-Jaccard
  * re-verification of the emitted pairs is a downstream filter; the gated
  * batch q26 does exactly that. */
object DedupIndex {

  /** Signature length (MinHash permutations). */
  val MinhashK = 64

  /** LSH bands: 16 bands × 4 rows — collision threshold
    * ≈ (1/16)^(1/4) ≈ 0.5. */
  val Bands = 16
  val RowsPerBand: Int = MinhashK / Bands

  /** 64-permutation MinHash signatures over a (doc_id, sh) shingle frame:
    * min of xxhash64(shingle, seed_j) per doc — 64 partial-aggregating
    * mins in ONE hash-aggregate pass, no window, no sort. */
  def signatures(sh: DataFrame): DataFrame = {
    val sigAggs = (0 until MinhashK).map(j =>
      min(xxhash64(col("sh"), lit(j))).as(s"m$j"))
    sh.groupBy(col("doc_id"))
      .agg(sigAggs.head, sigAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until MinhashK).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** Banded index rows of a signature frame: (doc_id, band, bh) — one row
    * per band, bh = xxhash64 of the band's signature slice. */
  def bandRows(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
      explode(array((0 until Bands).map(b =>
        struct(lit(b).cast(IntegerType).as("band"),
          xxhash64(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand))
            .as("bh"))): _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bh"))

  /** Within-set band collisions: (ida, idb) with ida < idb. The q26
    * candidate generator. */
  def selfCandidates(bands: DataFrame): DataFrame =
    bands.as("x").join(bands.as("y"),
      col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
      .distinct()

  /** Cross-set band collisions — new batch vs index. Pair order is still
    * (ida < idb) regardless of which side a doc came from, so incremental
    * and batch pair sets are directly comparable. */
  def crossCandidates(indexBands: DataFrame, newBands: DataFrame)
      : DataFrame =
    newBands.as("x").join(indexBands.as("y"),
      col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") =!= col("y.doc_id"))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("ida"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("idb"))
      .distinct()

  /** Signature-estimated Jaccard of candidate pairs: matching-slot count
    * over [[MinhashK]], integer arithmetic with one final division.
    * `sigs` must cover every doc id appearing in `cand`. */
  def estJaccard(cand: DataFrame, sigs: DataFrame): DataFrame = {
    val a = sigs.select(col("doc_id").as("ida"), col("sig").as("siga"))
    val b = sigs.select(col("doc_id").as("idb"), col("sig").as("sigb"))
    cand.join(a, "ida").join(b, "idb")
      .withColumn("matches",
        aggregate(
          zip_with(col("siga"), col("sigb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, m) => acc + m))
      .select(col("ida"), col("idb"), col("matches"),
        (col("matches").cast("double") / lit(MinhashK)).as("est_jac"))
  }

  /** One incremental dedup round against the index at `dir`:
    * shingle + sign the new batch, pair it within itself and against the
    * index bands, keep pairs whose estimated Jaccard clears `tau`
    * (integer threshold ⌈τ·64⌉ slot matches), then append the batch's
    * band and signature rows to the index. Returns the verified pairs
    * (ida, idb, matches, est_jac).
    *
    * `newDocs` needs (doc_id, text); doc ids must be new to the index
    * (re-indexing an id only duplicates index rows — reads dedup them, so
    * a crashed-and-replayed round changes nothing, but steady re-feeding
    * wastes index space). The two index datasets live at `dir/bands` and
    * `dir/sigs` as plain parquet appends — at deployment scale both are
    * bucketable by doc_id, and the band join clusters on (band, bh)
    * either way. */
  def round(spark: SparkSession, dir: String, newDocs: DataFrame,
      tau: Double = 0.5): DataFrame = {
    // resolve scheme-less paths through the DEFAULT filesystem — the
    // same one Spark's parquet reader/writer uses for `dir` below.
    // Forcing file:// here would probe local disk while the index lives
    // on the cluster store, silently disabling cross-batch dedup.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bandsPath = s"$dir/bands"
    val sigsPath = s"$dir/sigs"
    val hasIndex = fs.exists(new org.apache.hadoop.fs.Path(bandsPath))

    val sh = newDocs
      .select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
      .persist()
    try {
      val sigs = signatures(sh).persist()
      try {
        val newBands = bandRows(sigs).persist()
        try {
          val cand =
            if (!hasIndex) selfCandidates(newBands)
            else {
              // crash-replay duplicates in the index need NO pre-dedup
              // here: a doubled band row only doubles a candidate pair,
              // and crossCandidates/the union both end in a pair-level
              // distinct. A .distinct() on the raw index would shuffle
              // the entire O(corpus x bands) index every round — the
              // exact cost this incremental path exists to avoid.
              val idxBands = spark.read.parquet(bandsPath)
              selfCandidates(newBands)
                .unionByName(crossCandidates(idxBands, newBands))
                .distinct()
            }
          // dedup AFTER the union: a replayed round's docs exist on both
          // sides, and a doubled signature row would double its pairs
          val allSigs =
            if (!hasIndex) sigs
            else sigs.unionByName(spark.read.parquet(sigsPath))
              .dropDuplicates("doc_id")
          val minMatches = math.ceil(tau * MinhashK).toInt
          val pairs = estJaccard(cand, allSigs)
            .filter(col("matches") >= lit(minMatches))
            .localCheckpoint(true)
          // sigs BEFORE bands: a crash between the writes must never
          // leave band rows whose signature is missing — estJaccard's
          // join would silently drop that doc's future cross pairs. A
          // sig without bands just means the doc pairs with nothing
          // until the round is replayed, which restores consistency
          // (reads dedup the replayed rows).
          sigs.write.mode("append").parquet(sigsPath)
          newBands.write.mode("append").parquet(bandsPath)
          pairs
        } finally newBands.unpersist()
      } finally sigs.unpersist()
    } finally sh.unpersist()
  }

  /** Distinct 5-word shingles of a text column — MUST stay identical to
    * the gated corpus queries' shingle definition (they share the
    * candidate math; a drift here would silently change the pair set). */
  def shingles(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val ws = split(lower(text), " ")
    array_distinct(transform(
      sequence(lit(1), greatest(lit(1), size(ws) - 4)),
      i => concat_ws(" ", slice(ws, i, lit(5)))))
  }
}
