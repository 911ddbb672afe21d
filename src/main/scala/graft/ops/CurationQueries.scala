package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators — the steps between "deduplicated corpus"
  * (q24-q27) and "training-ready dataset": benchmark decontamination,
  * deterministic train/val/test splitting, near-dup cluster
  * canonicalization, and stratified sampling. The reference has no
  * corpus tooling (its per-row Python standardizers are the closest
  * analog, reference: engine/payload/house_cat/_deduplicate.py:24-85);
  * these are the operations a large-scale LLM data pipeline runs daily,
  * expressed as distributed Catalyst plans with the same oracle-parity
  * discipline as [[CorpusQueries]]: integer arithmetic, deterministic
  * md5-derived hashing computable identically in DuckDB, no UDFs.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame =
    Spread(s.read.parquet(s"$d/documents.parquet"))

  private def wordsCol: Column = split(lower(col("text")), " ")

  /** Distinct n-word shingles; a doc shorter than n words contributes its
    * whole text as one shingle (same fallback as the 5-gram dedup set). */
  private def gramsCol(ws: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(lit(1), size(ws) - (n - 1))),
      i => concat_ws(" ", slice(ws, i, lit(n)))))

  /** doc_id -> uniform [0,100) bucket, deterministic and engine-portable:
    * first 8 md5 hex digits as an integer (DuckDB:
    * ('0x'||substr(md5(id::VARCHAR),1,8))::BIGINT). `salt` decorrelates
    * independent decisions (split vs sample) taken over the same ids. */
  private def hashPct(salt: String): Column =
    conv(substring(md5(concat(lit(salt), col("doc_id").cast(StringType))),
      1, 8), 16, 10).cast(LongType) % 100

  // ------------------------------------- q37 benchmark decontamination

  /** Span width of the contamination test: the GPT-3 paper's 13-gram
    * overlap rule — a training document is contaminated if any 13-token
    * span of it appears verbatim in the held-out benchmark suite. */
  val ContamGramWidth = 13

  /** Benchmark membership: every 13th doc_id stands in for the eval
    * suite (deterministic, so the oracle derives the same partition). */
  val EvalModulus = 13

  /** Broadcast ceiling for the eval-side distinct-gram set: 10⁷ keys ≈
    * 80 MB of xxhash64 longs (plus hashmap overhead) — comfortably under
    * a default driver/executor budget. A benchmark suite is ~10⁵ docs ≈
    * 10⁶-10⁷ grams, so the broadcast path is the norm; anything bigger
    * (someone "decontaminating" against half the corpus) downgrades to a
    * shuffle join instead of OOMing the driver. */
  val MaxBroadcastEvalGrams: Long = 10L * 1000 * 1000

  /** Benchmark decontamination over an arbitrary documents frame
    * (doc_id, text): per TRAINING document, how many of its distinct
    * 13-grams appear anywhere in the eval suite, and the contamination
    * flag (any overlap ⇒ drop before training).
    *
    * Scale shape: the eval suite's distinct-gram set is small —
    * benchmarks are ~10^5 documents even when the training corpus is
    * 10^10 — and with `hashedGramKey` (the gated default) it is a set of
    * 8-byte xxhash64 keys, explicitly broadcast; the training side then
    * streams through ONE broadcast-join + hash-aggregate pass: the gram
    * strings are never shuffled, never persisted, and each side's
    * tokenize+explode runs exactly once (the round-2 plan shuffled raw
    * 13-gram strings ~10× the corpus bytes and persisted the full
    * exploded train frame). `hashedGramKey = false` keeps the join on
    * the gram string — the oracle-literal twin the agreement test pins
    * against the hashed plan (a 64-bit xxhash64 collision between
    * distinct grams is the only possible divergence).
    *
    * The broadcast is GUARDED: the eval-side distinct-gram count is
    * probed first (one action over eval docs only — the train side is
    * untouched by the probe) and a set larger than `maxBroadcastGrams`
    * downgrades to a Bloom-prefiltered shuffle join with identical
    * OUTPUT (the prefilter is probabilistic, the join verifies every
    * survivor), instead of handing the driver an unbounded broadcast
    * build or exchanging the full exploded train side. The probe
    * recomputes the eval explode once (not worth a persist whose
    * release point the caller's lazy consumption would dictate). */
  def decontaminate(docsDf: DataFrame,
      hashedGramKey: Boolean = true,
      maxBroadcastGrams: Long = MaxBroadcastEvalGrams): DataFrame = {
    val isEval = col("doc_id") % EvalModulus === 0
    val grams = docsDf.select(col("doc_id"),
      explode(gramsCol(wordsCol, ContamGramWidth)).as("g"))
    val keyed =
      if (hashedGramKey) grams.select(col("doc_id"), xxhash64(col("g")).as("gk"))
      else grams.select(col("doc_id"), col("g").as("gk"))
    val evalGrams = keyed.filter(isEval).select(col("gk")).distinct()
    val evalSide = evalGrams.withColumn("__hit", lit(1))
    val nEval = evalGrams.count()
    if (nEval <= maxBroadcastGrams)
      // the normal shape: benchmark-sized eval set, ONE broadcast join +
      // hash aggregate over the streaming train side
      keyed.filter(!isEval)
        .join(broadcast(evalSide), Seq("gk"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_shared"))
        .select(col("doc_id"), col("n_grams"), col("n_shared"),
          (col("n_shared") > 0).as("contaminated"))
    else {
      // oversized eval set: a plain shuffle join would exchange the FULL
      // exploded train side (~10^13 gram rows at a 10^10-doc corpus). A
      // Bloom prefilter over the eval grams cuts the exchange to true
      // hits + the false-positive fraction: the filter is probabilistic,
      // the OUTPUT is exact — the join behind it verifies every survivor.
      // Sized at min(|eval|, 100M) expected items / 1% fpp (≈120 MB cap,
      // broadcast-safe); past the cap fpp degrades gracefully and the
      // join still corrects it. n_grams is counted join-free so the
      // prefilter can drop non-matching rows without losing the
      // denominator.
      val spark = docsDf.sparkSession
      val trainAll = keyed.filter(!isEval)
      val bloom = spark.sparkContext.broadcast(
        evalGrams.stat.bloomFilter("gk", math.min(nEval, 100L * 1000 * 1000),
          0.01))
      // codegen'd probe (graft.functions.BloomMightContain) — the train
      // scan stays inside whole-stage codegen; a Scala udf here would
      // box every gram key on the exact path that exists for 10^13 rows
      val probe = graft.functions.BloomMightContain.probe(spark, "gk", bloom)
      val nGrams = trainAll.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"))
      val shared = trainAll.filter(probe)
        .join(evalSide, Seq("gk"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      nGrams.join(shared, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
    }
  }

  private val q37: Q = (s, d) => decontaminate(docs(s, d))
  private val q37Sql =
    s"""WITH w AS (SELECT doc_id, string_split(lower(text),' ') ws FROM documents),
       i AS (SELECT doc_id, ws,
               unnest(range(1, greatest(1, len(ws)-${ContamGramWidth - 1}) + 1)) i
             FROM w),
       g AS (SELECT DISTINCT doc_id,
               array_to_string(ws[i:i+${ContamGramWidth - 1}], ' ') g FROM i),
       ev AS (SELECT DISTINCT g FROM g WHERE doc_id % $EvalModulus = 0),
       tr AS (SELECT doc_id, g FROM g WHERE doc_id % $EvalModulus != 0),
       sh AS (SELECT doc_id, count(*)::BIGINT n_shared FROM tr JOIN ev USING (g)
              GROUP BY 1)
       SELECT tr.doc_id, count(*)::BIGINT AS n_grams,
         coalesce(any_value(sh.n_shared), 0)::BIGINT AS n_shared,
         coalesce(any_value(sh.n_shared), 0) > 0 AS contaminated
       FROM tr LEFT JOIN sh ON sh.doc_id = tr.doc_id
       GROUP BY tr.doc_id"""

  // ------------------------------------ q38 deterministic hash splitting

  /** Train/val/test assignment by content-independent id hash — stable
    * under re-sharding, re-ordering, and incremental corpus growth (a
    * doc's split never changes when other docs arrive, unlike
    * randomSplit). 80/10/10; reported as per-split-per-source doc and
    * token counts, the numbers a dataset card publishes. Pure per-row
    * expressions + one hash aggregate — no shuffle of text. */
  private val q38: Q = (s, d) => {
    val h = hashPct("split:")
    val split = when(h < 80, "train").when(h < 90, "val").otherwise("test")
    docs(s, d)
      .select(split.as("split"), col("source"), size(wordsCol).as("toks"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("toks")).as("tokens"))
  }
  private val q38Sql =
    """WITH h AS (SELECT source,
         ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS p,
         len(string_split(lower(text), ' ')) AS toks
       FROM documents)
       SELECT CASE WHEN p < 80 THEN 'train' WHEN p < 90 THEN 'val'
                   ELSE 'test' END AS split,
         source, COUNT(*) AS docs, SUM(toks)::BIGINT AS tokens
       FROM h GROUP BY 1, 2"""

  // -------------------------------- q39 near-dup cluster canonicalization

  /** Near-dup clusters: connected components over the exact 5-gram
    * Jaccard pairs (q25's operator), labelling every document with its
    * cluster's canonical id (min member) and the cluster size — the
    * "keep one per cluster" decision dedup pipelines apply after pair
    * generation, closed over transitive chains (A~B, B~C ⇒ one cluster
    * even when A~C is below threshold).
    *
    * Scale shape: pair generation is the bucketed inverted-index join
    * (never all-pairs); components run on [[graft.spec.Linkage]]'s
    * size-adaptive solver — near-dup edge lists are tiny relative to the
    * corpus (only actual duplicates produce edges), so the driver
    * union-find + one broadcast join path covers real corpora, and the
    * distributed min-label propagation takes over past the edge
    * threshold. */
  private val q39: Q = (s, d) => {
    val dd = docs(s, d)
    val pairs = CorpusQueries.exactNearDups(dd)
      .select(col("ida"), col("idb"))
    val labels = graft.spec.Linkage.connectedComponents(
      dd.select(col("doc_id").as("id")), pairs)
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("canonical_id"),
        col("cluster_size"), (col("id") =!= col("lbl")).as("is_dup"))
  }
  private val q39Sql = {
    // the pair phase is q25's oracle verbatim (CorpusQueries.exactPairsSql)
    // wrapped as a CTE; the closure is the same recursive min-label CTE the
    // record-linkage oracle (q34) uses.
    s"""WITH pairs AS (${CorpusQueries.exactPairsSqlForOracle}),
       und AS (SELECT ida a, idb b FROM pairs UNION SELECT idb, ida FROM pairs),
       comp AS (
         WITH RECURSIVE r(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT u.b, r.lbl FROM r JOIN und u ON u.a = r.id)
         SELECT id, min(lbl) AS lbl FROM r GROUP BY id)
       SELECT c.id AS doc_id, c.lbl AS canonical_id,
         sz.n AS cluster_size, c.id != c.lbl AS is_dup
       FROM comp c JOIN (SELECT lbl, count(*)::BIGINT n FROM comp GROUP BY lbl) sz
         USING (lbl)"""
  }

  // ------------------------------------------ q40 stratified sampling

  /** Per-language sampling rates (percent kept). The shape every corpus
    * mix applies: downsample the dominant language, keep the long tail —
    * rates are deterministic per doc, so the sample is reproducible and
    * monotone (lowering a rate only removes docs, never swaps them). */
  val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 25, "de" -> 50, "es" -> 50, "fr" -> 50)
  val DefaultRate = 100

  /** Stratified deterministic sampling: keep a doc iff its id-hash
    * percentile falls under its language's rate. Emits the kept rows —
    * the actual downstream corpus, not just counts. Per-row filter, no
    * shuffle, no RNG state: the same doc set on any cluster layout. */
  private val q40: Q = (s, d) => {
    val rate = SampleRates.foldRight(lit(DefaultRate): Column) {
      case ((l, r), acc) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs(s, d)
      .filter(hashPct("sample:") < rate)
      .select(col("doc_id"), col("lang"), col("source"))
  }
  private val q40Sql = {
    val cases = SampleRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
    s"""SELECT doc_id, lang, source FROM documents
       WHERE ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100
             < CASE $cases ELSE $DefaultRate END"""
  }

  // ------------------------------------------ q41 sequence packing

  /** Target sequence length in (whitespace) tokens. */
  val PackSeqLen = 1024L

  /** Rows per prefix block the adaptive width targets: each block is one
    * task's local window sort, so this bounds the largest single-task
    * sort regardless of corpus size. */
  val PackTargetRowsPerBlock = 1000000L

  /** Hex-prefix width whose 16^w blocks keep ~[[PackTargetRowsPerBlock]]
    * rows per block. Capped at 6 (16.7M blocks — the driver prefix-sums
    * one long per PRESENT block, so the cap bounds that collect; 6 hex
    * chars covers ~1.6·10^13 docs at the target). */
  def packHexWidth(rows: Long): Int = {
    var w = 1
    while (w < 6 && (rows >> (4 * w)) > PackTargetRowsPerBlock) w += 1
    w
  }

  /** Fixed-length sequence packing (the GPT-style "concatenate the corpus
    * and chunk every L tokens" step that turns documents into training
    * sequences): each doc gets its token span [start, start+n_tok) in the
    * concatenation order, reported as first/last sequence id and offset.
    * The concatenation order is md5('pack:'||doc_id) — deterministic,
    * shuffle-free to define, and uniformly load-balanced.
    *
    * Scale shape — a distributed prefix sum, NOT a global window: an
    * ORDER BY over the corpus inside one window collapses to a single
    * task. Instead the order key's first w hex chars define 16^w
    * CONTIGUOUS blocks by construction (a prefix of the sort key — no
    * sampled range boundaries, so the block of a doc never depends on
    * the rest of the data): a per-block window computes local running
    * sums in parallel, the present blocks' totals prefix-sum on the
    * driver, and a broadcast join adds each block's base. Two hash
    * exchanges, one bounded collect. The width ADAPTS to the input
    * ([[packHexWidth]]): ~10^6 rows per block, so a 10^10-doc corpus
    * gets 65k blocks instead of 256 blocks of 4·10^7-row task sorts —
    * and the spans are width-invariant (the blocks partition the same
    * total order), which [[graft.ops]]' CurationSpec asserts by running
    * two widths. */
  def sequencePack(docsDf: DataFrame, hexWidth: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = docsDf.sparkSession
    // persisted: the tokenized base feeds the row count, the block-totals
    // action, and the windowed local prefix sums
    val base = docsDf.select(
      col("doc_id"), size(wordsCol).as("n_tok"),
      md5(concat(lit("pack:"), col("doc_id").cast(StringType))).as("h"))
      .persist()
    try {
      val width = hexWidth.getOrElse(packHexWidth(base.count()))
      val withPid = base.withColumn("pid",
        conv(substring(col("h"), 1, width), 16, 10).cast(LongType))
      val w = Window.partitionBy(col("pid")).orderBy(col("h"))
      val local = withPid.withColumn("lcum", sum(col("n_tok")).over(w))
      val totals = withPid.groupBy(col("pid"))
        .agg(sum(col("n_tok")).as("t")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      // base offset of each present block = sum of the preceding present
      // blocks' totals (absent blocks contribute nothing by definition)
      val bases =
        if (totals.isEmpty) Seq.empty[(Long, Long)]
        else totals.scanLeft((0L, 0L)) { case ((_, acc), (p, t)) =>
          (p, acc + t)
        }.sliding(2).map { case Array((_, acc), (p, _)) => (p, acc) }.toSeq
      val baseDf = s.createDataFrame(bases).toDF("pid", "base")
      local.join(broadcast(baseDf), "pid")
        .withColumn("cum", col("lcum") + col("base"))
        .selectExpr("doc_id", "n_tok",
          s"(cum - n_tok) div $PackSeqLen AS seq_first",
          s"(cum - 1) div $PackSeqLen AS seq_last",
          s"(cum - n_tok) % $PackSeqLen AS seq_offset")
        // materialize the per-doc spans before releasing the cache
        .localCheckpoint(true)
    } finally base.unpersist()
  }

  private val q41: Q = (s, d) => sequencePack(docs(s, d))
  private val q41Sql =
    s"""WITH t AS (SELECT doc_id, len(string_split(lower(text),' ')) n_tok,
             md5('pack:' || doc_id::VARCHAR) h FROM documents),
       c AS (SELECT doc_id, n_tok,
             (SUM(n_tok) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING))::BIGINT cum
             FROM t)
       SELECT doc_id, n_tok,
         (cum - n_tok) // $PackSeqLen AS seq_first,
         (cum - 1) // $PackSeqLen AS seq_last,
         (cum - n_tok) % $PackSeqLen AS seq_offset
       FROM c"""

  // ------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "q37_decontaminate" -> q37,
    "q38_hash_split" -> q38,
    "q39_dup_clusters" -> q39,
    "q40_sample_stratified" -> q40,
    "q41_sequence_pack" -> q41)

  val oracles: Map[String, String] = Map(
    "q37_decontaminate" -> q37Sql,
    "q38_hash_split" -> q38Sql,
    "q39_dup_clusters" -> q39Sql,
    "q40_sample_stratified" -> q40Sql,
    "q41_sequence_pack" -> q41Sql)
}
