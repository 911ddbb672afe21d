package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The curation pack: decontamination, hash splitting, dup clustering,
  * stratified sampling. Structural invariants here; value-exactness is
  * the driver's DuckDB oracle gate. */
class CurationSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("decontamination covers every training doc once; flags are consistent") {
    val out = q("q37_decontaminate").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val trainDocs = docs
      .filter(col("doc_id") % CurationQueries.EvalModulus =!= 0).count()
    assert(out.length == trainDocs)
    assert(out.forall { r =>
      val (grams, shared, flag) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      shared >= 0 && shared <= grams && flag == (shared > 0)
    })
    // the corpus plants near-dups, some of which straddle the eval cut —
    // decontamination must actually fire on this corpus
    assert(out.count(_.getBoolean(3)) > 0, "expected contaminated train docs")
  }

  test("decontamination: hashed-gram-key plan agrees with the string-key oracle twin") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def rows(hashed: Boolean) =
      CurationQueries.decontaminate(docs, hashedGramKey = hashed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
    assert(rows(hashed = true) == rows(hashed = false))
  }

  test("decontamination plan: gram strings never shuffle (broadcast join), no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = CurationQueries.decontaminate(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval grams not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"train grams shuffled through a join:\n$plan")
  }

  test("decontamination: oversized eval-gram set downgrades to a shuffle join, identical output") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def rows(cap: Long) =
      CurationQueries.decontaminate(docs, maxBroadcastGrams = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
    // cap 0 forces the fallback; with the session's auto-broadcast also
    // off, a BroadcastHashJoin in the plan could only come from the
    // (guarded) explicit hint — so its absence proves the downgrade
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = CurationQueries.decontaminate(docs, maxBroadcastGrams = 0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"guard did not downgrade the broadcast:\n$plan")
      assert(rows(0) == rows(Long.MaxValue),
        "shuffle fallback changed the decontamination output")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("oversized-eval fallback probes with a codegen'd expression, not a udf") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = CurationQueries.decontaminate(docs, maxBroadcastGrams = 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"fallback probe dropped out of codegen:\n$plan")
    assert(plan.contains("graft_bloom_probe"),
      s"bloom prefilter missing from the fallback plan:\n$plan")
    // the string-key variant runs the mightContainString generated path;
    // output must equal its broadcast twin (the join corrects the bloom,
    // so any divergence means a false NEGATIVE — a probe/build hash
    // mismatch)
    def rows(cap: Long) =
      CurationQueries.decontaminate(docs, hashedGramKey = false,
        maxBroadcastGrams = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
    assert(rows(0) == rows(Long.MaxValue),
      "string-key bloom fallback changed the decontamination output")
  }

  test("sequence packing: spans are block-width invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def spans(w: Int) = CurationQueries.sequencePack(docs, Some(w))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(spans(1) == spans(3),
      "block decomposition changed the packing — prefix sum broken")
    // the adaptive width keeps single-task sorts bounded at scale
    assert(CurationQueries.packHexWidth(500L) == 1)
    assert(CurationQueries.packHexWidth(10L * 1000 * 1000 * 1000) == 4)
    assert(CurationQueries.packHexWidth(Long.MaxValue) == 6)
  }

  test("hash split partitions the corpus; assignment is stable per doc") {
    val out = q("q38_hash_split").collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count())
    val bySplit = out.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit.keySet == Set("train", "val", "test"))
    // 80/10/10 within binomial slack on 500 docs
    assert(bySplit("train") > total * 6 / 10)
    // determinism: the same expression evaluated twice agrees row-for-row
    val again = q("q38_hash_split").collect().toSet
    assert(again == out.toSet)
  }

  test("dup clusters: labels cover all docs, canonical is the min member, closure matches pairs") {
    val out = q("q39_dup_clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(out.length == docs.count())
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (lbl, members) =>
      assert(members.map(_._1).min == lbl, s"canonical of $lbl not min member")
      assert(members.forall(_._3 == members.size))
    }
    // every near-dup pair ends up in one cluster (transitive closure)
    val lbl = out.map(t => t._1 -> t._2).toMap
    val pairs = CorpusQueries.exactNearDups(docs)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(lbl(a) == lbl(b)) }
    assert(byCluster.exists(_._2.size > 1), "expected non-trivial clusters")
  }

  test("sequence packing tiles the token stream with no gaps or overlaps") {
    val L = CurationQueries.PackSeqLen
    val out = q("q41_sequence_pack").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    // reconstruct each doc's absolute span and check the spans tile
    // [0, totalTokens) exactly — the packing is a permutation-free
    // concatenation, so any gap/overlap means the prefix sum is wrong
    val spans = out.map { case (_, n, sf0, _, off) =>
      val start = sf0 * L + off
      (start, start + n)
    }.sortBy(_._1)
    val total = out.map(_._2).sum
    assert(spans.head._1 == 0L)
    spans.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(e1 == s2, s"gap/overlap at $e1")
      case _ =>
    }
    assert(spans.last._2 == total)
    out.foreach { case (_, n, sf0, sl, off) =>
      assert(off >= 0 && off < L)
      assert(sl == (sf0 * L + off + n - 1) / L)
    }
  }

  test("stratified sample: rates honored per language, sample is deterministic") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("q40_sample_stratified").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = CurationQueries.SampleRates.toMap
    totals.foreach { case (lang, n) =>
      val r = rates.getOrElse(lang, CurationQueries.DefaultRate)
      val k = kept.getOrElse(lang, 0L)
      if (r == 100) assert(k == n, s"$lang should be kept whole")
      else {
        // binomial slack: ±4 sigma around n*r/100
        val exp = n * r / 100.0
        val sigma = math.sqrt(n * (r / 100.0) * (1 - r / 100.0))
        assert(math.abs(k - exp) <= 4 * sigma + 1,
          s"$lang kept $k of $n at rate $r%")
      }
    }
    // monotone: en's kept set at 25% is a subset of what 50% would keep
    import org.apache.spark.sql.types.{LongType, StringType}
    val h = conv(substring(md5(concat(lit("sample:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType) % 100
    val at25 = docs.filter(col("lang") === "en" && h < 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val at50 = docs.filter(col("lang") === "en" && h < 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(at25.subsetOf(at50))
  }
}
