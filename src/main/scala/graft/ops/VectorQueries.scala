package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label): embedding-cosine near-dup pairs, brute-force
  * cosine top-k (the exactness baseline), and a random-hyperplane-LSH
  * bucketed ANN variant (the scale path).
  *
  * Cross-engine determinism: embeddings are quantized to integers
  * (floor(x*1000 + 0.5), i.e. fixed-point milli-units — the same trick as
  * int8 quantization in production ANN systems). Dot products and squared
  * norms are then EXACT integer sums; cosine is a single IEEE double
  * division of exact operands, so Spark and DuckDB produce bit-identical
  * scores and identical rank orders. No float-summation-order hazards.
  *
  * The reference has no vector operators at all (its closest is the
  * haversine-ish distance at reference:
  * engine/payload/asset_map/_facet_hound.py:109-121); this pack is part of
  * the training-data pipeline surface the engine adds on top.
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  private def emb(s: SparkSession, d: String): DataFrame =
    Spread(s.read.parquet(s"$d/embeddings.parquet"))

  /** Fixed-point quantization: array<float> -> array<long> milli-units. */
  private def quant(c: Column): Column =
    transform(c, x => floor(x.cast(DoubleType) * 1000 + 0.5).cast(LongType))

  /** Exact integer dot product of two quantized vector columns (by
    * name) — the custom codegen'd Catalyst expression
    * [[graft.functions.DotProductLong]]; the zip_with/aggregate
    * formulation allocates a scratch array per evaluated pair, which
    * dominates all-pairs similarity joins. */
  private def dot(a: String, b: String): Column =
    graft.functions.GraftFunctions.dotLong(a, b)

  /** vec_id, q (quantized), nn (integer squared norm). */
  private def quantized(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    emb(s, d).select(col("vec_id"), quant(col("embedding")).as("q"))
      .withColumn("nn", dot("q", "q"))
  }

  private def cosine: Column =
    col("dot").cast(DoubleType) /
      sqrt(col("na").cast(DoubleType) * col("nb").cast(DoubleType))

  /** cosine >= 0.45, threshold evaluated in integer arithmetic:
    * dot/sqrt(na*nb) >= 0.45 <=> dot > 0 and 400*dot^2 >= 81*na*nb
    * (0.45^2 = 81/400). The Long form is exact but can WRAP for
    * large-norm inputs — Spark's non-ANSI multiply is silent, so a
    * genuinely similar pair would silently fail the filter (the DuckDB
    * oracle, by contrast, errors). By Cauchy-Schwarz dot^2 <= na*nb, so
    * both sides stay under 2^63 whenever na,nb < 1.5e8 (400*(1.5e8)^2 =
    * 9e18 < 2^63); above that bound — quantized norm ~12k, e.g.
    * unnormalized high-dimension embeddings — fall back to the double
    * comparison (53-bit mantissa: tie-exactness is lost only where the
    * integer form was already unsound). */
  private val SafeNormSq = 150000000L
  private def cosineAtLeast045: Column = {
    val safe = col("na") < SafeNormSq && col("nb") < SafeNormSq
    val d = (c: Column) => c.cast(DoubleType)
    col("dot") > 0 && when(safe,
      col("dot") * col("dot") * 400 >= col("na") * col("nb") * 81)
      .otherwise(
        d(col("dot")) * d(col("dot")) * 400d >= d(col("na")) * d(col("nb")) * 81d)
  }

  private val oracleQuantCte =
    """WITH e AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) q
       FROM embeddings),
       n AS (SELECT vec_id, q,
         list_aggregate(list_transform(q, x -> x*x), 'sum') nn FROM e)"""

  // ------------------------------------- q28 embedding-cosine near-dup

  /** All pairs with cosine >= 0.45 — embedding near-duplicate detection,
    * as the literal all-pairs comparison (a broadcast nested-loop
    * cartesian). TEST-SIDE ORACLE TWIN ONLY: it is never registered in
    * [[queries]] — a gated query must not carry a plan that broadcasts
    * the corpus to every task — but CorpusSpec proves the gated blocked
    * plan ([[q33]], also serving the q28 gate id) emits the identical
    * pair set. */
  def allPairsNearDups(s: SparkSession, d: String): DataFrame = {
    val v = quantized(s, d)
    val a = v.select(col("vec_id").as("ia"), col("q").as("qa"), col("nn").as("na"))
    val b = v.select(col("vec_id").as("ib"), col("q").as("qb"), col("nn").as("nb"))
    a.join(b, col("ia") < col("ib"))
      .withColumn("dot", dot("qa", "qb"))
      .withColumn("sim", cosine)
      .filter(cosineAtLeast045)
      .select(col("ia"), col("ib"), col("sim"))
  }
  private val q28Sql = oracleQuantCte +
    """
       , p AS (
         SELECT a.vec_id ia, b.vec_id ib,
           list_aggregate(list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i]), 'sum') dot,
           a.nn na, b.nn nb
         FROM n a JOIN n b ON a.vec_id < b.vec_id)
       SELECT ia, ib, dot::DOUBLE / sqrt(na::DOUBLE * nb::DOUBLE) AS sim
       FROM p WHERE dot > 0 AND dot * dot * 400 >= 81 * na * nb"""

  // ------------------------- q33 blocked exact near-dup (the scale path)

  /** Block-pair partitioning factor. At n vectors the join materializes
    * B(B+1)/2 block-pair groups of ~(n/B)² comparisons each; pick B so a
    * block (n/B rows × vector width) fits executor memory — B ~ 16-64 at
    * sf-scale, thousands at 10^9 vectors. */
  private val NearDupBlocks = 8

  /** Exact embedding near-dup pairs (same semantics + oracle as the
    * all-pairs baseline) via block-partitioned self-join — the
    * 10^9-vector formulation of the all-pairs comparison, and the plan
    * BOTH gate ids (q28, q33) execute. The literal
    * `a.join(b, ia < ib)` ([[allPairsNearDups]], test-only) plans as a
    * BroadcastNestedLoopJoin cartesian: the whole corpus broadcast to
    * every task, unbounded build memory. Here each vector is hashed into
    * one of B blocks, the B(B+1)/2 unordered block pairs become an
    * EQUI-join key (shuffle, no broadcast of the corpus, no driver
    * cartesian), and each block-pair group does its quadratic comparison
    * locally with bounded memory (two blocks) and an integer early-out
    * filter before the double division. This is the classic distributed
    * theta-join blocking: total compare count is unchanged (exactness
    * requires it) but the work is spread over B(B+1)/2 independent tasks
    * with replication factor B+1 — the shape that survives a 1000-executor
    * scale-up.
    *
    * Why not LSH here: measured on this corpus, background pair cosine is
    * ~N(0, 0.125) and the 0.45 threshold sits at θ≈63°, where sign-bit
    * collision probability is 0.65 vs 0.5 background — no AND-OR band
    * parameterization reaches recall≈1 (required: must match the exact
    * oracle) without admitting nearly all pairs as candidates
    * (e.g. 16 bands × 4 bits: recall 0.96, noise acceptance 0.64). Banded
    * LSH is the right candidate generator at production thresholds
    * (≥0.8, θ≤37°) — exactly the regime q26 exploits for shingle Jaccard
    * ≥0.5 — but at θ=63° the exact blocked join IS the scale path. */
  private val q33: Q = (s, d) => {
    import s.implicits._
    val v = quantized(s, d)
    val B = NearDupBlocks
    val blockPairs =
      (for { i <- 0 until B; j <- i until B } yield (i, j)).toDF("ba", "bb")
    val withBlk = v.withColumn("blk", pmod(hash(col("vec_id")), lit(B)))
    val aSide = withBlk.join(broadcast(blockPairs), col("blk") === col("ba"))
      .select(col("ba"), col("bb"), col("vec_id").as("ia"),
        col("q").as("qa"), col("nn").as("na"))
    val bSide = withBlk.join(broadcast(blockPairs), col("blk") === col("bb"))
      .select(col("ba"), col("bb"), col("vec_id").as("ib"),
        col("q").as("qb"), col("nn").as("nb"))
    aSide.join(bSide, Seq("ba", "bb"))
      // cross-block pairs appear exactly once (their blocks fix the roles);
      // same-block groups see both orders -> keep one
      .filter(col("ba") =!= col("bb") || col("ia") < col("ib"))
      .withColumn("dot", dot("qa", "qb"))
      .filter(cosineAtLeast045)
      .withColumn("sim", cosine)
      .select(least(col("ia"), col("ib")).as("ia"),
        greatest(col("ia"), col("ib")).as("ib"), col("sim"))
  }

  // ------------------- banded sign-LSH candidates (measured demonstrator)

  /** Random-hyperplane banded LSH candidate pairs over the quantized
    * embeddings — the q26 band pattern applied to vectors, as a PUBLIC
    * parameterized operator. Hyperplanes are deterministic (murmur3 of
    * (plane, dim)), signature bit j = sign(q·h_j), bands of `rowsPerBand`
    * bits become equi-join keys.
    *
    * This exists to MEASURE, not to serve q33: on this corpus the 0.45
    * threshold sits at θ≈63° where sign-bit agreement is 0.65 vs 0.5
    * background, and CorpusSpec's demonstrator test records the result —
    * recall below 1 with a large candidate fraction — which is exactly
    * why the exact blocked join (q33) is the scale path at this
    * operating point and banded LSH belongs to the ≥0.8-threshold
    * regime. */
  def signLshCandidates(s: SparkSession, d: String, bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val v = quantized(s, d)
    val dim = emb(s, d).select(size(col("embedding"))).first().getInt(0)
    val nBits = bands * rowsPerBand
    val planes: Seq[Seq[Long]] = Seq.tabulate(nBits, dim) { (j, i) =>
      (scala.util.hashing.MurmurHash3.productHash((j, i)) % 1001).toLong
    }
    val bits = transform(typedLit(planes), h =>
      when(aggregate(zip_with(col("q"), h, (x, y) => x * y),
        lit(0L), (a, x) => a + x) > 0, lit(1L)).otherwise(lit(0L)))
    val banded = v.withColumn("__bits", bits)
      .select(col("vec_id"), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          aggregate(slice(col("__bits"), b * rowsPerBand + 1, rowsPerBand),
            lit(0L), (acc, x) => acc * 2 + x).as("bv"))): _*)).as("e"))
      .select(col("vec_id"), col("e.band"), col("e.bv"))
      .persist()
    // materialize the self-join BEFORE releasing the cache (the exactNearDups
    // pattern): a public operator must not leak cached blocks for the life
    // of the session — direct callers have no bench harness clearing caches
    EagerRelease(
      banded.as("x")
        .join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("ia"), col("y.vec_id").as("ib"))
        .distinct(),
      banded)
  }

  // ------------------------------------------- q29 brute-force kNN top-k

  private val NQueries = 16
  private val TopK = 5

  /** Exact cosine top-5 for the query set (vec_id < 16), self excluded.
    * Deterministic total order: (sim DESC, neighbor id ASC) on exact
    * doubles. The top-k is a per-query window over the candidate scores —
    * at scale this is rank-pruned per partition (partial top-k before the
    * shuffle via Spark's TakeOrderedAndProject when k is small). */
  private val q29: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val v = quantized(s, d)
    val qs = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nn").as("na"))
    val cands = v.select(col("vec_id").as("neighbor_id"), col("q").as("qc"),
      col("nn").as("nb"))
    // stream the corpus, broadcast the tiny query set (left to itself
    // Spark builds the corpus side — fatal at 10^9 vectors)
    val scored = cands.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dot("qq", "qc"))
      .withColumn("sim", cosine)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
  private val q29Sql = oracleQuantCte +
    s"""
       , scored AS (
         SELECT a.vec_id query_id, b.vec_id neighbor_id,
           list_aggregate(list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i]), 'sum')::DOUBLE
             / sqrt(a.nn::DOUBLE * b.nn::DOUBLE) AS sim
         FROM n a JOIN n b ON a.vec_id < $NQueries AND a.vec_id <> b.vec_id)
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
         FROM scored)
       WHERE rank <= $TopK"""

  // ----------------------------------------------------- q30 IVF ANN

  private val IvfCells = 16
  private val IvfProbes = 3
  private val KmeansIters = 2

  /** Approximate top-5 per query via an IVF (inverted-file) index: a
    * k-means coarse quantizer (k=16 cells, 2 Lloyd iterations, seeded
    * with the first k vectors) partitions the corpus into cells; each
    * query scores only the vectors in its `nprobe`=3 nearest cells.
    *
    * Scale shape: the index build is the O(n·k) assignment computed as a
    * per-row fold over a k-entry centroid literal — no join, no window,
    * no shuffle (an n×k cross join + per-vector argmin window would
    * shuffle n×k rows into billions of single-vector groups at 10^9
    * vectors); the search is a bucket-equi-join on cell id (shuffle on
    * cell, never a cross join), touching ~n·nprobe/k of the corpus per
    * query. k scales as ~sqrt(n) at 10^9 vectors (past literal size,
    * the centroid table rides a broadcast variable inside the same
    * fold expression).
    *
    * Determinism: centroids are computed in exact integer fixed-point
    * (sum of quantized coords is an exact long in any partition order;
    * centroid = (1000·sum)/count integer division), and
    * distances/scores are exact integer arithmetic — so the output is
    * bit-stable across runs, partitionings, and cluster sizes. That
    * bit-stability is what gives an APPROXIMATE operator a real SQL
    * oracle: [[q30Sql]] unrolls the identical algorithm in DuckDB and
    * the driver hash-compares the two (CorpusSpec additionally measures
    * recall ≥ 0.85 vs the q29 brute-force baseline). */
  private val q30: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // v feeds the k-means iterations (each a collect) and the assigned
    // frame; both are released before return — the result rides an eager
    // localCheckpoint, so no RDD blocks outlive the query (Verify runs
    // all 48 queries in one session).
    val v = quantized(s, d).persist()
    try {
    val dim = emb(s, d).select(size(col("embedding"))).first().getInt(0)
    // q scaled to match centroid fixed-point (×1000)
    val scaled = v.withColumn("qs", transform(col("q"), _ * 1000))

    // --- index build: seeded k-means in integer fixed-point. Centroids
    // are collected to the driver each iteration (k x dim longs — tiny)
    // and re-enter the plan as ONE array literal, so both assignment and
    // probing are pure per-row expressions: the nearest/nearest-3 cells
    // come from a fold over the k candidate cells INSIDE the row — no
    // n×k cross join, no per-vec_id window (that shape shuffles n×k rows
    // into billions of single-vector window groups at 10^9 vectors; this
    // one shuffles nothing at all).
    import s.implicits._
    var centroids: Seq[(Int, Seq[Long])] =
      v.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").cast(IntegerType),
          transform(col("q"), _ * 1000))
        .as[(Int, Seq[Long])].collect().toSeq
    // array<struct<_1:cell, _2:coords>> literal, cell-ascending
    def centLit = typedLit(centroids.sortBy(_._1))
    // per-row distances to every cell as struct(dist, cell) — natural
    // struct ordering sorts by (dist asc, cell asc), the deterministic
    // tie-break the window formulation used
    def cellDists = transform(centLit, cen => struct(
      aggregate(zip_with(col("qs"), cen.getField("_2"),
        (x, y) => (x - y) * (x - y)), lit(0L), (a, x) => a + x).as("dist"),
      cen.getField("_1").as("cell")))
    def assign(src: DataFrame): DataFrame =
      src.withColumn("cell",
          element_at(array_sort(cellDists), 1).getField("cell"))
        .select(col("vec_id"), col("q"), col("nn"), col("qs"), col("cell"))
    for (_ <- 0 until KmeansIters) {
      val sums = (0 until dim).map(i =>
        sum(element_at(col("q"), i + 1)).as(s"s$i"))
      centroids = assign(scaled).groupBy(col("cell"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .select(col("cell"), array((0 until dim).map(i =>
          expr(s"(s$i * 1000) div cnt")): _*).as("c"))
        .as[(Int, Seq[Long])].collect().toSeq
    }
    val assigned = assign(scaled).persist()

    // --- search: probe the nprobe nearest cells per query (same per-row
    // fold; the nprobe cells are the sorted prefix)
    val probed = assigned.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("nn").as("na"), col("qs"))
      .withColumn("__p", explode(slice(array_sort(cellDists), 1, IvfProbes)))
      .select(col("query_id"), col("qq"), col("na"),
        col("__p.cell").as("cell"))
    val cands = assigned.select(col("vec_id").as("neighbor_id"),
      col("q").as("qc"), col("nn").as("nb"), col("cell"))
    val scored = probed.join(cands, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dot("qq", "qc"))
      .withColumn("sim", cosine)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    EagerRelease(
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim")),
      assigned)
    } finally v.unpersist()
  }

  /** The q30 oracle: the LITERAL IVF pipeline — quantize, seeded integer
    * k-means unrolled [[KmeansIters]] times, assign, probe the
    * [[IvfProbes]] nearest cells, exact top-[[TopK]] — in DuckDB SQL,
    * generated from the same constants as the Spark plan so the two can
    * never drift. Possible because every step is exact integer
    * arithmetic with one final IEEE division (the bit-stability the
    * Spark scaladoc documents); tie-breaks are (dist asc, cell asc) and
    * (sim desc, neighbor asc) in both. */
  private def q30Sql: String = {
    def assignCte(name: String, cent: String, filter: String = ""): String =
      s"""$name AS (SELECT vec_id, q, nn, qs, cell FROM (
         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) rn FROM (
           SELECT v.vec_id, v.q, v.nn, v.qs, ct.cell,
             list_aggregate(list_transform(range(1, len(v.qs)+1),
               i -> (v.qs[i]-ct.c[i])*(v.qs[i]-ct.c[i])), 'sum') dist
           FROM v, $cent ct $filter)) WHERE rn = 1)"""
    def centCte(name: String, asg: String): String =
      s"""$name AS (
         SELECT cell, list((s*1000) // cnt ORDER BY i) c FROM (
           SELECT cell, i, sum(qv) s, count(*) cnt FROM (
             SELECT cell, unnest(q) qv, unnest(range(1, len(q)+1)) i FROM $asg)
           GROUP BY cell, i)
         GROUP BY cell)"""
    val iterCtes = (0 until KmeansIters).flatMap(k =>
      Seq(assignCte(s"a$k", s"c$k"), centCte(s"c${k + 1}", s"a$k")))
    val finalCent = s"c$KmeansIters"
    s"""WITH e AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) q
       FROM embeddings),
       n AS (SELECT vec_id, q, list_aggregate(list_transform(q, x -> x*x), 'sum') nn FROM e),
       v AS (SELECT vec_id, q, nn, list_transform(q, x -> x*1000) qs FROM n),
       c0 AS (SELECT vec_id::INT cell, qs c FROM v WHERE vec_id < $IvfCells),
       ${iterCtes.mkString(",\n       ")},
       ${assignCte("afinal", finalCent)},
       probes AS (SELECT vec_id query_id, q qq, nn na, cell FROM (
         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) rn FROM (
           SELECT v.vec_id, v.q, v.nn, ct.cell,
             list_aggregate(list_transform(range(1, len(v.qs)+1),
               i -> (v.qs[i]-ct.c[i])*(v.qs[i]-ct.c[i])), 'sum') dist
           FROM v, $finalCent ct WHERE v.vec_id < $NQueries)) WHERE rn <= $IvfProbes),
       cands AS (SELECT vec_id neighbor_id, q qc, nn nb, cell FROM afinal),
       scored AS (SELECT p.query_id, c.neighbor_id,
           list_aggregate(list_transform(range(1, len(p.qq)+1), i -> p.qq[i]*c.qc[i]), 'sum')::DOUBLE
             / sqrt(p.na::DOUBLE * c.nb::DOUBLE) sim
         FROM probes p JOIN cands c USING (cell)
         WHERE p.query_id <> c.neighbor_id)
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) rank
         FROM scored)
       WHERE rank <= $TopK"""
  }

  val queries: Map[String, Q] = Map(
    // q28's gate id executes the BLOCKED plan: no gated query carries a
    // cartesian. The literal all-pairs formulation survives as the
    // test-side oracle twin ([[allPairsNearDups]], CorpusSpec agreement).
    "q28_dedup_embedding_cosine" -> q33,
    "q29_knn_brute_cosine" -> q29,
    "q30_knn_ann_ivf" -> q30,
    "q33_dedup_embedding_blocked" -> q33)

  val oracles: Map[String, String] = Map(
    "q28_dedup_embedding_cosine" -> q28Sql,
    "q29_knn_brute_cosine" -> q29Sql,
    // the IVF plan is bit-stable integer arithmetic end-to-end, so it
    // has a real oracle: the same algorithm unrolled in SQL
    "q30_knn_ann_ivf" -> q30Sql,
    // q33 computes the identical pair set through the blocked plan —
    // same exact oracle as q28
    "q33_dedup_embedding_blocked" -> q28Sql)
}
