package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Transcript-shaped operators over the event stream — the queries a
  * conversation-transcript pipeline runs constantly and the relational
  * pack did not yet cover. `user_id` plays `conv_id`, the unique monotone
  * `event_id` plays `turn_idx`, `event_type` plays the per-turn text.
  * Beyond the two flagship shapes below: q44 adjacent-turn transitions,
  * q45 funnel conversion, q46 conversation-level exact dedup, q47 JSON
  * props extraction, q48 per-conversation context packing.
  *
  *   - '''q42 ordered assembly''': reconstruct each conversation as one
  *     ordered document. This is the north rule's correctness invariant
  *     ("per-turn text equality under STABLE TURN ORDERING") expressed as
  *     a driver-checkable query: `user_id` plays `conv_id`, the unique
  *     monotone `event_id` plays `turn_idx`, `event_type` plays the
  *     per-turn text. Shape at scale: ONE hash aggregation keyed by the
  *     conversation id (collect_list runs as a partial+final
  *     ObjectHashAggregate — text bytes cross the wire exactly once, to
  *     the one reducer that owns the conversation), then a per-group
  *     O(k log k) `array_sort` — conversations are bounded (thousands of
  *     turns), so no global sort and no window exchange exists anywhere
  *     in the plan.
  *   - '''q43 sessionization''': split each actor's event stream into
  *     sessions at inactivity gaps. The reference ingests pre-sessionized
  *     Google-Analytics metrics and trusts the upstream session cut
  *     (reference: engine/payload/wprdc/g_analytics.py:30-33, 604-607);
  *     an engine owning raw events must compute the cut itself. Shape at
  *     scale: the WHOLE operator is one exchange + one sort — the `lag`
  *     window and the running boundary sum share partitioning and
  *     ordering (two WindowExec nodes over a single Sort; they cannot
  *     fuse because the sum consumes the lag's output), and the final
  *     per-session rollup needs no shuffle of its own because
  *     partitioning by `user_id` already clusters the `(user_id,
  *     session_no)` group keys.
  *     Gap comparisons are integer microseconds on both engines — no
  *     floating time arithmetic, no truncation-semantics mismatch with
  *     the oracle.
  */
object TranscriptQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Inactivity gap that closes a session (microseconds). 6 h: the event
    * corpus averages one event per actor every ~7 h, so the cut is
    * exercised in both directions (multi-event sessions AND singletons). */
  val SessionGapUs: Long = 6L * 3600 * 1000000

  /** Per-conversation ordered reassembly: `array_sort` over collected
    * (turn, text) structs — the unique turn id makes the order total, so
    * the nondeterministic collect_list arrival order can never leak into
    * the output. */
  def assemble(events: DataFrame, convCol: String, turnCol: String,
      textCol: String): DataFrame =
    events
      .groupBy(col(convCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(turnCol), col(textCol)))),
            x => x.getField(textCol)),
          "|").as("transcript"),
        count(lit(1)).as("n_turns"),
        max(col(turnCol)).as(s"last_$turnCol"))

  private val q42: Q = (s, d) =>
    assemble(t(s, d, "events"), "user_id", "event_id", "event_type")

  private val q42Sql =
    """SELECT user_id,
       string_agg(event_type, '|' ORDER BY event_id) AS transcript,
       COUNT(*) AS n_turns, MAX(event_id) AS last_event_id
       FROM events GROUP BY user_id"""

  /** Gap-based sessionization: a row opens a new session when it is the
    * actor's first event or arrives more than `gapUs` after the previous
    * one; the session ordinal is the running sum of those boundary flags.
    * Ties on `ts` are totally ordered by the unique event id, so the
    * window order (and therefore every downstream value) is
    * deterministic. */
  def sessionize(events: DataFrame, gapUs: Long = SessionGapUs): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs: Column = lag(col("ts"), 1).over(w)
    // the parquet ts is TIMESTAMP_NTZ — subtracting two NTZ values is a
    // pure wall-clock difference (an exact-micros day-time interval), so
    // the gap math never touches the session time zone. Casting to
    // TIMESTAMP first would make the cut DST-dependent for non-UTC
    // sessions (a 5.5 h wall gap across spring-forward is a 4.5 h
    // instant gap). The Duration literal carries gapUs exactly.
    val gap = lit(java.time.Duration.of(gapUs,
      java.time.temporal.ChronoUnit.MICROS))
    val boundary = when(
      prevTs.isNull || (col("ts") - prevTs) > gap,
      1).otherwise(0)
    events
      .withColumn("new_sess", boundary)
      .withColumn("session_no", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("sum_value"))
  }

  private val q43: Q = (s, d) => sessionize(t(s, d, "events"))

  /** Adjacent-turn transition matrix: for every consecutive event pair in
    * an actor's timeline, count (from_type → to_type) — the Markov "what
    * follows what" view a transcript pipeline uses for flow analysis and
    * for mining adjacent SFT pairs. Shape at scale: the `lead` window is
    * the same one exchange + one sort as [[sessionize]] (partition by
    * actor, order by time); the rollup groups on (from, to) — a SECOND
    * exchange, but over ≤ |types|² partial-aggregated rows per task, so
    * its shuffle is bytes, not data. Emitting the pairs themselves is the
    * same plan minus the rollup. */
  def turnTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  private val q44: Q = (s, d) => turnTransitions(t(s, d, "events"))

  private val q44Sql =
    """WITH p AS (
        SELECT event_type,
          lead(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS to_type
        FROM events)
      SELECT event_type AS from_type, to_type, COUNT(*) AS n_pairs
      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2"""

  /** Funnel conversion: of all actors, how many ever performed `fromType`,
    * how many then performed `toType` at-or-after their first `fromType`,
    * and the exact total first-touch latency. The reference ingests
    * pre-computed Google-Analytics conversion metrics and trusts the
    * upstream funnel (reference: engine/payload/wprdc/g_analytics.py
    * pageviews/events jobs); an engine owning raw events computes it.
    *
    * Shape at scale: two hash aggregations and one equi-join, ALL keyed by
    * the actor id — one shuffle lineage end to end (the join reuses the
    * aggregates' partitioning); the final single-row rollup is a
    * partial+final agg whose shuffle is bytes. No window, no sort, and no
    * scalar-subquery nested-loop anywhere. Latency is summed as exact
    * integer microseconds (the NTZ→UTC instant cast is pinned by the
    * session zone), so the result is bit-stable — no float accumulation
    * order can leak in. */
  def funnel(events: DataFrame, fromType: String = "signup",
      toType: String = "purchase"): DataFrame = {
    val base = events
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === fromType, col("ts")))
        .as("first_from"))
    val conv = events
      .filter(col("event_type") === toType)
      .select(col("user_id"), col("ts"))
      .join(base, Seq("user_id"))
      .where(col("ts") >= col("first_from"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_to"),
        min(col("first_from")).as("conv_from"))
    base
      .join(conv.select(col("user_id"), col("first_to"), col("conv_from")),
        Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_users"),
        count(col("first_from")).as("n_entered"),
        count(col("first_to")).as("n_converted"),
        coalesce(
          sum(unix_micros(col("first_to").cast(TimestampType)) -
            unix_micros(col("conv_from").cast(TimestampType))),
          lit(0L)).as("sum_latency_us"))
  }

  private val q45: Q = (s, d) => funnel(t(s, d, "events"))

  private val q45Sql =
    """WITH base AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_from
        FROM events GROUP BY user_id
      ), conv AS (
        SELECT e.user_id, MIN(e.ts) AS first_to, MIN(b.first_from) AS conv_from
        FROM events e JOIN base b USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= b.first_from
        GROUP BY e.user_id)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(COUNT(b.first_from) AS BIGINT) AS n_entered,
        CAST(COUNT(c.first_to) AS BIGINT) AS n_converted,
        CAST(COALESCE(SUM(epoch_us(c.first_to) - epoch_us(c.conv_from)), 0)
          AS BIGINT) AS sum_latency_us
      FROM base b LEFT JOIN conv c USING (user_id)"""

  /** Conversation-LEVEL exact dedup: fingerprint each conversation's
    * ordered assembled transcript and cluster identical conversations —
    * the whole-dialog twin of the document-level q24. A transcript corpus
    * dedupes at this granularity before training (replayed sessions,
    * re-scraped dialogs, forked agents land byte-identical conversations
    * under different ids).
    *
    * Shape at scale: the assembly aggregation ships each conversation's
    * text exactly once to the reducer owning the conversation id; from
    * there only 32-char hashes shuffle (the cluster rollup's keys), so
    * the second exchange is hash-width bytes per conversation regardless
    * of transcript size. No window, no sort, no join. */
  def convClusters(events: DataFrame, convCol: String, turnCol: String,
      textCol: String): DataFrame =
    assemble(events, convCol, turnCol, textCol)
      .select(col(convCol), md5(col("transcript")).as("tx_hash"))
      .groupBy(col("tx_hash"))
      .agg(count(lit(1)).as("cluster_size"),
        min(col(convCol)).as("canonical_id"))

  private val q46: Q = (s, d) =>
    convClusters(t(s, d, "events"), "user_id", "event_id", "event_type")

  private val q46Sql =
    """WITH tx AS (
        SELECT user_id,
          md5(string_agg(event_type, '|' ORDER BY event_id)) AS tx_hash
        FROM events GROUP BY user_id)
      SELECT tx_hash, CAST(COUNT(*) AS BIGINT) AS cluster_size,
        MIN(user_id) AS canonical_id
      FROM tx GROUP BY tx_hash"""

  /** Semi-structured props extraction: pull the typed field out of the
    * per-event JSON payload column and aggregate it per event type — the
    * reference's flat-JSON extractor surface (engine/wprdc_etl/pipeline/
    * extractors.py JSON path) applied INSIDE a query instead of at load
    * time, the way a transcript store queries tool-call metadata parked
    * in a JSON column.
    *
    * Shape at scale: `get_json_object` is a codegen'd per-row expression
    * (no UDF), nulls propagate for absent keys, and the rollup
    * partial-aggregates per task — the shuffle carries |event types|
    * rows, not data. */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  private val q47: Q = (s, d) => propsStats(t(s, d, "events"))

  private val q47Sql =
    """WITH x AS (
        SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events)
      SELECT event_type, CAST(COUNT(k) AS BIGINT) AS n_with_k,
        CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
      FROM x GROUP BY event_type"""

  /** Token budget for one packed context window (q48). Sized so the
    * ~40-turn test conversations split into several chunks AND single
    * turns never straddle multiple budgets. */
  val ContextBudgetTokens: Long = 64L

  /** Per-conversation context-window packing: split each conversation's
    * ordered turn stream into contiguous chunks that fit a token budget —
    * the step that turns raw transcripts into model-sized training
    * contexts. Chunk assignment is `floor(tokens_before_this_turn /
    * budget)`, so every turn lands in exactly one chunk, chunks are
    * contiguous in turn order, and the cut is a pure function of the
    * conversation prefix (append-only streams never re-chunk history).
    * Complements q41: that packs independent documents into fixed-length
    * sequences corpus-wide; this packs turns WITHIN each conversation,
    * preserving dialog order.
    *
    * Shape at scale: identical to [[sessionize]] — one exchange + one
    * sort (the running-sum window), with the per-chunk rollup reusing the
    * window's partitioning. Token counts here use the text length as the
    * deterministic proxy (the real tokenizer is q20's surface). */
  def contextPack(events: DataFrame,
      budget: Long = ContextBudgetTokens): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("tok", length(col("event_type")).cast(LongType))
      .withColumn("cum_before",
        coalesce(
          sum(col("tok")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("chunk_no", floor(col("cum_before") / lit(budget)))
      .groupBy(col("user_id"), col("chunk_no"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("tok")).as("chunk_tokens"),
        min(col("ts")).as("chunk_start"))
  }

  private val q48: Q = (s, d) => contextPack(t(s, d, "events"))

  private val q48Sql =
    s"""WITH t AS (
        SELECT user_id, ts, event_id,
          CAST(LENGTH(event_type) AS BIGINT) AS tok
        FROM events
      ), c AS (
        SELECT user_id, ts, tok,
          COALESCE(SUM(tok) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cum_before
        FROM t)
      SELECT user_id,
        CAST(FLOOR(cum_before / $ContextBudgetTokens) AS BIGINT) AS chunk_no,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(tok) AS BIGINT) AS chunk_tokens, MIN(ts) AS chunk_start
      FROM c GROUP BY 1, 2"""

  private val q43Sql =
    s"""WITH g AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $SessionGapUs
               THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), s AS (
        SELECT user_id, ts, value,
          SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
        FROM g)
      SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        COUNT(*) AS n_events, MIN(ts) AS session_start,
        MAX(ts) AS session_end,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM s GROUP BY user_id, session_no"""

  val queries: Map[String, Q] = Map(
    "q42_assemble_transcript" -> q42,
    "q43_sessionize" -> q43,
    "q44_turn_transitions" -> q44,
    "q45_funnel_conversion" -> q45,
    "q46_conv_dedup_exact" -> q46,
    "q47_props_json_stats" -> q47,
    "q48_context_pack_conv" -> q48)

  val oracles: Map[String, String] = Map(
    "q42_assemble_transcript" -> q42Sql,
    "q43_sessionize" -> q43Sql,
    "q44_turn_transitions" -> q44Sql,
    "q45_funnel_conversion" -> q45Sql,
    "q46_conv_dedup_exact" -> q46Sql,
    "q47_props_json_stats" -> q47Sql,
    "q48_context_pack_conv" -> q48Sql)
}
