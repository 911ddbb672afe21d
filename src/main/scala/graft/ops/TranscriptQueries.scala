package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Transcript-shaped operators over the event stream — the two queries a
  * conversation-transcript pipeline runs constantly and the relational
  * pack did not yet cover:
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
    "q44_turn_transitions" -> q44)

  val oracles: Map[String, String] = Map(
    "q42_assemble_transcript" -> q42Sql,
    "q43_sessionize" -> q43Sql,
    "q44_turn_transitions" -> q44Sql)
}
