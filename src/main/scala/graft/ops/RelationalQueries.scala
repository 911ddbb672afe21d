package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec.{FilterDsl, Projection}

/** Relational operator surface (SURVEY.md §2.3-§2.9), one driver-checkable
  * query per operator family, each with an ANSI-SQL oracle DuckDB runs on
  * the same parquet.
  *
  * Determinism rules used throughout so the Spark result hashes equal to
  * the DuckDB oracle:
  *   - money/metric sums go through DECIMAL (exact) and only the final
  *     value is cast to DOUBLE — double summation order is engine-dependent,
  *     decimal summation is exact;
  *   - divisions happen on already-exact operands (IEEE division is
  *     deterministic);
  *   - every top-k has a total tiebreak order.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // q01: group-by aggregation (reference does pandas groupby+sum,
  // reference: engine/payload/wprdc/g_analytics.py:149-159)
  private val q01: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast(DoubleType).as("sum_price"),
        (sum(col("l_discount").cast("decimal(18,4)")).cast(DoubleType) /
          count(lit(1))).as("avg_disc"),
        count(lit(1)).as("n"))
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS n
       FROM lineitem GROUP BY l_returnflag, l_linestatus"""

  // q02: the job-level row-filter DSL compiled to Catalyst predicates
  // (reference: engine/wprdc_etl/pipeline/pipeline.py:212-245)
  private val q02: Q = (s, d) =>
    FilterDsl(t(s, d, "orders"), Seq(
      FilterDsl.Pred("o_orderstatus", "!=", FilterDsl.Scalar("O")),
      FilterDsl.Pred("o_totalprice", ">", FilterDsl.Scalar(50000.0)),
      FilterDsl.Pred("o_orderpriority", "in",
        FilterDsl.Many(Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))),
      FilterDsl.Pred("o_orderpriority", "excludes", FilterDsl.Scalar("MEDIUM"))))
      .select(col("o_orderkey"), col("o_totalprice"))
  private val q02Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderstatus <> 'O' AND o_totalprice > 50000.0
       AND o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
       AND o_orderpriority NOT LIKE '%MEDIUM%'"""

  // q03: declarative projection: rename + cast + synthesized default column
  // (reference: marshmallow load_from/dump_to + dump_only defaults,
  // engine/payload/ac/dog_licenses.py:18-24, pa_vaccination_stats.py:36)
  private val q03: Q = (s, d) =>
    Projection(t(s, d, "orders"), Seq(
      Projection.Field("o_orderkey", "order_id", Some(LongType)),
      Projection.Field("o_orderstatus", "status"),
      Projection.Field("o_orderdate", "order_date", Some(DateType)),
      Projection.Field("", "source_system", default = Some("orders")),
      Projection.Field("o_totalprice", "total_cents", Some(DecimalType(18, 2)))))
      .withColumn("total_cents",
        (col("total_cents") * 100).cast(LongType))
  private val q03Sql =
    """SELECT o_orderkey AS order_id, o_orderstatus AS status,
       CAST(o_orderdate AS DATE) AS order_date,
       'orders' AS source_system,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents
       FROM orders"""

  // q04: scalar cleanup chain: trim/upper/substring/null-standardization
  // (reference: engine/payload/ac/dog_licenses.py:45-64, 211.py:38-45)
  private val q04: Q = (s, d) =>
    t(s, d, "customer").select(
      col("c_custkey"),
      upper(trim(col("c_name"))).as("clean_name"),
      substring(col("c_mktsegment"), 1, 3).as("seg3"),
      when(col("c_mktsegment").isin("NA", "N/A", "None", "."), lit(null))
        .otherwise(col("c_mktsegment")).as("segment"),
      (col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast(LongType)
        .as("bal_cents"))
  private val q04Sql =
    """SELECT c_custkey, upper(trim(c_name)) AS clean_name,
       substr(c_mktsegment, 1, 3) AS seg3,
       CASE WHEN c_mktsegment IN ('NA','N/A','None','.') THEN NULL
            ELSE c_mktsegment END AS segment,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
       FROM customer"""

  // q05: CASE-ladder bucketing (reference: age buckets,
  // engine/payload/united_way/211.py:82-103)
  private val q05: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("bucket",
        when(col("value") < 10, "low")
          .when(col("value") < 100, "mid")
          .otherwise("high"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  private val q05Sql =
    """SELECT event_type,
       CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid'
            ELSE 'high' END AS bucket,
       COUNT(*) AS n
       FROM events GROUP BY 1, 2"""

  // q06: date/time functions (reference: fuzzy date parse → ISO,
  // engine/payload/pgh/dpw_smart_trash_cans.py:45-53)
  private val q06: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("month_start", date_trunc("month", col("ts")).cast(DateType))
      .groupBy(col("month_start"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        max(col("ts")).as("last_ts"))
  private val q06Sql =
    """SELECT CAST(date_trunc('month', ts) AS DATE) AS month_start,
       COUNT(*) AS n, COUNT(DISTINCT user_id) AS users, MAX(ts) AS last_ts
       FROM events GROUP BY 1"""

  // q07: broadcast-dim equi-join chain (reference: ZIP→county dict lookup,
  // engine/payload/united_way/211.py:125-144) — dims are broadcast so the
  // fact side never shuffles
  private val q07: Q = (s, d) => {
    val c = t(s, d, "customer")
    val n = t(s, d, "nation")
    val r = t(s, d, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast(DoubleType).as("balance"))
  }
  private val q07Sql =
    """SELECT r_name, COUNT(*) AS customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance
       FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
       LEFT JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name"""

  // q08: fact-to-dim join + derived exact-decimal revenue
  private val q08: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    val p = t(s, d, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))
  }
  private val q08Sql =
    """SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
       FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand"""

  // q09/q10: semi/anti joins (EXISTS / NOT EXISTS)
  private val q09: Q = (s, d) => {
    val o = t(s, d, "orders")
    val li = t(s, d, "lineitem").filter(col("l_quantity") > 49)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .select(col("o_orderkey"))
  }
  private val q09Sql =
    """SELECT o_orderkey FROM orders
       WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)"""

  private val q10: Q = (s, d) => {
    val o = t(s, d, "orders")
    val li = t(s, d, "lineitem").filter(col("l_quantity") > 49)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
      .select(col("o_orderkey"))
  }
  // NOT EXISTS, not NOT IN: a left_anti join returns every non-matching
  // row even when the subquery side contains nulls, while NOT IN goes
  // three-valued (one null key => zero rows) — the oracle must carry the
  // anti-join's semantics, not a lookalike that diverges on null keys
  private val q10Sql =
    """SELECT o_orderkey FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM lineitem li
         WHERE li.l_quantity > 49 AND li.l_orderkey = o.o_orderkey)"""

  // q11: multi-source union + coalescing merge per key (reference:
  // engine/payload/house_cat/_super_link.py:41-75 — union N sources, keep
  // last non-null per field per id)
  private val q11: Q = (s, d) => {
    val c = t(s, d, "customer")
    val a = c.select(col("c_custkey"), col("c_name").as("name"))
      .withColumn("seg", lit(null).cast(StringType))
    val b = c.select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .withColumn("name", lit(null).cast(StringType))
    a.unionByName(b)
      .groupBy(col("c_custkey"))
      .agg(max(col("name")).as("name"), max(col("seg")).as("seg"))
  }
  private val q11Sql =
    """SELECT c_custkey, MAX(name) AS name, MAX(seg) AS seg FROM (
         SELECT c_custkey, c_name AS name, NULL AS seg FROM customer
         UNION ALL
         SELECT c_custkey, NULL AS name, c_mktsegment AS seg FROM customer
       ) GROUP BY c_custkey"""

  // q12: last-writer-wins per key as a plain query — the CDC dedup kernel
  // semantics (SURVEY.md §2.7) expressed over the events table
  // the arg-extreme key carries the VALUE as a tiebreak (zero-padded id,
  // then type, one lexicographic string both engines compare bytewise):
  // on a bare event_id key, two rows sharing the max id would let each
  // engine — or two runs with different partitioning — pick either type
  private val q12: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(max_by(col("event_type"),
        format_string("%020d|%s", col("event_id"), col("event_type")))
        .as("last_type"),
        max(col("event_id")).as("last_event_id"),
        count(lit(1)).as("n_events"))
  private val q12Sql =
    """SELECT user_id,
       arg_max(event_type, printf('%020d|%s', event_id, event_type)) AS last_type,
       MAX(event_id) AS last_event_id, COUNT(*) AS n_events
       FROM events GROUP BY user_id"""

  // q13: time-field extremes (reference: find_extreme_dates,
  // engine/time_field_util.py:20-49)
  private val q13: Q = (s, d) =>
    t(s, d, "events").agg(min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
      count(lit(1)).as("n"))
  private val q13Sql =
    "SELECT MIN(ts) AS min_ts, MAX(ts) AS max_ts, COUNT(*) AS n FROM events"

  // q14: time-gap incremental window — only rows newer than
  // max(time_field) - 7 days (reference: get_extant_time_range + day-window
  // fetch, engine/time_field_util.py:53-127, 211.py:225-248)
  private val q14: Q = (s, d) =>
    graft.spec.TimeField.timeGap(t(s, d, "events"), "ts", 7)
      .groupBy(col("ts").cast(DateType).as("day"))
      .agg(count(lit(1)).as("n"))
  private val q14Sql =
    """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events
       WHERE ts > (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
       GROUP BY 1"""

  // q15: time-series densification — zero-fill missing months (reference:
  // engine/payload/wprdc/g_analytics.py:161-237)
  private val q15: Q = (s, d) => {
    val o = t(s, d, "orders")
      .withColumn("m", date_trunc("month", col("o_orderdate")).cast(DateType))
    val bounds = o.agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
    val months = bounds.select(
      explode(expr("sequence(lo, hi, interval 1 month)")).as("month_start"))
    val counts = o.groupBy(col("m")).agg(count(lit(1)).as("cnt"))
    months.join(counts, months("month_start") === counts("m"), "left")
      .select(col("month_start"),
        coalesce(col("cnt"), lit(0L)).as("n"))
  }
  private val q15Sql =
    """WITH b AS (SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) lo,
                         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) hi FROM orders),
       m AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month_start FROM b),
       c AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, COUNT(*) AS cnt
             FROM orders GROUP BY 1)
       SELECT month_start, COALESCE(cnt, 0) AS n
       FROM m LEFT JOIN c ON m.month_start = c.m"""

  // q16: deterministic top-k (total tiebreak order)
  private val q16: Q = (s, d) =>
    t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))
  private val q16Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""

  // q17: uniqueness assertion (reference: _super_link.py:23-30)
  private val q17: Q = (s, d) =>
    t(s, d, "events").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
  private val q17Sql =
    "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id HAVING COUNT(*) > 1"

  // q18: empty-row drop + null standardization combo (reference:
  // ignore_empty_rows, pipeline.py:203-204)
  private val q18: Q = (s, d) => {
    val e = t(s, d, "events").select(
      col("event_id"),
      when(col("event_type") === "error", lit(null)).otherwise(col("event_type"))
        .as("etype"),
      when(col("value") < 0, lit(null)).otherwise(col("value")).as("v"))
    // the dropped frame holds ONLY the nullable columns: with the
    // never-null event_id included, the all-null predicate could never
    // fire and the gate would pass even if dropEmptyRows regressed to a
    // no-op — here 'error'+negative rows genuinely get dropped
    Projection.dropEmptyRows(e.select(col("etype"), col("v")))
      .groupBy(col("etype")).agg(count(lit(1)).as("n"))
  }
  private val q18Sql =
    """SELECT etype, COUNT(*) AS n FROM (
         SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS etype,
                CASE WHEN value < 0 THEN NULL ELSE value END AS v
         FROM events)
       WHERE NOT (etype IS NULL AND v IS NULL)
       GROUP BY etype"""

  // q19: multi-format fuzzy date parsing — first-matching-format wins,
  // unparseable → null (every reference payload job hand-rolls this; see
  // graft.spec.ScalarOps.fuzzyTimestamp). The three formats + junk rows
  // are synthesized deterministically from o_orderkey so the oracle can
  // rebuild the identical raw strings.
  private val q19: Q = (s, d) => {
    val raw = t(s, d, "orders").select(col("o_orderkey"),
      when(pmod(col("o_orderkey"), lit(97)) === 0, lit("not a date"))
        .when(pmod(col("o_orderkey"), lit(3)) === 0,
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
        .when(pmod(col("o_orderkey"), lit(3)) === 1,
          date_format(col("o_orderdate"), "MM/dd/yyyy HH:mm"))
        .otherwise(date_format(col("o_orderdate"), "dd.MM.yyyy")).as("raw_ts"))
    raw.select(pmod(col("o_orderkey"), lit(3)).as("fmt"),
        graft.spec.ScalarOps.fuzzyTimestamp(col("raw_ts"), Seq(
          "yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy HH:mm", "dd.MM.yyyy"))
          .as("parsed"))
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n"), count(col("parsed")).as("parsed_ok"),
        // cast to NTZ: the session writes LTZ as isAdjustedToUTC=true
        // micros (outputTimestampType=TIMESTAMP_MICROS for lake footer
        // stats), which DuckDB types TIMESTAMPTZ — the oracle's
        // try_strptime is naive. NTZ in a UTC session keeps the instant
        // values and the naive parquet annotation the oracle expects.
        min(col("parsed")).cast("timestamp_ntz").as("min_ts"),
        max(col("parsed")).cast("timestamp_ntz").as("max_ts"))
  }
  private val q19Sql =
    """WITH raw AS (
         SELECT o_orderkey,
           CASE WHEN o_orderkey % 97 = 0 THEN 'not a date'
                WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%m/%d/%Y %H:%M')
                ELSE strftime(o_orderdate, '%d.%m.%Y') END AS raw_ts
         FROM orders),
       p AS (
         SELECT o_orderkey % 3 AS fmt,
           COALESCE(try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S'),
                    try_strptime(raw_ts, '%m/%d/%Y %H:%M'),
                    try_strptime(raw_ts, '%d.%m.%Y')) AS parsed
         FROM raw)
       SELECT fmt, COUNT(*) AS n, COUNT(parsed) AS parsed_ok,
              MIN(parsed) AS min_ts, MAX(parsed) AS max_ts
       FROM p GROUP BY fmt"""

  // q34: multi-source record linkage / entity resolution (reference:
  // engine/payload/house_cat/_deduplicate.py:869-935 pairwise merge on
  // any shared candidate key; 937-998 curated link table). Three
  // overlapping "sources" derived from customer: A(ext_ref, acct),
  // B(ext_ref, name), C(name, mktseg). A↔B share ext_ref, B↔C share
  // name; A and C share NO key and link only transitively — the chained
  // resolution the reference runs pairwise, here as candidate-key
  // equi-joins + distributed connected components + one merge aggregate
  // (graft.spec.Linkage.resolveEntities).
  private val q34: Q = (s, d) => {
    val c = t(s, d, "customer")
    val nullS = lit(null).cast(StringType)
    val a = c.select(concat(lit("A"), col("c_custkey")).as("rid"),
      concat(lit("X"), col("c_custkey")).as("ext_ref"), nullS.as("name"),
      col("c_acctbal").as("acct"), nullS.as("mktseg"))
    val b = c.select(concat(lit("B"), col("c_custkey")).as("rid"),
      concat(lit("X"), col("c_custkey")).as("ext_ref"),
      col("c_name").as("name"), lit(null).cast(DoubleType).as("acct"),
      nullS.as("mktseg"))
    val c3 = c.select(concat(lit("C"), col("c_custkey")).as("rid"),
      nullS.as("ext_ref"), col("c_name").as("name"),
      lit(null).cast(DoubleType).as("acct"),
      col("c_mktsegment").as("mktseg"))
    graft.spec.Linkage.resolveEntities(a.union(b).union(c3), "rid",
      Seq("ext_ref", "name"))
  }
  private val q34Sql =
    """WITH recs AS (
         SELECT 'A' || c_custkey AS id, 'X' || c_custkey AS ext_ref,
                NULL AS name, c_acctbal AS acct, NULL AS mktseg FROM customer
         UNION ALL
         SELECT 'B' || c_custkey, 'X' || c_custkey, c_name, NULL, NULL FROM customer
         UNION ALL
         SELECT 'C' || c_custkey, NULL, c_name, NULL, c_mktsegment FROM customer),
       edges AS (
         SELECT a.id ida, b.id idb FROM recs a
           JOIN recs b ON a.ext_ref = b.ext_ref AND a.id < b.id
         UNION
         SELECT a.id, b.id FROM recs a
           JOIN recs b ON a.name = b.name AND a.id < b.id),
       und AS (SELECT ida a, idb b FROM edges UNION SELECT idb, ida FROM edges),
       comp AS (
         WITH RECURSIVE r(id, lbl) AS (
           SELECT id, id FROM recs
           UNION
           SELECT u.b, r.lbl FROM r JOIN und u ON u.a = r.id)
         SELECT id, min(lbl) AS lbl FROM r GROUP BY id)
       SELECT lbl AS canonical_id, count(*) AS n_members,
         array_to_string(list_sort(list_distinct(list(ext_ref)
           FILTER (WHERE ext_ref IS NOT NULL))), '|') AS ext_ref,
         array_to_string(list_sort(list_distinct(list(name)
           FILTER (WHERE name IS NOT NULL))), '|') AS name,
         array_to_string(list_sort(list_distinct(list(mktseg)
           FILTER (WHERE mktseg IS NOT NULL))), '|') AS mktseg,
         max(acct) AS acct
       FROM recs JOIN comp USING (id) GROUP BY lbl"""

  val queries: Map[String, Q] = Map(
    "q34_record_linkage" -> q34,
    "q01_groupby_agg" -> q01,
    "q02_filter_dsl" -> q02,
    "q03_project_rename_cast" -> q03,
    "q04_scalar_clean" -> q04,
    "q05_case_bucket" -> q05,
    "q06_date_ops" -> q06,
    "q07_join_broadcast_dims" -> q07,
    "q08_join_fact_dim_revenue" -> q08,
    "q09_semi_join" -> q09,
    "q10_anti_join" -> q10,
    "q11_union_coalesce_merge" -> q11,
    "q12_lww_latest_per_key" -> q12,
    "q13_minmax_time_field" -> q13,
    "q14_incremental_time_gap" -> q14,
    "q15_densify_months" -> q15,
    "q16_topk" -> q16,
    "q17_uniqueness_check" -> q17,
    "q18_empty_row_drop" -> q18,
    "q19_fuzzy_dates" -> q19)

  val oracles: Map[String, String] = Map(
    "q34_record_linkage" -> q34Sql,
    "q01_groupby_agg" -> q01Sql,
    "q02_filter_dsl" -> q02Sql,
    "q03_project_rename_cast" -> q03Sql,
    "q04_scalar_clean" -> q04Sql,
    "q05_case_bucket" -> q05Sql,
    "q06_date_ops" -> q06Sql,
    "q07_join_broadcast_dims" -> q07Sql,
    "q08_join_fact_dim_revenue" -> q08Sql,
    "q09_semi_join" -> q09Sql,
    "q10_anti_join" -> q10Sql,
    "q11_union_coalesce_merge" -> q11Sql,
    "q12_lww_latest_per_key" -> q12Sql,
    "q13_minmax_time_field" -> q13Sql,
    "q14_incremental_time_gap" -> q14Sql,
    "q15_densify_months" -> q15Sql,
    "q16_topk" -> q16Sql,
    "q17_uniqueness_check" -> q17Sql,
    "q18_empty_row_drop" -> q18Sql,
    "q19_fuzzy_dates" -> q19Sql)
}
