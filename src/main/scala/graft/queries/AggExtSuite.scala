package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.streaming.Sessionize

/** Aggregation extensions beyond the reference (SURVEY.md §2.5 "cheap
  * extensions" + §7.5): cube / grouping sets, approximate distinct, and
  * sessionization (built-in session_window + typed per-group scan).
  */
object AggExtSuite extends QuerySuite {

  private val cubeAgg = GraftQuery(
    "q_cube",
    (s, d) =>
      lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
             round(sum("l_quantity"), 0).cast("long").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("cnt"), col("sum_qty"))
        .orderBy(asc("rflag"), asc("lstatus")),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
              COALESCE(l_linestatus, 'ALL') AS lstatus,
              COUNT(*) AS cnt,
              CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS sum_qty
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
            ORDER BY rflag, lstatus"""))

  private val groupingSets = GraftQuery(
    "q_grouping_sets",
    (s, d) => {
      orders(s, d).createOrReplaceTempView("orders")
      s.sql("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                 COALESCE(o_orderpriority, 'ALL') AS priority,
                 COUNT(*) AS cnt
               FROM orders
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                       (o_orderstatus, o_orderpriority))
               ORDER BY status, priority""")
    },
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
              COALESCE(o_orderpriority, 'ALL') AS priority,
              COUNT(*) AS cnt
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                    (o_orderstatus, o_orderpriority))
            ORDER BY status, priority"""))

  /** HLL++-based approximate distinct — the approx VALUE differs from
    * DuckDB's sketch, so the oracle checks the error ENVELOPE instead:
    * exact counts (hash-compared) plus within-3σ booleans the oracle
    * expects TRUE. HLL is deterministic for fixed data, so the booleans
    * are stable — a sketch regression flips them and fails the hash.
    */
  private val approxDistinct = GraftQuery(
    "q_approx_distinct",
    (s, d) => {
      def within(c: String): org.apache.spark.sql.Column =
        (abs(approx_count_distinct(col(c), 0.02).cast("double") -
             countDistinct(col(c)).cast("double")) /
          countDistinct(col(c)).cast("double")) <= 0.06
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        within("l_partkey").as("parts_within"),
        within("l_suppkey").as("supps_within"))
    },
    Some("""SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
              COUNT(DISTINCT l_suppkey) AS exact_supps,
              TRUE AS parts_within, TRUE AS supps_within
            FROM lineitem"""))

  /** approx_percentile with an error envelope the oracle can check: the
    * accuracy parameter bounds RANK error (≤ 1/accuracy), so "approx
    * p_q lies between exact p_{q−δ} and p_{q+δ}" (δ = 50× the bound) is
    * the guarantee itself, decidable cross-engine: the oracle
    * recomputes the exact percentiles and expects the booleans TRUE.
    * The approximate path is what survives 100 TB — exact percentile
    * needs a full sort per group; the sketch is one mergeable pass.
    */
  private val approxPercentile = GraftQuery(
    "q_approx_percentile_envelope",
    (s, d) =>
      lineitem(s, d).groupBy(col("l_returnflag")).agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("exact_p50"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("exact_p95"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)")
          .between(expr("percentile(l_extendedprice, 0.495)"),
                   expr("percentile(l_extendedprice, 0.505)")).as("within_50"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)")
          .between(expr("percentile(l_extendedprice, 0.945)"),
                   expr("percentile(l_extendedprice, 0.955)")).as("within_95"))
        .orderBy(asc("l_returnflag")),
    Some("""SELECT l_returnflag,
              ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
              ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
              TRUE AS within_50, TRUE AS within_95
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val sessionize = GraftQuery(
    "q_sessionize",
    (s, d) =>
      Sessionize.sessions(events(s, d), gap = "30 minutes")
        .orderBy(asc("user_id"), asc("session_start")),
    headline = true,
    oracle =
    Some("""WITH o AS (
              SELECT user_id, ts, value,
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              FROM events),
            m AS (
              SELECT user_id, ts, value,
                CASE WHEN prev IS NULL
                       OR epoch_ms(ts) - epoch_ms(prev) >= 1800000
                     THEN 1 ELSE 0 END AS new_s
              FROM o),
            s AS (
              SELECT user_id, ts, value,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS sid
              FROM m)
            SELECT user_id,
              strftime(CAST(MIN(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
                AS session_start,
              COUNT(*) AS n_events,
              ROUND(SUM(value), 2) AS sum_value
            FROM s GROUP BY user_id, sid
            ORDER BY user_id, session_start"""))

  private val userActivity = GraftQuery(
    "q_user_activity",
    (s, d) =>
      Sessionize.userActivity(s, events(s, d)).toDF()
        .orderBy(asc("user_id")),
    Some("""WITH o AS (
              SELECT user_id, ts,
                epoch_ms(ts) - epoch_ms(LAG(ts) OVER (
                  PARTITION BY user_id ORDER BY ts)) AS gap_ms
              FROM events)
            SELECT user_id, COUNT(*) AS n_events,
              strftime(CAST(MIN(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
                AS first_ts,
              strftime(CAST(MAX(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
                AS last_ts,
              COALESCE(CAST(MAX(gap_ms) // 1000 AS BIGINT), 0) AS max_gap_seconds
            FROM o GROUP BY user_id ORDER BY user_id"""))

  /** Semi-structured column handling: JSON props parsed natively
    * (from_json with an explicit schema — schema-on-read, codegen'd),
    * aggregated by extracted field.
    */
  private val jsonProps = GraftQuery(
    "q_json_props",
    (s, d) =>
      events(s, d)
        .select(col("event_id"), col("event_type"),
                from_json(col("props"),
                  org.apache.spark.sql.types.StructType.fromDDL("k INT"))
                  .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
             round(avg("k"), 4).as("avg_k"),
             max("k").as("max_k"))
        .orderBy(asc("event_type")),
    Some("""SELECT event_type, COUNT(*) AS cnt,
              ROUND(AVG(CAST(json_extract(props, '$.k') AS INTEGER)), 4)
                AS avg_k,
              MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** As-of join: each purchase enriched with the user's most recent
    * prior-or-simultaneous click — oracle is DuckDB's native ASOF JOIN.
    */
  private val asofJoin = GraftQuery(
    "q_asof_join",
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
                col("value").as("click_value"))
      graft.operators.AsOfJoin
        .backward(purchases, clicks, keys = Seq("user_id"), timeCol = "ts")
        .select(
          col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("pts"),
          col("value"), col("click_value"))
        .orderBy(asc("user_id"), asc("event_id"))
    },
    Some("""WITH p AS (
              SELECT user_id, ts, event_id, value FROM events
              WHERE event_type = 'purchase'),
            c AS (
              SELECT user_id, ts, value AS click_value FROM events
              WHERE event_type = 'click')
            SELECT p.user_id, p.event_id,
              strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS pts,
              p.value, c.click_value
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.user_id, p.event_id"""))

  /** Same as-of semantics through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsOfJoinExec]]: logical node + strategy + streaming
    * per-partition merge) — identical DuckDB ASOF JOIN oracle proves
    * the two implementations agree.
    */
  private val asofJoinExec = GraftQuery(
    "q_asof_join_exec",
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
                col("value").as("click_value"))
      graft.plans.AsOfJoinExecOp
        .backward(purchases, clicks, keys = Seq("user_id"), timeCol = "ts")
        .select(
          col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("pts"),
          col("value"), col("click_value"))
        .orderBy(asc("user_id"), asc("event_id"))
    },
    Some("""WITH p AS (
              SELECT user_id, ts, event_id, value FROM events
              WHERE event_type = 'purchase'),
            c AS (
              SELECT user_id, ts, value AS click_value FROM events
              WHERE event_type = 'click')
            SELECT p.user_id, p.event_id,
              strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS pts,
              p.value, c.click_value
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.user_id, p.event_id"""))

  /** Custom typed Aggregator UDAF ([[graft.functions.WeightedAvg]])
    * through the gate: used via the Column API and simultaneously
    * registered for SQL. Rounded to 4 — partial sums merge in shuffle
    * order, the oracle sums sequentially.
    */
  private val weightedAvg = GraftQuery(
    "q_weighted_avg",
    (s, d) => {
      val wavg = udaf(graft.functions.WeightedAvg)
      s.udf.register("weighted_avg", wavg)
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(wavg(col("l_extendedprice"), col("l_quantity")), 4)
            .as("wavg_price"),
          round(sum("l_quantity"), 0).cast("long").as("wsum"))
        .orderBy(asc("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
              ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
                AS wavg_price,
              CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS wsum
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---- exact median (interpolated) per group -------------------------
  // Spark `median` = percentile(0.5), continuous interpolation — the
  // same definition as DuckDB's median/quantile_cont.
  private val medianAgg = GraftQuery(
    "q_median_agg",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(median(col("l_quantity")), 6).as("med_qty"),
          round(median(col("l_extendedprice")), 6).as("med_price"),
          count(lit(1)).as("n"))
        .orderBy(asc("l_returnflag")),
    Some("""SELECT l_returnflag,
              ROUND(median(l_quantity), 6) AS med_qty,
              ROUND(median(l_extendedprice), 6) AS med_price,
              COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---- ordered string aggregation ------------------------------------
  // Deterministic cross-engine listagg: sort the distinct set before
  // joining (collect_set order is partition-dependent; the sort is the
  // contract).
  private val stringCollect = GraftQuery(
    "q_string_collect",
    (s, d) =>
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
            .as("priorities"),
          countDistinct(col("o_orderpriority")).as("n_priorities"))
        .orderBy(asc("o_orderstatus")),
    Some("""SELECT o_orderstatus,
              string_agg(DISTINCT o_orderpriority, ','
                ORDER BY o_orderpriority) AS priorities,
              COUNT(DISTINCT o_orderpriority) AS n_priorities
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  override val queries: Seq[GraftQuery] = Seq(
    cubeAgg, groupingSets, approxDistinct, approxPercentile, sessionize,
    userActivity, jsonProps, asofJoin, asofJoinExec, weightedAvg, medianAgg,
    stringCollect)
}
