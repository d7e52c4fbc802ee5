package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._

/** Analytics breadth beyond the reference: column profiling, pivot,
  * exact percentiles, and time-spine gap-fill — the everyday tools of a
  * data-pipeline engine, each with a DuckDB oracle.
  */
object AnalyticsExtSuite extends QuerySuite {

  /** Per-column data profile (the null/distinct/min/max summary every
    * ingest pipeline runs first). Built as one pass per column batch via
    * a union of typed aggregates — no driver-side describe().
    */
  private val profile = GraftQuery(
    "q_profile",
    (s, d) => {
      val li = lineitem(s, d)
      def prof(c: String) = li.agg(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        count(lit(1)).minus(count(col(c))).cast("long").as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
      prof("l_quantity")
        .unionByName(prof("l_returnflag"))
        .unionByName(prof("l_partkey"))
        .orderBy(asc("col_name"))
    },
    Some("""SELECT * FROM (
              SELECT 'l_quantity' AS col_name, COUNT(*) AS n_rows,
                COUNT(*) - COUNT(l_quantity) AS n_nulls,
                COUNT(DISTINCT l_quantity) AS n_distinct,
                CAST(MIN(l_quantity) AS VARCHAR) AS min_s,
                CAST(MAX(l_quantity) AS VARCHAR) AS max_s
              FROM lineitem
              UNION ALL
              SELECT 'l_returnflag', COUNT(*),
                COUNT(*) - COUNT(l_returnflag),
                COUNT(DISTINCT l_returnflag),
                CAST(MIN(l_returnflag) AS VARCHAR),
                CAST(MAX(l_returnflag) AS VARCHAR)
              FROM lineitem
              UNION ALL
              SELECT 'l_partkey', COUNT(*),
                COUNT(*) - COUNT(l_partkey),
                COUNT(DISTINCT l_partkey),
                CAST(MIN(l_partkey) AS VARCHAR),
                CAST(MAX(l_partkey) AS VARCHAR)
              FROM lineitem)
            ORDER BY col_name"""))

  /** Pivot: event counts per user across event types as columns.
    * Explicit pivot values keep the output schema static (required for
    * a deterministic gate; also the scalable form — value discovery is
    * an extra pass).
    */
  private val pivot = GraftQuery(
    "q_pivot",
    (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(asc("user_id")),
    Some("""SELECT user_id,
              COUNT(*) FILTER (event_type = 'click') AS click,
              COUNT(*) FILTER (event_type = 'error') AS error,
              COUNT(*) FILTER (event_type = 'purchase') AS purchase,
              COUNT(*) FILTER (event_type = 'signup') AS signup,
              COUNT(*) FILTER (event_type = 'view') AS view
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Exact interpolated percentiles (both engines implement the same
    * linear interpolation at rank p·(n−1)).
    */
  private val percentiles = GraftQuery(
    "q_percentiles",
    (s, d) =>
      lineitem(s, d).agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("qty_p50"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("qty_p90"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("price_p99")),
    Some("""SELECT
              ROUND(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
              ROUND(quantile_cont(l_quantity, 0.9), 4) AS qty_p90,
              ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50,
              ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
            FROM lineitem"""))

  /** Time-spine gap-fill: a complete daily spine over the orders date
    * range, zero-filled where no orders exist — the standard resample
    * primitive for time-series features. The spine is generated
    * relationally (sequence + explode), not collected.
    */
  private val gapFill = GraftQuery(
    "q_gap_fill",
    (s, d) => {
      val o = orders(s, d)
        .select(col("o_orderdate").cast("date").as("day"),
                col("o_totalprice"))
      val daily = o.groupBy("day")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("revenue"))
      val spine = o.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy(asc("day"))
        .limit(2000)
    },
    Some("""WITH RECURSIVE o AS (
              SELECT CAST(o_orderdate AS DATE) AS day, o_totalprice
              FROM orders),
            daily AS (
              SELECT day, COUNT(*) AS n_orders,
                ROUND(SUM(o_totalprice), 2) AS revenue
              FROM o GROUP BY day),
            spine(day) AS (
              SELECT MIN(day) FROM o
              UNION ALL
              SELECT day + 1 FROM spine
              WHERE day < (SELECT MAX(day) FROM o))
            SELECT strftime(s.day, '%Y-%m-%d') AS day,
              COALESCE(d.n_orders, 0) AS n_orders,
              COALESCE(d.revenue, 0.0) AS revenue
            FROM spine s LEFT JOIN daily d USING (day)
            ORDER BY day LIMIT 2000"""))

  /** Set-operation completion (§2.7 — the reference only had bag-union):
    * customers in BUILDING ∩ high-balance, and BUILDING ∖ high-balance.
    */
  private val setOps = GraftQuery(
    "q_set_ops",
    (s, d) => {
      val c = customer(s, d)
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      val both = building.intersect(rich)
        .withColumn("set_op", lit("intersect"))
      val only = building.except(rich)
        .withColumn("set_op", lit("except"))
      both.unionByName(only).orderBy(asc("set_op"), asc("c_custkey"))
    },
    Some("""SELECT * FROM (
              SELECT c_custkey, 'intersect' AS set_op FROM (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
                INTERSECT
                SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
              UNION ALL
              SELECT c_custkey, 'except' AS set_op FROM (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
                EXCEPT
                SELECT c_custkey FROM customer WHERE c_acctbal > 5000))
            ORDER BY set_op, c_custkey"""))

  /** Time-based RANGE window frame (interval trailing sum) — a distinct
    * surface from ROWS frames (`q_moving_avg`): the frame is defined by
    * the ORDER-BY value, so gaps in the date spine shrink the window.
    * Exercised through SQL text (the frame syntax is SQL-only).
    * Daily rev is rounded before the trailing sum, so the outer sum adds
    * ≤8 already-stable values — deterministic across engines.
    */
  private val trailing7d = GraftQuery(
    "q_trailing_7d",
    (s, d) => {
      graft.Tables.registerViews(s, d)
      s.sql("""WITH daily AS (
                 SELECT o_orderdate AS d, ROUND(SUM(o_totalprice), 2) AS rev
                 FROM orders GROUP BY o_orderdate)
               SELECT date_format(d, 'yyyy-MM-dd') AS day, rev,
                 ROUND(SUM(rev) OVER (ORDER BY d
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2)
                   AS rev7
               FROM daily ORDER BY day""")
    },
    Some("""WITH daily AS (
              SELECT o_orderdate AS d, ROUND(SUM(o_totalprice), 2) AS rev
              FROM orders GROUP BY o_orderdate)
            SELECT strftime(d, '%Y-%m-%d') AS day, rev,
              ROUND(SUM(rev) OVER (ORDER BY d
                RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 2)
                AS rev7
            FROM daily ORDER BY day"""))

  /** Discrete percentiles (actual data values, no interpolation) via
    * ANSI `WITHIN GROUP` syntax — the exact-percentile complement to
    * `q_percentiles`/`q_group_percentiles` (continuous).
    */
  private val percentileDisc = GraftQuery(
    "q_percentile_disc",
    (s, d) => {
      graft.Tables.registerViews(s, d)
      s.sql("""SELECT l_returnflag,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)
                   AS p50,
                 percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)
                   AS p90
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag,
              quantile_disc(l_quantity, 0.5) AS p50,
              quantile_disc(l_quantity, 0.9) AS p90
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): nation
    * keys as multisets across two segments; multiplicities are the
    * point, so the bag result is aggregated to (key, count) for a
    * deterministic compare.
    */
  private val setOpsAll = GraftQuery(
    "q_set_ops_all",
    (s, d) => {
      val c = customer(s, d)
      val a = c.filter(col("c_mktsegment") === "BUILDING")
        .select("c_nationkey")
      val b = c.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select("c_nationkey")
      val inter = a.intersectAll(b)
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .withColumn("set_op", lit("intersect_all"))
      val exc = a.exceptAll(b)
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .withColumn("set_op", lit("except_all"))
      inter.unionByName(exc)
        .select("set_op", "c_nationkey", "n")
        .orderBy(asc("set_op"), asc("c_nationkey"))
    },
    Some("""SELECT * FROM (
              SELECT 'intersect_all' AS set_op, c_nationkey, COUNT(*) AS n
              FROM (
                SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
                INTERSECT ALL
                SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
              GROUP BY c_nationkey
              UNION ALL
              SELECT 'except_all' AS set_op, c_nationkey, COUNT(*) AS n
              FROM (
                SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
                EXCEPT ALL
                SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
              GROUP BY c_nationkey)
            ORDER BY set_op, c_nationkey"""))

  /** Scalar string-function breadth: pad, substring, translate, replace,
    * case mapping, edit distance — all codegen'd built-ins.
    */
  private val stringFuncs = GraftQuery(
    "q_string_funcs",
    (s, d) =>
      nation(s, d).select(
          col("n_nationkey"),
          lpad(col("n_nationkey").cast("string"), 3, "0").as("key_padded"),
          substring(col("n_name"), 1, 8).as("name_prefix"),
          translate(col("n_name"), "_", "-").as("name_dashed"),
          regexp_replace(col("n_name"), "[0-9]+", "#").as("name_masked"),
          lower(col("n_name")).as("name_lower"),
          levenshtein(col("n_name"), lit("NATION_0")).as("dist_from_n0"))
        .orderBy(asc("n_nationkey")),
    Some("""SELECT n_nationkey,
              lpad(CAST(n_nationkey AS VARCHAR), 3, '0') AS key_padded,
              substring(n_name, 1, 8) AS name_prefix,
              translate(n_name, '_', '-') AS name_dashed,
              regexp_replace(n_name, '[0-9]+', '#', 'g') AS name_masked,
              lower(n_name) AS name_lower,
              CAST(levenshtein(n_name, 'NATION_0') AS INTEGER)
                AS dist_from_n0
            FROM nation ORDER BY n_nationkey"""))

  /** Array aggregation: per-nation customer-segment vocabulary.
    * collect_list/set ordering is partition-dependent — sort_array makes
    * the result deterministic (the only gate-safe form).
    */
  private val arrayAgg = GraftQuery(
    "q_array_agg",
    (s, d) =>
      customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          sort_array(collect_set(col("c_mktsegment"))).as("segments"),
          count(lit(1)).as("n_customers"))
        .select(
          col("c_nationkey"),
          concat_ws("|", col("segments")).as("segments"),
          col("n_customers"))
        .orderBy(asc("c_nationkey")),
    Some("""SELECT c_nationkey,
              array_to_string(list_sort(list_distinct(
                array_agg(c_mktsegment))), '|') AS segments,
              COUNT(*) AS n_customers
            FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Per-group exact interpolated percentiles (distributed exact
    * percentile = sort-based agg per group; approx_percentile is the
    * 100 TB path, q_approx_distinct shows the approximate pattern).
    */
  private val groupPercentiles = GraftQuery(
    "q_group_percentiles",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
          count(lit(1)).as("n"))
        .orderBy(asc("l_returnflag")),
    Some("""SELECT l_returnflag,
              ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
              ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
              ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
              COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Calendar rollup: month extraction + revenue aggregation — the
    * date-dimension breadth the reference's YEAR(CURDATE()) hints at
    * (musemotion-queries.sql:34), made replay-safe.
    */
  private val monthlyRevenue = GraftQuery(
    "q_monthly_revenue",
    (s, d) =>
      orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy(asc("month")),
    Some("""SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
              COUNT(*) AS n_orders,
              ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders GROUP BY month ORDER BY month"""))

  /** Distribution-rank window breadth: ntile / percent_rank / cume_dist.
    * The window order carries c_custkey as a tiebreaker — ntile ASSIGNS
    * tied rows to different buckets by physical order, so without a
    * total order the result is nondeterministic (and engine-divergent).
    */
  private val windowNtile = GraftQuery(
    "q_window_ntile",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment")
        .orderBy(asc("c_acctbal"), asc("c_custkey"))
      customer(s, d).select(
          col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(asc("c_mktsegment"), asc("c_custkey"))
    },
    Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
              CAST(ntile(4) OVER w AS INTEGER) AS quartile,
              ROUND(percent_rank() OVER w, 6) AS pr,
              ROUND(cume_dist() OVER w, 6) AS cd
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal, c_custkey)
            ORDER BY c_mktsegment, c_custkey"""))

  /** Sliding-frame window breadth: ROWS-frame moving average and
    * frame-bounded first/last value (time-series smoothing over the
    * per-customer order history).
    */
  private val movingAvg = GraftQuery(
    "q_moving_avg",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      val last4 = w.rowsBetween(-3, 0)
      orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          col("o_totalprice"),
          round(avg("o_totalprice").over(last4), 4).as("ma4"),
          round(first("o_totalprice").over(last4), 2).as("frame_first"),
          round(max("o_totalprice").over(last4), 2).as("frame_max"))
        .filter(col("o_custkey") < 50)
        .orderBy(asc("o_custkey"), asc("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
              ROUND(AVG(o_totalprice) OVER w, 4) AS ma4,
              ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS frame_first,
              ROUND(MAX(o_totalprice) OVER w, 2) AS frame_max
            FROM orders
            WHERE o_custkey < 50
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            ORDER BY o_custkey, o_orderkey"""))

  override val queries: Seq[GraftQuery] =
    Seq(profile, pivot, percentiles, gapFill, setOps, setOpsAll, stringFuncs,
        arrayAgg, groupPercentiles, monthlyRevenue, windowNtile, movingAvg,
        trailing7d, percentileDisc)
}
