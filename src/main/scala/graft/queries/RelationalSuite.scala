package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Core relational operator suite — the Spark-first re-expression of the
  * reference's query surface (SURVEY.md §2.2–§2.8: projection, filters,
  * joins, aggregation, sort/limit, set ops, CRUD-as-snapshot, upsert).
  *
  * Reference evidence is cited per query; all plans are declarative
  * DataFrame programs so Catalyst's stock rules (pushdown, pruning,
  * broadcast selection, TakeOrderedAndProject) do the physical work.
  */
object RelationalSuite extends QuerySuite {

  // ---- A1/A2: group-count, top-k (musemotion-queries.sql:41-45;
  //      streamlit_app.py:205,215) ------------------------------------
  private val countByBrand = GraftQuery(
    "q_count_by_brand",
    (s, d) =>
      part(s, d)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("p_brand"))
        .limit(20),
    Some("""SELECT p_brand, COUNT(*) AS cnt FROM part
            GROUP BY p_brand ORDER BY cnt DESC, p_brand LIMIT 20"""),
    headline = true)

  // ---- F2/O1/O4: IS NOT NULL filter + multi-key mixed-direction sort +
  //      LIMIT (musemotion-queries.sql:26-30) -------------------------
  private val filterSort = GraftQuery(
    "q_filter_sort",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity").isNotNull && col("l_quantity") > 30)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy(desc("ship_date"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(100),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
              strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date
            FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity > 30
            ORDER BY ship_date DESC, l_orderkey, l_linenumber LIMIT 100"""))

  // ---- P5/O2: derived column arithmetic + sort by it, literal as-of
  //      year (musemotion-queries.sql:33-38; replay-safe per SURVEY §5.2)
  private val derivedAge = GraftQuery(
    "q_derived_age",
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          (lit(2026) - year(col("o_orderdate"))).cast("int").as("order_age"))
        .orderBy(asc("order_age"), asc("o_orderkey"))
        .limit(200),
    Some("""SELECT o_orderkey,
              CAST(2026 - year(o_orderdate) AS INTEGER) AS order_age
            FROM orders ORDER BY order_age, o_orderkey LIMIT 200"""))

  // ---- A3/F7: group avg + count + HAVING (musemotion-queries.sql:48-52)
  private val groupAvgHaving = GraftQuery(
    "q_group_avg_having",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
             round(avg("l_extendedprice"), 2).as("avg_price"))
        .filter(col("cnt") > 10)
        .orderBy(desc("avg_price"), asc("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(*) AS cnt,
              ROUND(AVG(l_extendedprice), 2) AS avg_price
            FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 10
            ORDER BY avg_price DESC, l_returnflag"""))

  // ---- A4/A5: global KPI aggregates (streamlit_app.py:180-190) ------
  private val globalKpis = GraftQuery(
    "q_global_kpis",
    (s, d) =>
      lineitem(s, d).agg(
        count(lit(1)).as("total_rows"),
        round(sum("l_quantity"), 0).cast("long").as("sum_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price")),
    Some("""SELECT COUNT(*) AS total_rows,
              CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS sum_qty,
              ROUND(AVG(l_extendedprice), 2) AS avg_price
            FROM lineitem"""))

  // ---- F5/J5: theta filter vs uncorrelated scalar subquery
  //      (musemotion-queries.sql:69-74) — run through spark.sql so the
  //      Catalyst scalar-subquery rewrite is exercised natively.
  private val aboveAvgSubquery = GraftQuery(
    "q_above_avg_subquery",
    (s, d) => {
      orders(s, d).createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  // ---- J4/O5: CTE top-k self-enrichment (musemotion-queries.sql:77-88)
  //      Top-5 side is tiny by construction => broadcast it explicitly.
  private val top5CteJoin = GraftQuery(
    "q_top5_cte_join",
    (s, d) => {
      val p = part(s, d)
      val topBrands = p.groupBy("p_brand").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("p_brand")).limit(5)
      p.join(broadcast(topBrands), "p_brand")
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("cnt"))
        .orderBy(desc("cnt"), asc("p_partkey"))
        .limit(100)
    },
    Some("""WITH top_brands AS (
              SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand
              ORDER BY cnt DESC, p_brand LIMIT 5)
            SELECT p.p_partkey, p.p_name, p.p_brand, t.cnt
            FROM part p JOIN top_brands t ON p.p_brand = t.p_brand
            ORDER BY t.cnt DESC, p.p_partkey LIMIT 100"""))

  // ---- J1: INNER equi-join fact->dim chain (musemotion-queries.sql:98-101)
  //      dims are tiny => broadcast hash join, no shuffle of the fact.
  private val joinInner = GraftQuery(
    "q_join_inner",
    (s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)),
              col("c_nationkey") === col("n_nationkey"), "inner")
        .join(broadcast(region(s, d)),
              col("n_regionkey") === col("r_regionkey"), "inner")
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
        .orderBy(asc("c_custkey"))
        .limit(500),
    Some("""SELECT c_custkey, c_name, n_name, r_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            ORDER BY c_custkey LIMIT 500"""),
    headline = true)

  // ---- J2: LEFT OUTER equi-join (musemotion-queries.sql:104-108) ----
  private val joinLeft = GraftQuery(
    "q_join_left",
    (s, d) =>
      orders(s, d)
        .join(broadcast(customer(s, d)),
              col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"))
        .orderBy(asc("o_orderkey"))
        .limit(500),
    Some("""SELECT o_orderkey, o_totalprice, c_name
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey LIMIT 500"""))

  // ---- J3: RIGHT OUTER equi-join, dim-driven (musemotion-queries.sql:111-113)
  //      NULLS FIRST pinned on both sides (Spark asc default vs DuckDB
  //      asc default differ on null order).
  private val joinRight = GraftQuery(
    "q_join_right",
    (s, d) =>
      customer(s, d)
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"), "right")
        .select(col("n_name"), col("c_custkey"))
        .orderBy(asc("n_name"), asc_nulls_first("c_custkey"))
        .limit(500),
    Some("""SELECT n_name, c_custkey
            FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
            ORDER BY n_name, c_custkey NULLS FIRST LIMIT 500"""))

  // ---- F4: point lookup by key (musemotion-queries.sql:60) ----------
  private val pointLookup = GraftQuery(
    "q_point_lookup",
    (s, d) =>
      orders(s, d)
        .filter(col("o_orderkey") === 42)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .limit(1),
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey = 42 LIMIT 1"""))

  // ---- F3: multi-column IN-list conjunction (streamlit_app.py:166-170)
  private val isinFilter = GraftQuery(
    "q_isin_filter",
    (s, d) =>
      customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY") &&
                col("c_nationkey").isin(1, 2, 3, 4, 5))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(asc("c_custkey"))
        .limit(500),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
              AND c_nationkey IN (1, 2, 3, 4, 5)
            ORDER BY c_custkey LIMIT 500"""))

  // ---- S2/§2.7: bag union of per-slice scans (pipeline.py:131-145) --
  private val unionSlices = GraftQuery(
    "q_union",
    (s, d) => {
      val o = orders(s, d)
      val high = o.filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_totalprice"), lit("high").as("bucket"))
      val low = o.filter(col("o_totalprice") < 10000)
        .select(col("o_orderkey"), col("o_totalprice"), lit("low").as("bucket"))
      high.unionByName(low)
        .orderBy(asc("o_orderkey"), asc("bucket"))
        .limit(500)
    },
    Some("""SELECT * FROM (
              SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders
              WHERE o_totalprice > 400000
              UNION ALL
              SELECT o_orderkey, o_totalprice, 'low' AS bucket FROM orders
              WHERE o_totalprice < 10000)
            ORDER BY o_orderkey, bucket LIMIT 500"""))

  // ---- A6: distinct filter-domain values (streamlit_app.py:144-151) -
  private val distinctDomains = GraftQuery(
    "q_distinct_domains",
    (s, d) =>
      events(s, d).select("event_type").na.drop().distinct()
        .orderBy(asc("event_type")),
    Some("""SELECT DISTINCT event_type FROM events
            WHERE event_type IS NOT NULL ORDER BY event_type"""))

  // ---- §2.5 extension: exact distinct-count --------------------------
  private val distinctCount = GraftQuery(
    "q_distinct_count",
    (s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps")),
    Some("""SELECT COUNT(DISTINCT l_partkey) AS n_parts,
              COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem"""))

  // ---- §2.9 extension: rank within group (window) --------------------
  private val windowRank = GraftQuery(
    "q_window_rank",
    (s, d) => {
      val cnts = events(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id")
        .orderBy(desc("cnt"), asc("event_type"))
      cnts.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .orderBy(asc("user_id"), asc("rn"))
    },
    Some("""WITH cnts AS (
              SELECT user_id, event_type, COUNT(*) AS cnt
              FROM events GROUP BY user_id, event_type)
            SELECT user_id, event_type, cnt, CAST(rn AS INTEGER) AS rn FROM (
              SELECT user_id, event_type, cnt,
                ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY cnt DESC, event_type) AS rn
              FROM cnts)
            WHERE rn <= 2 ORDER BY user_id, rn"""))

  // ---- §2.5 extension: rollup (grouping sets) ------------------------
  private val rollupAgg = GraftQuery(
    "q_rollup",
    (s, d) =>
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
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
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY rflag, lstatus"""))

  // ---- C1-C3: CRUD as snapshot transforms (musemotion-queries.sql:56-66;
  //      SURVEY §2.8 immutable-rewrite mapping) ------------------------
  private val crudSnapshot = GraftQuery(
    "q_crud_snapshot",
    (s, d) => {
      val base = orders(s, d)
        .filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      // C1 INSERT: union of a one-row literal frame
      val inserted = base.unionByName(
        s.range(1).select(
          lit(-1L).as("o_orderkey"), lit("N").as("o_orderstatus"),
          lit(0.0).as("o_totalprice")))
      // C2 UPDATE by key: conditional column rewrite
      val updated = inserted.withColumn(
        "o_orderstatus",
        when(col("o_orderkey") === 7, lit("X")).otherwise(col("o_orderstatus")))
      // C3 DELETE by key: filter
      updated.filter(col("o_orderkey") =!= 32)
        .orderBy(asc("o_orderkey"))
    },
    Some("""WITH base AS (
              SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
              WHERE o_orderkey <= 200),
            ins AS (
              SELECT * FROM base
              UNION ALL SELECT CAST(-1 AS BIGINT), 'N', 0.0),
            upd AS (
              SELECT o_orderkey,
                CASE WHEN o_orderkey = 7 THEN 'X' ELSE o_orderstatus END
                  AS o_orderstatus,
                o_totalprice FROM ins)
            SELECT * FROM upd WHERE o_orderkey <> 32
            ORDER BY o_orderkey"""))

  // ---- S6/C4: staged upsert as row_number-precedence merge
  //      (load_musemotion_to_db.py:91-143) — updates win over base.
  //      Negation (not arithmetic) keeps doubles bit-exact vs the oracle.
  private val upsert = GraftQuery(
    "q_upsert",
    (s, d) => {
      val base = orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), lit(2).as("pri"))
      val updates = orders(s, d)
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), negate(col("o_totalprice")).as("o_totalprice"),
                lit(1).as("pri"))
      val w = Window.partitionBy("o_orderkey").orderBy(asc("pri"))
      updates.unionByName(base)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(asc("o_orderkey"))
        .limit(1000)
    },
    headline = true,
    oracle =
    Some("""WITH updates AS (
              SELECT o_orderkey, -o_totalprice AS o_totalprice, 1 AS pri
              FROM orders WHERE o_orderkey % 10 = 0),
            merged AS (
              SELECT * FROM updates
              UNION ALL
              SELECT o_orderkey, o_totalprice, 2 AS pri FROM orders),
            ranked AS (
              SELECT o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY pri) AS rn
              FROM merged)
            SELECT o_orderkey, o_totalprice FROM ranked WHERE rn = 1
            ORDER BY o_orderkey LIMIT 1000"""))

  // ---- P4: WKT POINT extraction via native regexp (pipeline.py:67-79) -
  //      WKT synthesized from integer keys so string round-trip is exact.
  private val wktPattern = """POINT\s*\(\s*([-0-9.]+)\s+([-0-9.]+)\s*\)"""
  private val wktExtract = GraftQuery(
    "q_wkt_extract",
    (s, d) => {
      val pts = customer(s, d).select(
        col("c_custkey"),
        concat(lit("POINT ("), col("c_nationkey").cast("string"), lit(" "),
               col("c_custkey").cast("string"), lit(")")).as("location"))
      pts.select(
          col("c_custkey"), col("location"),
          nullif(regexp_extract(col("location"), wktPattern, 2), lit(""))
            .cast("double").as("latitude"),
          nullif(regexp_extract(col("location"), wktPattern, 1), lit(""))
            .cast("double").as("longitude"))
        .orderBy(asc("c_custkey"))
        .limit(500)
    },
    Some("""WITH pts AS (
              SELECT c_custkey,
                'POINT (' || CAST(c_nationkey AS VARCHAR) || ' ' ||
                CAST(c_custkey AS VARCHAR) || ')' AS location
              FROM customer)
            SELECT c_custkey, location,
              CAST(NULLIF(regexp_extract(location,
                'POINT\s*\(\s*([-0-9.]+)\s+([-0-9.]+)\s*\)', 2), '')
                AS DOUBLE) AS latitude,
              CAST(NULLIF(regexp_extract(location,
                'POINT\s*\(\s*([-0-9.]+)\s+([-0-9.]+)\s*\)', 1), '')
                AS DOUBLE) AS longitude
            FROM pts ORDER BY c_custkey LIMIT 500"""))

  // ---- P2: text normalize — trim + sentinel-to-null (pipeline.py:98-102)
  private val textClean = GraftQuery(
    "q_text_clean",
    (s, d) =>
      documents(s, d).select(
          col("doc_id"),
          when(trim(col("lang")).isin("nan", "None", ""), lit(null))
            .otherwise(trim(col("lang"))).as("lang_clean"),
          upper(col("source")).as("source_u"))
        .orderBy(asc("doc_id"))
        .limit(1000),
    Some("""SELECT doc_id,
              CASE WHEN TRIM(lang) IN ('nan', 'None', '') THEN NULL
                   ELSE TRIM(lang) END AS lang_clean,
              UPPER(source) AS source_u
            FROM documents ORDER BY doc_id LIMIT 1000"""))

  // ---- P3: safe numeric cast, null on failure (pipeline.py:107-110) --
  private val safeCast = GraftQuery(
    "q_safe_cast",
    (s, d) =>
      events(s, d).select(
          col("event_id"),
          nullif(regexp_extract(col("props"), "[0-9]+", 0), lit(""))
            .try_cast("int").as("k"))
        .orderBy(asc("event_id"))
        .limit(1000),
    Some("""SELECT event_id,
              TRY_CAST(NULLIF(regexp_extract(props, '[0-9]+', 0), '')
                AS INTEGER) AS k
            FROM events ORDER BY event_id LIMIT 1000"""))

  // ---- streaming-analog tumbling-window agg over event time ----------
  //      (hour bucket emitted as a string: engine-neutral representation)
  private val eventsHourly = GraftQuery(
    "q_events_hourly",
    (s, d) =>
      events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00")
            .as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .orderBy(asc("hour"), asc("event_type")),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00')
                AS hour,
              event_type, COUNT(*) AS cnt,
              ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""),
    headline = true)

  // ---- headline: TPC-H Q1-style pricing summary ----------------------
  private val pricingSummary = GraftQuery(
    "q_pricing_summary",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate").cast("date") <= lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 0).cast("long").as("sum_qty"),
          round(sum("l_extendedprice"), 0).cast("long").as("sum_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 0)
            .cast("long").as("sum_disc_price"),
          count(lit(1)).as("cnt"))
        .orderBy(asc("l_returnflag"), asc("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS sum_qty,
              CAST(ROUND(SUM(l_extendedprice), 0) AS BIGINT) AS sum_price,
              CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT)
                AS sum_disc_price,
              COUNT(*) AS cnt
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""),
    headline = true)

  // ---- headline: 3-way join + agg (customer->orders->lineitem) -------
  //      customer is the small side => broadcast; orders⋈lineitem is the
  //      real shuffle join that dominates at scale.
  private val segmentRevenue = GraftQuery(
    "q_segment_revenue",
    (s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_items"),
             round(sum("l_extendedprice"), 0).cast("long").as("revenue"))
        .orderBy(desc("revenue"), asc("c_mktsegment")),
    Some("""SELECT c_mktsegment, COUNT(*) AS n_items,
              CAST(ROUND(SUM(l_extendedprice), 0) AS BIGINT) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY c_mktsegment ORDER BY revenue DESC, c_mktsegment"""),
    headline = true)

  // ---- §2.9 extension: window-function breadth — lag/lead/running
  //      aggregates over a deterministic per-key order ----------------
  private val windowFuncs = GraftQuery(
    "q_window_funcs",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          col("o_totalprice"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          round(sum("o_totalprice").over(cum), 2).as("running_total"),
          row_number().over(w).as("order_seq"))
        .filter(col("o_custkey") < 50)
        .orderBy(asc("o_custkey"), asc("order_seq"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
              LAG(o_totalprice, 1) OVER w AS prev_price,
              LEAD(o_totalprice, 1) OVER w AS next_price,
              ROUND(SUM(o_totalprice) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS running_total,
              CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq
            FROM orders
            WHERE o_custkey < 50
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, order_seq"""))

  override val queries: Seq[GraftQuery] = Seq(
    countByBrand, filterSort, derivedAge, groupAvgHaving, globalKpis,
    aboveAvgSubquery, top5CteJoin, joinInner, joinLeft, joinRight,
    pointLookup, isinFilter, unionSlices, distinctDomains, distinctCount,
    windowRank, rollupAgg, crudSnapshot, upsert, wktExtract,
    textClean, safeCast, eventsHourly, pricingSummary, segmentRevenue,
    windowFuncs)
}
