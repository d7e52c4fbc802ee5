package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.SnapshotDiff

/** Warehouse-maintenance patterns: CDC snapshot diff and incremental
  * aggregate maintenance — the operations that keep a 100 TB serving
  * layer fresh without full recomputes. Both oracle-checked; the
  * incremental query's oracle IS the full recompute, so the gate proves
  * the incremental algebra exactly.
  */
object WarehouseSuite extends QuerySuite {

  // ---- CDC: diff two snapshot versions -------------------------------
  // after = orders with keys %37==0 deleted, totalprice bumped +10 for
  // keys %10==0, two inserted keys — all deterministic, so the change
  // set is exactly recoverable and cross-engine checkable.
  private val snapshotDiff = GraftQuery(
    "q_snapshot_diff",
    (s, d) => {
      val before = orders(s, d).select("o_orderkey", "o_totalprice")
      val spark = s
      import spark.implicits._
      val inserted = Seq((-1L, 111.11), (-2L, 222.22))
        .toDF("o_orderkey", "o_totalprice")
      val after = before
        .filter(pmod(col("o_orderkey"), lit(37)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(10)) === 0,
               col("o_totalprice") + 10).otherwise(col("o_totalprice")))
        .unionByName(inserted)
      SnapshotDiff.diff(before, after, Seq("o_orderkey"))
        .orderBy(asc("o_orderkey"))
    },
    Some("""WITH before_s AS (
              SELECT o_orderkey, o_totalprice FROM orders),
            after_s AS (
              SELECT o_orderkey,
                CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 10
                     ELSE o_totalprice END AS o_totalprice
              FROM orders WHERE o_orderkey % 37 <> 0
              UNION ALL
              SELECT * FROM (VALUES (-1, 111.11), (-2, 222.22))
                v(o_orderkey, o_totalprice)),
            j AS (
              SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
                b.o_orderkey IS NULL AS added,
                a.o_orderkey IS NULL AS removed,
                b.o_totalprice IS DISTINCT FROM a.o_totalprice AS differs
              FROM before_s b FULL OUTER JOIN after_s a USING (o_orderkey))
            SELECT o_orderkey,
              CASE WHEN added THEN 'added'
                   WHEN removed THEN 'removed'
                   ELSE 'changed' END AS status
            FROM j WHERE added OR removed OR differs
            ORDER BY o_orderkey"""))

  // ---- incremental aggregate maintenance -----------------------------
  // State = first half of the stream aggregated; delta = second half;
  // merged = full-outer coalesce of partial aggregates. The ORACLE is
  // the one-shot aggregation over everything — the gate hash-proves
  // state ⊕ delta == recompute.
  private val incrementalAgg = GraftQuery(
    "q_incremental_agg",
    (s, d) => {
      val ev = events(s, d).select(
        col("user_id"), col("ts"), col("value"))
      val cut = lit("2024-01-16").cast("date")
      val agg = (df: org.apache.spark.sql.DataFrame) =>
        df.groupBy("user_id").agg(
          count(lit(1)).as("n"), sum("value").as("sv"))
      val state = agg(ev.filter(to_date(col("ts")) < cut))
        .withColumnRenamed("n", "n_s").withColumnRenamed("sv", "sv_s")
      val delta = agg(ev.filter(to_date(col("ts")) >= cut))
        .withColumnRenamed("n", "n_d").withColumnRenamed("sv", "sv_d")
      state.join(delta, Seq("user_id"), "full_outer")
        .select(
          col("user_id"),
          (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
            .as("n_events"),
          round(coalesce(col("sv_s"), lit(0.0)) +
                coalesce(col("sv_d"), lit(0.0)), 2).as("sum_value"))
        .orderBy(asc("user_id"))
    },
    Some("""SELECT user_id, COUNT(*) AS n_events,
              ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY user_id ORDER BY user_id"""))

  // ---- keep-latest-per-key dedup (CDC compaction) --------------------
  // One max_by aggregate per key: the standard changelog→snapshot
  // compaction. Tie-break on event_id inside the ordering struct keeps
  // it deterministic under equal timestamps.
  private val keepLatest = GraftQuery(
    "q_keep_latest",
    (s, d) =>
      graft.Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(
          max_by(col("event_id"), struct(col("ts"), col("event_id")))
            .as("latest_event_id"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("latest_ts"),
          count(lit(1)).as("n_superseded"))
        .orderBy(asc("user_id"), asc("event_type")),
    Some("""WITH g AS (
              SELECT user_id, event_type,
                strftime(CAST(MAX(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
                  AS latest_ts,
                COUNT(*) AS n_superseded
              FROM events GROUP BY user_id, event_type),
            r AS (
              SELECT user_id, event_type, event_id,
                ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                  ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
            SELECT g.user_id, g.event_type,
              r.event_id AS latest_event_id, g.latest_ts, g.n_superseded
            FROM g JOIN r USING (user_id, event_type)
            WHERE r.rn = 1
            ORDER BY user_id, event_type"""))

  // ---- percent-of-total (ratio_to_report) ----------------------------
  private val revenueShare = GraftQuery(
    "q_revenue_share",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      graft.Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
        .withColumn("share_pct",
          round(col("rev") * 100.0 / sum(col("rev")).over(w), 4))
        .orderBy(asc("o_orderpriority"))
    },
    Some("""WITH r AS (
              SELECT o_orderpriority, ROUND(SUM(o_totalprice), 2) AS rev
              FROM orders GROUP BY o_orderpriority)
            SELECT o_orderpriority, rev,
              ROUND(rev * 100.0 / SUM(rev) OVER (), 4) AS share_pct
            FROM r ORDER BY o_orderpriority"""))

  // ---- dynamic partition pruning over a partitioned lake layout ------
  // The 100 TB staple: a fact laid out by month (Sinks.writePartitionedByDate)
  // joined to a filtered dim must scan ONLY the matching partitions, with
  // the partition list discovered AT RUNTIME from the dim side. The dim's
  // filter is deliberately on an AGGREGATED column (year of MIN(date)) so
  // static constraint propagation cannot rewrite it onto o_month — only
  // runtime DPP can prune the scan (a static filter would make this a
  // plain pushdown demo). The dim is built from the base table, so DuckDB
  // reproduces the result without seeing the partitioned copy; PlanSpec
  // pins dynamicpruningexpression in the fact scan's PartitionFilters.
  private val dppPrune = GraftQuery(
    "q_dpp_prune",
    (s, d) => {
      // The lake key carries a CONTENT fingerprint of the source orders
      // parquet (file names + sizes + mtimes), not just the dataset dir
      // name: a regenerated dataset at the same path gets a fresh layout
      // instead of silently serving the stale persisted one while the
      // oracle reads fresh data.
      val srcFp = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
          else Seq(f)
        val sig = walk(new java.io.File(d, "orders.parquet"))
          .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
          .mkString("|")
        java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(sig).toLong & 0xffffffffL)
      }
      val lakePath = System.getProperty("java.io.tmpdir") +
        "/graft_dpp_lake_" + d.replaceAll("[^0-9a-zA-Z.]", "_") + "_" + srcFp
      // Write-once: the layout is keyed by the dataset dir + source
      // fingerprint and the fact projection is deterministic, so a
      // committed layout (_SUCCESS from a completed overwrite) is reused
      // by later runs instead of being rewritten and orphaned on every
      // verify invocation.
      if (!new java.io.File(lakePath, "_SUCCESS").exists()) {
        val fact = orders(s, d).select(
          col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
        graft.sources.Sinks.writePartitionedByDate(fact, lakePath, "o_month")
      }
      val lake = s.read.parquet(lakePath)
      val dim = orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
        .agg(min(col("o_orderdate").cast("date")).as("first_day"))
        .filter(year(col("first_day")) === 1995)
        .select("o_month")
      lake.join(broadcast(dim), Seq("o_month"))
        .groupBy("o_month")
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(asc("o_month"))
    },
    Some("""WITH f AS (
              SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS o_month,
                     o_totalprice
              FROM orders),
            dim AS (
              SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS o_month,
                     MIN(CAST(o_orderdate AS DATE)) AS first_day
              FROM orders GROUP BY 1)
            SELECT f.o_month, COUNT(*) AS n_orders,
                   ROUND(SUM(f.o_totalprice), 2) AS revenue
            FROM f JOIN dim USING (o_month)
            WHERE EXTRACT(YEAR FROM dim.first_day) = 1995
            GROUP BY f.o_month ORDER BY f.o_month"""))

  override val queries: Seq[GraftQuery] =
    Seq(snapshotDiff, incrementalAgg, keepLatest, revenueShare, dppPrune)
}
