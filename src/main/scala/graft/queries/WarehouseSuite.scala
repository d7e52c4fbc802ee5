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

  override val queries: Seq[GraftQuery] = Seq(snapshotDiff, incrementalAgg)
}
