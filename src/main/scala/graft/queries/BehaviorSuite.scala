package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Sampling

/** Behavioral / event-sequence analytics over the events stream table —
  * funnel conversion, cohort retention, and deterministic sampling.
  * Extensions beyond the reference's static-aggregate dashboard
  * (SURVEY.md §2.5), each oracle-checked.
  *
  * Timestamp comparisons in oracles go through `epoch_us(..)` so DuckDB
  * (nanos) compares at the same precision Spark reads (micros via
  * nanosAsLong — see graft.Tables.events).
  */
object BehaviorSuite extends QuerySuite {

  // ---- funnel: view → click → purchase conversion counts -------------
  // One groupBy(user) pass computes each user's first ts per stage
  // (min-of-conditional — map-side partial agg), then a single global
  // agg counts stage completions in order. Two shuffles total,
  // no self-joins — the shape that survives 100 TB of events.
  private val funnel = GraftQuery(
    "q_funnel",
    (s, d) => {
      val perUser = events(s, d).groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("ts"))).as("v"),
        min(when(col("event_type") === "click", col("ts"))).as("c"),
        min(when(col("event_type") === "purchase", col("ts"))).as("p"))
      perUser.agg(
        count(col("v")).as("n_view"),
        count(when(col("c") > col("v"), 1)).as("n_view_click"),
        count(when(col("c") > col("v") && col("p") > col("c"), 1))
          .as("n_view_click_purchase"))
    },
    Some("""WITH u AS (
              SELECT user_id,
                MIN(CASE WHEN event_type = 'view' THEN ts END) AS v,
                MIN(CASE WHEN event_type = 'click' THEN ts END) AS c,
                MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p
              FROM events GROUP BY user_id)
            SELECT COUNT(v) AS n_view,
              COUNT(CASE WHEN epoch_us(c) > epoch_us(v) THEN 1 END)
                AS n_view_click,
              COUNT(CASE WHEN epoch_us(c) > epoch_us(v)
                          AND epoch_us(p) > epoch_us(c) THEN 1 END)
                AS n_view_click_purchase
            FROM u"""))

  // ---- cohort retention: first-seen day × day offset -----------------
  private val retention = GraftQuery(
    "q_retention",
    (s, d) => {
      val e = events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
      val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
      e.join(first, "user_id")
        .select(col("user_id"), col("cohort_day"),
                datediff(col("day"), col("cohort_day")).as("day_offset"))
        .distinct() // a user active twice the same day counts once
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
                 col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(asc("cohort_day"), asc("day_offset"))
    },
    Some("""WITH e AS (
              SELECT user_id, CAST(ts AS DATE) AS day FROM events),
            f AS (
              SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
            a AS (
              SELECT DISTINCT e.user_id, f.cohort_day,
                date_diff('day', f.cohort_day, e.day) AS day_offset
              FROM e JOIN f ON e.user_id = f.user_id)
            SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
              CAST(day_offset AS INTEGER) AS day_offset,
              COUNT(*) AS n_users
            FROM a GROUP BY cohort_day, day_offset
            ORDER BY cohort_day, day_offset"""))

  // ---- deterministic 1/10 systematic sample + aggregate --------------
  private val sampleMod = GraftQuery(
    "q_sample_mod",
    (s, d) =>
      Sampling.moduloSample(lineitem(s, d), "l_orderkey", n = 10)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy(asc("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(*) AS n,
              ROUND(SUM(l_extendedprice), 2) AS revenue
            FROM lineitem WHERE l_orderkey % 10 = 0
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---- event-type transition matrix ----------------------------------
  // Per-user next-event bigrams via lead(): the Markov-chain view of
  // behavior streams. Deterministic order within a user needs a unique
  // tiebreak — (ts, event_id) — or equal timestamps make lead()
  // engine-dependent. One window shuffle on user_id, one small agg.
  private val transitions = GraftQuery(
    "q_transition_matrix",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      graft.Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
                 col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc("from_type"), asc("to_type"))
    },
    Some("""WITH seq AS (
              SELECT event_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS next_type
              FROM events)
            SELECT event_type AS from_type, next_type AS to_type,
              COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY from_type, to_type"""))

  override val queries: Seq[GraftQuery] =
    Seq(funnel, retention, sampleMod, transitions)
}
