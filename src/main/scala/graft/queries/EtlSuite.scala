package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.etl.CleanPipeline

/** The §3.2 clean lifecycle and §7.5 array extension surfaced through
  * the driver's correctness gate: a deterministic "messy EV" frame is
  * synthesized from the customer table (sentinel NAs, unparseable
  * numerics, WKT points), then run through the REAL
  * [[graft.etl.CleanPipeline]]; the oracle re-states the same semantics
  * in ANSI SQL.
  *
  * Fixture rules keep cross-engine hashing exact: all numerics are
  * integral (Spark truncates double→int, DuckDB rounds — fractional
  * values would diverge), and WKT coordinates come from integer keys.
  */
object EtlSuite extends QuerySuite {

  /** Messy 11-column raw frame, derived 1:1 from customer rows. */
  private def messyRaw(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    customer(s, d).select(
      when(k % 37 === 0, lit("nan"))
        .otherwise(concat(lit("VIN"), k.cast("string"))).as("vin"),
      when(k % 41 === 0, lit(""))
        .otherwise(col("c_mktsegment")).as("city"),
      when(k % 13 === 0, lit("bad"))
        .otherwise((lit(1995) + (k % 25)).cast("string")).as("year"),
      concat(lit("MAKE_"), (k % 7).cast("string")).as("make"),
      col("c_name").as("model"),
      when(k % 2 === 0, lit("BEV")).otherwise(lit("PHEV")).as("vehicle_type"),
      col("c_mktsegment").as("eligibility"),
      when(k % 11 === 0, lit("x"))
        .otherwise((k % 300).cast("string")).as("electric_range"),
      (k * 1000).cast("string").as("vehicle_id"),
      when(k % 17 === 0, lit("no point here"))
        .otherwise(concat(lit("POINT ("), col("c_nationkey").cast("string"),
                          lit(" "), (k % 90).cast("string"), lit(")")))
        .as("location"),
      concat(lit("U"), (k % 3).cast("string"), lit("||U"),
             (k % 5).cast("string")).as("utility"))
  }

  /** DuckDB twin of [[messyRaw]]. */
  private val messyRawSql =
    """SELECT
         CASE WHEN c_custkey % 37 = 0 THEN 'nan'
              ELSE 'VIN' || CAST(c_custkey AS VARCHAR) END AS vin,
         CASE WHEN c_custkey % 41 = 0 THEN '' ELSE c_mktsegment END AS city,
         CASE WHEN c_custkey % 13 = 0 THEN 'bad'
              ELSE CAST(1995 + (c_custkey % 25) AS VARCHAR) END AS year,
         'MAKE_' || CAST(c_custkey % 7 AS VARCHAR) AS make,
         c_name AS model,
         CASE WHEN c_custkey % 2 = 0 THEN 'BEV' ELSE 'PHEV' END AS vehicle_type,
         c_mktsegment AS eligibility,
         CASE WHEN c_custkey % 11 = 0 THEN 'x'
              ELSE CAST(c_custkey % 300 AS VARCHAR) END AS electric_range,
         CAST(c_custkey * 1000 AS VARCHAR) AS vehicle_id,
         CASE WHEN c_custkey % 17 = 0 THEN 'no point here'
              ELSE 'POINT (' || CAST(c_nationkey AS VARCHAR) || ' ' ||
                   CAST(c_custkey % 90 AS VARCHAR) || ')' END AS location,
         'U' || CAST(c_custkey % 3 AS VARCHAR) || '||U' ||
           CAST(c_custkey % 5 AS VARCHAR) AS utility
       FROM customer"""

  // ---- the full clean pipeline (pipeline.py:81-123) through the gate --
  private val cleanPipeline = GraftQuery(
    "q_clean_pipeline",
    (s, d) =>
      CleanPipeline.clean(messyRaw(s, d))
        .orderBy(asc("vin")),
    Some(s"""WITH raw AS ($messyRawSql),
             norm AS (
               SELECT
                 CASE WHEN TRIM(vin) IN ('nan','None','') THEN NULL
                      ELSE TRIM(vin) END AS vin,
                 CASE WHEN TRIM(city) IN ('nan','None','') THEN NULL
                      ELSE TRIM(city) END AS city,
                 year, make, model, vehicle_type, eligibility,
                 electric_range, vehicle_id, location, utility
               FROM raw)
             SELECT vin, city,
               CAST(TRY_CAST(year AS DOUBLE) AS INTEGER) AS year,
               TRIM(make) AS make, TRIM(model) AS model,
               TRIM(vehicle_type) AS vehicle_type,
               TRIM(eligibility) AS eligibility,
               CAST(TRY_CAST(electric_range AS DOUBLE) AS INTEGER)
                 AS electric_range,
               CAST(TRY_CAST(vehicle_id AS DOUBLE) AS BIGINT) AS vehicle_id,
               TRIM(utility) AS utility,
               CAST(NULLIF(regexp_extract(location,
                 'POINT\\s*\\(\\s*([-0-9.]+)\\s+([-0-9.]+)\\s*\\)', 2), '')
                 AS DOUBLE) AS latitude,
               CAST(NULLIF(regexp_extract(location,
                 'POINT\\s*\\(\\s*([-0-9.]+)\\s+([-0-9.]+)\\s*\\)', 1), '')
                 AS DOUBLE) AS longitude
             FROM norm
             WHERE vin IS NOT NULL AND city IS NOT NULL
             ORDER BY vin"""))

  // ---- §7.5: multi-value column → ArrayType + explode + agg ----------
  private val utilityExplode = GraftQuery(
    "q_utility_explode",
    (s, d) =>
      CleanPipeline.utilityArray(messyRaw(s, d))
        .select(explode(col("utilities")).as("utility_name"))
        .groupBy("utility_name")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc("utility_name")),
    Some(s"""WITH raw AS ($messyRawSql),
             exploded AS (
               SELECT TRIM(u) AS utility_name
               FROM raw, unnest(string_split_regex(utility, '\\|+')) AS t(u))
             SELECT utility_name, COUNT(*) AS cnt FROM exploded
             WHERE utility_name <> ''
             GROUP BY utility_name ORDER BY utility_name"""))

  override val queries: Seq[GraftQuery] = Seq(cleanPipeline, utilityExplode)
}
