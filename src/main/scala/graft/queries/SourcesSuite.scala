package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.etl.CleanPipeline
import graft.model.EvSchema
import graft.sources.XlsxSource

/** S3 through the correctness gate: the committed fixture workbook
  * (junk metadata rows above the header, shared/inline/rich-text
  * strings, numeric cells, sparse cell refs, a ragged row, a decoy
  * second sheet — built by an INDEPENDENT python-stdlib writer,
  * tools/make_xlsx_fixture.py) is read by [[XlsxSource.readAutoHeader]]
  * and compared against DuckDB reading the fixture's CSV twin. This is
  * the reference dashboard's exact flow
  * (/root/reference/streamlit_app.py:43-77): probe for the header row,
  * then load the sheet under the detected names.
  */
object SourcesSuite extends QuerySuite {

  private val dir = "/root/repo/src/test/resources/fixtures"
  private val xlsx = s"$dir/musemotion_like.xlsx"
  private val csvTwin = s"$dir/musemotion_like.csv"

  private val csvRawSql =
    s"""SELECT "VIN" AS vin, "City" AS city, "Year" AS year, "Make" AS make,
              "Model" AS model, "Vehicle Type" AS vehicle_type,
              "Eligibility" AS eligibility,
              "Electric Range" AS electric_range, "Vehicle ID" AS vehicle_id,
              "Location" AS location, "Utility" AS utility
       FROM read_csv('$csvTwin', header=true, all_varchar=true)"""

  /** Raw auto-header read: every cell encoding lands as the same string
    * DuckDB reads from the CSV twin (missing cells null on both sides).
    */
  private val xlsxRead = GraftQuery(
    "q_xlsx_read",
    (s, _) =>
      XlsxSource.readAutoHeader(s, xlsx, EvSchema.sourceColumns)
        .orderBy(asc("vin")),
    Some(s"""$csvRawSql ORDER BY vin"""))

  /** The dashboard flow end-to-end: xlsx → header probe → clean
    * pipeline. Same oracle shape as q_clean_pipeline, with the raw CTE
    * swapped for the CSV twin.
    */
  private val xlsxClean = GraftQuery(
    "q_xlsx_clean",
    (s, _) =>
      CleanPipeline.clean(
        XlsxSource.readAutoHeader(s, xlsx, EvSchema.sourceColumns))
        .orderBy(asc("vin")),
    Some(s"""WITH raw AS ($csvRawSql),
             norm AS (
               SELECT
                 CASE WHEN TRIM(vin) IN ('nan','None','') THEN NULL
                      ELSE TRIM(vin) END AS vin,
                 CASE WHEN TRIM(city) IN ('nan','None','') THEN NULL
                      ELSE TRIM(city) END AS city,
                 CASE WHEN TRIM(make) IN ('nan','None','') THEN NULL
                      ELSE TRIM(make) END AS make,
                 CASE WHEN TRIM(model) IN ('nan','None','') THEN NULL
                      ELSE TRIM(model) END AS model,
                 CASE WHEN TRIM(vehicle_type) IN ('nan','None','') THEN NULL
                      ELSE TRIM(vehicle_type) END AS vehicle_type,
                 CASE WHEN TRIM(eligibility) IN ('nan','None','') THEN NULL
                      ELSE TRIM(eligibility) END AS eligibility,
                 CASE WHEN TRIM(utility) IN ('nan','None','') THEN NULL
                      ELSE TRIM(utility) END AS utility,
                 year, electric_range, vehicle_id, location
               FROM raw)
             SELECT vin, city,
               CAST(TRY_CAST(year AS DOUBLE) AS INTEGER) AS year,
               make, model, vehicle_type, eligibility,
               CAST(TRY_CAST(electric_range AS DOUBLE) AS INTEGER)
                 AS electric_range,
               CAST(TRY_CAST(vehicle_id AS DOUBLE) AS BIGINT) AS vehicle_id,
               utility,
               CAST(NULLIF(regexp_extract(location,
                 'POINT\\s*\\(\\s*([-0-9.]+)\\s+([-0-9.]+)\\s*\\)', 2), '')
                 AS DOUBLE) AS latitude,
               CAST(NULLIF(regexp_extract(location,
                 'POINT\\s*\\(\\s*([-0-9.]+)\\s+([-0-9.]+)\\s*\\)', 1), '')
                 AS DOUBLE) AS longitude
             FROM norm
             WHERE vin IS NOT NULL AND city IS NOT NULL
             ORDER BY vin"""))

  // ---- typed decode: date serials → ISO strings ----------------------

  private val datedXlsx = s"$dir/dated.xlsx"
  private val datedCsv = s"$dir/dated.csv"
  private val datedCols = Seq("Event ID", "Name", "Registration Date",
    "Last Seen", "Duration", "Score", "Elapsed")

  private val datedRawSql =
    s"""SELECT "Event ID" AS event_id, "Name" AS name,
              "Registration Date" AS registration_date,
              "Last Seen" AS last_seen, "Duration" AS duration,
              "Score" AS score, "Elapsed" AS elapsed
       FROM read_csv('$datedCsv', header=true, all_varchar=true)"""

  /** Date-bearing workbook under `typedDates=true`: every serial styled
    * with a date / custom-datetime / time number format must render the
    * SAME ISO string the CSV twin carries (python-datetime arithmetic —
    * an independent implementation), including the 1900 leap-bug edge
    * serials 1 / 59 / 61 and a text-typed date that must pass through.
    */
  private val xlsxTyped = GraftQuery(
    "q_xlsx_typed",
    (s, _) =>
      XlsxSource.readAutoHeader(s, datedXlsx, datedCols, typedDates = true)
        .orderBy(asc("event_id")),
    Some(s"""$datedRawSql ORDER BY event_id"""))

  /** The point of the decode: the column is date-CASTABLE downstream.
    * Group registrations by calendar year through a plain cast — with
    * raw serials this query would be meaningless.
    */
  private val xlsxTypedAgg = GraftQuery(
    "q_xlsx_typed_agg",
    (s, _) =>
      XlsxSource.readAutoHeader(s, datedXlsx, datedCols, typedDates = true)
        .groupBy(year(col("registration_date").cast("date")).as("reg_year"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc("reg_year")),
    Some(s"""SELECT CAST(EXTRACT(YEAR FROM CAST(registration_date AS DATE))
                    AS INTEGER) AS reg_year,
                    COUNT(*) AS n
             FROM ($datedRawSql)
             GROUP BY reg_year ORDER BY reg_year NULLS FIRST"""))

  // ---- JSONL corpus ingest (schema-imposed, nested decode) -----------
  // The committed fixture (tools/make_jsonl_fixture.py, python-stdlib
  // only) carries the decode edge cases a real LLM-corpus JSONL has:
  // escaped quotes/newlines inside strings, unicode, missing fields,
  // explicit nulls, scientific notation, pre-epoch ints, a doc_id
  // above 2^53 (BIGINT exactness), empty arrays, missing nested
  // objects. Output projects nested fields to scalars so the compare
  // is dtype-stable; text goes through md5 (the embedded newline would
  // otherwise be a csv-ish hashing hazard on neither engine's side —
  // md5 pins the exact decoded bytes instead).
  private val jsonl = s"$dir/docs_corpus.jsonl"

  private val jsonlRead = GraftQuery(
    "q_jsonl_read",
    (s, _) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("tags",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)),
        org.apache.spark.sql.types.StructField("meta",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("source",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("ts",
              org.apache.spark.sql.types.LongType))))))
      graft.sources.JsonlSource.read(s, jsonl, schema)
        .select(col("doc_id"), col("lang"), md5(col("text")).as("text_md5"),
          round(col("score"), 6).as("score"),
          // size(NULL) is -1 under this session's legacy sizeOfNull;
          // DuckDB len(NULL) is NULL — make the null explicit
          when(col("tags").isNotNull, size(col("tags")).cast("long"))
            .as("n_tags"),
          col("meta.source").as("src"), col("meta.ts").as("ts"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""SELECT doc_id, lang, md5(text) AS text_md5,
               ROUND(score, 6) AS score,
               len(tags) AS n_tags, meta.source AS src, meta.ts AS ts
             FROM read_json('$jsonl', format='newline_delimited',
               columns={'doc_id':'BIGINT','lang':'VARCHAR',
                        'text':'VARCHAR','score':'DOUBLE',
                        'tags':'VARCHAR[]',
                        'meta':'STRUCT(source VARCHAR, ts BIGINT)'})
             ORDER BY doc_id"""))

  // ---- schema drift across parquet batches ---------------------------
  // The ingest reality: batch 1 shipped (doc_id, text); batch 2 gained
  // a `lang` column. A mergeSchema read unions the footers AT THE SCAN
  // — one relation, batch-1 rows read lang as null, nothing rewritten.
  // The oracle replays the drift from the source table by construction.
  private val schemaDrift = GraftQuery(
    "q_schema_drift",
    (s, d) => {
      val base = documents(s, d)
      val dir = s"${GateStates.dir}/" +
        s"drift_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      base.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$dir/b1")
      base.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("lang"))
        .write.mode("overwrite").parquet(s"$dir/b2")
      graft.sources.Sinks.readMergedParquet(s, s"$dir/b1", s"$dir/b2")
        .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
        .orderBy(asc("doc_id"))
    },
    Some("""SELECT doc_id,
              CASE WHEN doc_id % 2 = 1 THEN lang END AS lang,
              md5(text) AS fp
            FROM documents ORDER BY doc_id"""))

  override val queries: Seq[GraftQuery] =
    Seq(xlsxRead, xlsxClean, xlsxTyped, xlsxTypedAgg, jsonlRead,
        schemaDrift)
}
