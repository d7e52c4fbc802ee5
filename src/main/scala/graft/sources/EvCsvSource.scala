package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.EvSchema

/** The reference's CSV ingest surface (SURVEY.md §2.1 S1/S2):
  *
  *  - S1: headerless CSV with the 11 canonical names imposed positionally
  *    (/root/reference/load_local_to_db.py:94). The physical file is
  *    ragged (15–16 columns, junk tail); PERMISSIVE mode with an
  *    11-column schema reproduces "impose schema, ignore the tail".
  *  - S2: a directory/glob of CSVs read as ONE multi-file scan —
  *    the per-blob loop + pd.concat (/root/reference/pipeline.py:126-150)
  *    collapses into a single distributed scan; per-file error tolerance
  *    maps to PERMISSIVE/badRecordsPath instead of try/except-per-blob.
  *
  * At 100 TB, a glob scan parallelizes by file split; never loop files
  * on the driver.
  */
object EvCsvSource {

  /** S1 — one headerless, possibly-ragged CSV; or S2 — a glob of them
    * (a star pattern or a directory path: Spark treats both as one
    * multi-file relation).
    */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(EvSchema.rawSchema)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      // the reference files quote WKT points containing commas
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  /** Full ingest: raw scan composed with the clean pipeline — the §3.2
    * lifecycle as one lazy plan (scan → clean → caller's sink).
    */
  def readClean(spark: SparkSession, path: String): DataFrame =
    graft.etl.CleanPipeline.clean(readRaw(spark, path))

  /** Variant that CAPTURES malformed rows instead of silently absorbing
    * them — the auditable form of the reference's per-blob
    * try/except-and-log (/root/reference/pipeline.py:141-142). Rows
    * whose raw text could not be parsed land with the original line in
    * `_corrupt_record`; downstream splits on its nullness to route a
    * quarantine stream.
    */
  def readRawCapturing(spark: SparkSession, path: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      EvSchema.rawSchema.fields :+
        org.apache.spark.sql.types.StructField(
          "_corrupt_record", org.apache.spark.sql.types.StringType,
          nullable = true))
    spark.read
      .schema(schema)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
  }
}
