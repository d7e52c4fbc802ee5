package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Newline-delimited JSON ingest — the interchange format LLM corpora
  * actually ship in (one document object per line). Schema is IMPOSED,
  * never inferred: at 100 TB schema inference is a full extra pass
  * over the data, and silent type drift between shards becomes
  * null-rows-with-no-error; an explicit `StructType` makes the scan a
  * single pass with per-field decode straight into Tungsten rows.
  *
  * Malformed lines follow Spark's PERMISSIVE contract: the row
  * survives with nulls and the raw line lands in `corruptCol` when the
  * caller asks for it (a quarantine column a pipeline can route to a
  * dead-letter sink) — DROPMALFORMED/FAILFAST are the strict dials.
  * JSONL is splittable (newline-framed), so unlike multiline JSON a
  * single huge file still parallelizes across executors.
  */
object JsonlSource {

  /** Read `path` (file, directory, or glob) under `schema`.
    * `corruptCol` non-empty adds the PERMISSIVE quarantine column
    * capturing each malformed source line.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "PERMISSIVE",
           corruptCol: String = ""): DataFrame = {
    val withCorrupt =
      if (corruptCol.isEmpty) schema
      else StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(
          corruptCol, org.apache.spark.sql.types.StringType, true))
    val reader = spark.read
      .schema(withCorrupt)
      .option("mode", mode)
      // JSONL contract: one object per line; multiLine=false keeps the
      // input splittable (a multiline file is one unsplittable task)
      .option("multiLine", "false")
    // only name the corrupt column when the caller wants one: setting
    // columnNameOfCorruptRecord alongside DROPMALFORMED makes Spark
    // keep partially-parsed rows (a truncated line with doc_id already
    // read survives) instead of dropping them
    (if (corruptCol.isEmpty) reader
     else reader.option("columnNameOfCorruptRecord", corruptCol))
      .json(path)
  }
}
