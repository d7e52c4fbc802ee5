package graft.model

import org.apache.spark.sql.types._

/** Canonical logical schema of the reference's EV-registration table
  * (SURVEY.md §1.2; /root/reference/pipeline.py:32-35 source columns,
  * /root/reference/load_local_to_db.py:122-137 declared DB types).
  *
  * The reference drifts between two naming conventions
  * (eligibility_reason/odometer/some_id/geom_wkt in the SQL dump vs
  * eligibility/electric_range/vehicle_id/location in Python); this ONE
  * StructType is the engine's source of truth, with name drift handled at
  * ingest by [[graft.etl.SchemaResolver]].
  */
object EvSchema {

  /** The 11 source columns, in the positional order every loader imposes
    * on the headerless CSV (/root/reference/load_local_to_db.py:25-37).
    */
  val sourceColumns: Seq[String] = Seq(
    "vin", "city", "year", "make", "model", "vehicle_type",
    "eligibility", "electric_range", "vehicle_id", "location", "utility")

  /** Raw ingest schema: everything a string, mirroring header=None CSV
    * reads; typing happens in the clean pipeline (coerce-to-null).
    */
  val rawSchema: StructType =
    StructType(sourceColumns.map(StructField(_, StringType, nullable = true)))

  /** Post-clean canonical schema: typed, with derived latitude/longitude
    * appended and raw `location` dropped
    * (/root/reference/pipeline.py:118-120).
    */
  val cleanSchema: StructType = StructType(Seq(
    StructField("vin", StringType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("year", IntegerType, nullable = true),
    StructField("make", StringType, nullable = true),
    StructField("model", StringType, nullable = true),
    StructField("vehicle_type", StringType, nullable = true),
    StructField("eligibility", StringType, nullable = true),
    StructField("electric_range", IntegerType, nullable = true),
    StructField("vehicle_id", LongType, nullable = true),
    StructField("utility", StringType, nullable = true),
    StructField("latitude", DoubleType, nullable = true),
    StructField("longitude", DoubleType, nullable = true)))

  /** Final projection order (clean pipeline output). */
  val finalColumns: Seq[String] = cleanSchema.fieldNames.toSeq

  /** Columns whose nullness disqualifies a row
    * (/root/reference/pipeline.py:104-105 dropna subset).
    */
  val criticalColumns: Seq[String] = Seq("vin", "city")

  /** Text columns that get trim + sentinel-to-null normalization
    * (/root/reference/pipeline.py:98-102).
    */
  val textColumns: Seq[String] = Seq(
    "vin", "city", "make", "model", "vehicle_type", "eligibility", "utility")

  /** Columns coerced to numeric with null-on-failure
    * (/root/reference/pipeline.py:107-110).
    */
  val numericColumns: Map[String, DataType] = Map(
    "year" -> IntegerType,
    "electric_range" -> IntegerType,
    "vehicle_id" -> LongType)

  /** The demo dimension table (/root/reference/musemotion-queries.sql:91-95). */
  val utilitiesSchema: StructType = StructType(Seq(
    StructField("utility_id", IntegerType, nullable = false),
    StructField("utility_name", StringType, nullable = true),
    StructField("region", StringType, nullable = true)))
}

/** Typed boundary for tests and Dataset[T] use (SURVEY.md §1.6). */
final case class EvRecord(
    vin: String,
    city: String,
    year: Option[Int],
    make: Option[String],
    model: Option[String],
    vehicle_type: Option[String],
    eligibility: Option[String],
    electric_range: Option[Int],
    vehicle_id: Option[Long],
    utility: Option[String],
    latitude: Option[Double],
    longitude: Option[Double])
