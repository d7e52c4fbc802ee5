package graft.etl

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.model.EvSchema

/** Edge-semantics pins for the clean pipeline (SURVEY.md §5.2 item 2):
  * pandas-NA sentinels, coerce-to-null, WKT spacing/negative/no-match,
  * ragged columns, critical-null drops.
  */
class CleanPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rawDf(rows: Seq[Seq[String]], ncols: Int) = {
    val schema = org.apache.spark.sql.types.StructType(
      (0 until ncols).map(i => org.apache.spark.sql.types.StructField(
        s"_c$i", org.apache.spark.sql.types.StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r.padTo(ncols, null): _*))),
      schema)
  }

  private val goodRow = Seq(
    "VIN123", "Seattle", "2020", "TESLA", "Model 3", "BEV",
    "Clean Alternative Fuel Vehicle Eligible", "266", "123456",
    "POINT (-122.33 47.61)", "SEATTLE CITY LIGHT")

  test("imposeColumns truncates ragged extra columns") {
    val df = rawDf(Seq(goodRow ++ Seq("junk1", "junk2")), 13)
    val out = CleanPipeline.imposeColumns(df)
    assert(out.columns.toSeq == EvSchema.sourceColumns)
  }

  test("cleanText maps 'nan'/'None'/''/whitespace to null and trims") {
    val df = CleanPipeline.imposeColumns(rawDf(Seq(
      Seq("  V1  ", "nan", "2020", "None", "", "  ", "ok", "1", "2", "p", "u")), 11))
    val r = CleanPipeline.cleanText(df).collect()(0)
    assert(r.getString(0) == "V1")          // trimmed
    assert(r.isNullAt(1))                   // 'nan' city
    assert(r.isNullAt(3))                   // 'None' make
    assert(r.isNullAt(4))                   // '' model
    assert(r.isNullAt(5))                   // whitespace-only vehicle_type
    assert(r.getString(6) == "ok")
  }

  test("coerceNumerics: unparseable to null, float-strings truncate, valid parse") {
    val df = CleanPipeline.imposeColumns(rawDf(Seq(
      Seq("V1", "C", "twenty", "M", "M", "T", "E", "2020.0", "not_a_number", "p", "u"),
      Seq("V2", "C", "2019", "M", "M", "T", "E", "150", "99", "p", "u")), 11))
    val out = CleanPipeline.coerceNumerics(df).orderBy("vin").collect()
    assert(out(0).isNullAt(2))                      // 'twenty' year
    assert(out(0).getInt(7) == 2020)                // '2020.0' electric_range
    assert(out(0).isNullAt(8))                      // bad vehicle_id
    assert(out(1).getInt(2) == 2019)
    assert(out(1).getLong(8) == 99L)
  }

  test("extractLatLon: spacing variants, negatives, no-match → null") {
    val cases = Seq(
      ("POINT (-122.33 47.61)", Some(47.61), Some(-122.33)),
      ("POINT(-122.33 47.61)", Some(47.61), Some(-122.33)),
      ("POINT  ( -122.33   47.61 )", Some(47.61), Some(-122.33)),
      ("POINT (0.0 -90.5)", Some(-90.5), Some(0.0)),
      ("not a point", None, None),
      ("", None, None))
    val df = spark.createDataFrame(cases.map(c => Tuple1(c._1))).toDF("location")
    val out = CleanPipeline.extractLatLon(df).collect()
    cases.zip(out).foreach { case ((loc, lat, lon), row) =>
      assert(Option(row.get(1)) == lat, s"lat for '$loc'")
      assert(Option(row.get(2)) == lon, s"lon for '$loc'")
    }
  }

  test("full clean: sentinels dropped by critical-null, schema canonical") {
    val df = rawDf(Seq(
      goodRow,
      Seq("nan") ++ goodRow.tail,                 // vin='nan' → dropped
      Seq("V2", "") ++ goodRow.drop(2),           // blank city → dropped
      Seq("V3", "Tacoma", "bad_year", "KIA", "EV6", "BEV", "E", "x", "y",
          "no point here", "PSE||TACOMA POWER")), // coerce+regex nulls
      11)
    val out = CleanPipeline.clean(df)
    assert(out.columns.toSeq == EvSchema.finalColumns)
    val rows = out.orderBy("vin").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("V3", "VIN123"))
    val v3 = rows(0)
    assert(v3.isNullAt(2) && v3.isNullAt(7) && v3.isNullAt(8))  // coerced nulls
    assert(v3.isNullAt(10) && v3.isNullAt(11))                  // no WKT match
    val v1 = rows(1)
    assert(v1.getInt(2) == 2020 && v1.getDouble(10) == 47.61 &&
           v1.getDouble(11) == -122.33)
  }

  test("clean composes into a single plan (no eager materialization)") {
    val df = rawDf(Seq(goodRow), 11)
    val plan = CleanPipeline.clean(df).queryExecution.optimizedPlan
    // one pass: the optimized plan contains no shuffle-introducing nodes
    val s = plan.toString
    assert(!s.contains("Exchange") && !s.contains("Sort"))
  }

  test("utilityArray splits on | and || and trims empties") {
    val df = Seq("PSE||TACOMA POWER", "SEATTLE CITY LIGHT", "A|B|C", "")
      .toDF("utility")
    val out = CleanPipeline.utilityArray(df).select("utilities")
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("PSE", "TACOMA POWER"))
    assert(out(1) == Seq("SEATTLE CITY LIGHT"))
    assert(out(2) == Seq("A", "B", "C"))
    assert(out(3) == Seq())
  }
}
