package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-trip through the independent reader: XlsxSink's output must be
  * a workbook XlsxSource parses back value-for-value. (The reader
  * itself is validated against a third, python-stdlib writer — so
  * writer and reader are not a closed loop.)
  */
class XlsxSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_xlsx", name).toString

  test("write then read back: header, numbers, strings, nulls, booleans") {
    val df = Seq(
      (1L, "Seattle", Some(250), 1.5, true),
      (2L, "Tacoma <&> co", None, -0.25, false),
      (3L, "", Some(0), 99.0, true)
    ).toDF("id", "city", "range", "score", "ok")
      .withColumn("range", col("range"))
    val path = tmp("roundtrip.xlsx")
    XlsxSink.write(df, path, sheetName = "EV Data")
    val back = XlsxSource.readAutoHeader(spark, path,
      expected = Seq("id", "city", "range", "score", "ok"))
    val rows = back.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(0) === "1" && rows(0).getString(1) === "Seattle")
    assert(rows(0).getString(2) === "250" && rows(0).getString(4) === "true")
    // XML escaping survives
    assert(rows(1).getString(1) === "Tacoma <&> co")
    // null cell stays null; empty string is written as an empty inline
    // string (distinct from missing)
    assert(rows(1).isNullAt(2))
    assert(rows(1).getString(3) === "-0.25")
    assert(rows(2).getString(1) === "")
  }

  test("maxRows guard fails fast instead of writing an unbounded artifact") {
    val big = spark.range(0, 50).toDF("id")
    val e = intercept[IllegalArgumentException] {
      XlsxSink.write(big, tmp("toobig.xlsx"), maxRows = 10)
    }
    assert(e.getMessage.contains("maxRows"))
  }

  test("wide frames get multi-letter column refs (AA and beyond)") {
    val wide = spark.range(0, 2).toDF("id")
      .select(col("id") +: (0 until 30).map(i => lit(i).as(s"c$i")): _*)
    val path = tmp("wide.xlsx")
    XlsxSink.write(wide, path)
    val rows = XlsxSource.parseWorkbook(new java.io.FileInputStream(path))
    assert(rows.head.cells.length === 31)    // header row: id + 30 cols
    assert(rows.head.cells.last === "c29")
    assert(rows(1).cells.length === 31)
  }
}
