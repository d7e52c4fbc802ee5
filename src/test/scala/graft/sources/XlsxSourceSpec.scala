package graft.sources

import java.io.FileInputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.model.EvSchema

/** Reader-side coverage of the fixture built by the INDEPENDENT python
  * writer (tools/make_xlsx_fixture.py): shared strings, inline strings,
  * rich-text runs, numbers, sparse cell refs, ragged rows, junk rows
  * above the header, sheet selection, and the Hadoop-FS open path.
  */
class XlsxSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val fixture = "/root/repo/src/test/resources/fixtures/musemotion_like.xlsx"

  test("colIndex decodes A/Z/AA/BC refs") {
    assert(XlsxSource.colIndex("A1") === 0)
    assert(XlsxSource.colIndex("Z9") === 25)
    assert(XlsxSource.colIndex("AA12") === 26)
    assert(XlsxSource.colIndex("BC7") === 54)
  }

  test("parseWorkbook: junk rows, header, data, cell encodings") {
    val rows = XlsxSource.parseWorkbook(new FileInputStream(fixture))
    // 3 junk + 1 header + 44 data
    assert(rows.length === 48)
    assert(rows(0).cells.head === "MuseMotion EV export")
    assert(rows(1).cells.forall(_ == null))        // fully empty row
    // sparse refs: junk row 3 wrote A,B,D — C must be null
    assert(rows(2).cells(2) == null && rows(2).cells(3) == "internal")
    val header = rows(3).cells
    assert(header.head === "VIN" && header(5) === "Vehicle Type")
    // first data row: shared strings + raw numbers
    val r0 = rows(4).cells
    assert(r0(0) === "5YJ0000XLSX" && r0(2) === "2012" && r0(8) === "100000")
    // ragged row padded to sheet width with nulls
    val ragged = rows.find(_.cells.head == "5YJEDGE00002").get.cells
    assert(ragged.length === 11 && ragged(3) === "KIA" && ragged(10) == null)
    // inline string + rich-text runs concatenate
    val rt = rows.find(_.cells.head == "5YJEDGE00003").get.cells
    assert(rt(4) === "MODEL-RT" && rt(10) === "INLINE UTILITY CO")
    // float-typed numeric cell keeps its raw text
    assert(rt(7) === "99.0")
  }

  test("maxRows early-stop and named-sheet selection") {
    val probe = XlsxSource.parseWorkbook(new FileInputStream(fixture), maxRows = 5)
    assert(probe.length === 5)
    val decoy = XlsxSource.parseWorkbook(
      new FileInputStream(fixture), sheet = Some("Notes"))
    assert(decoy.length === 1 && decoy(0).cells.head === "decoy")
    val err = intercept[IllegalArgumentException] {
      XlsxSource.parseWorkbook(new FileInputStream(fixture), sheet = Some("Nope"))
    }
    assert(err.getMessage.contains("EV Data"))
  }

  test("readAutoHeader: detects header under junk rows, imposes names") {
    val df = XlsxSource.readAutoHeader(spark, fixture, EvSchema.sourceColumns)
    assert(df.columns.toSeq === EvSchema.sourceColumns)
    assert(df.count() === 44)
    val tacoma = df.filter(col("vin") === "5YJEDGE00002").collect()(0)
    assert(tacoma.getString(3) === "KIA" && tacoma.isNullAt(10))
  }

  test("read goes through Hadoop FileSystem: explicit file: scheme works") {
    val df = XlsxSource.read(spark, s"file:$fixture")
    assert(df.count() === 48)
    // decoy sheet not read by default (first sheet in workbook order wins)
    assert(df.filter(col("cells").getItem(0) === "decoy").count() === 0)
  }
}
