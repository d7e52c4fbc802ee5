package graft.sources

import java.io.FileInputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Typed-decode coverage (dates / number formats) over the fixtures
  * built by the INDEPENDENT python writer (tools/make_xlsx_fixture.py):
  * the 1900-system leap-bug serials, the 1904-system flag, custom
  * format-code classification, and the opt-in contract (typedDates
  * defaults OFF — raw serials unchanged).
  */
class XlsxTypedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/repo/src/test/resources/fixtures"
  private val dated = s"$dir/dated.xlsx"
  private val dated1904 = s"$dir/dated1904.xlsx"

  import XlsxSource.StyleKind

  test("serialToIso: 1900-system epochs and the Lotus leap bug") {
    def d(s: String) = XlsxSource.serialToIso(s, StyleKind.Date, date1904 = false)
    assert(d("1") === "1900-01-01")      // pre-bug epoch 1899-12-31
    assert(d("59") === "1900-02-28")
    // serial 60 is the fictitious 1900-02-29: decoded as 1900-02-28
    // (the LibreOffice reading) — pinned here, kept out of the oracle
    // gate because engines legitimately disagree on it
    assert(d("60") === "1900-02-28")
    assert(d("61") === "1900-03-01")     // post-bug epoch 1899-12-30
    assert(d("45000") === "2023-03-15")
    // negative serials are undisplayable in the 1900 system → raw
    assert(d("-5") === "-5")
  }

  test("serialToIso: time fraction, rounding, and day rollover") {
    def t(s: String) = XlsxSource.serialToIso(s, StyleKind.Time, date1904 = false)
    assert(t("0.5") === "12:00:00")
    assert(t("0.75") === "18:00:00")
    def dt(s: String) = XlsxSource.serialToIso(s, StyleKind.DateTime, date1904 = false)
    assert(dt("45000.25") === "2023-03-15 06:00:00")
    // fraction within half a second of midnight rolls into the next day
    assert(dt("45000.9999999") === "2023-03-16 00:00:00")
  }

  test("serialToIso: elapsed formats render totals past 24h/60m") {
    def e(s: String, k: Int) = XlsxSource.serialToIso(s, k, date1904 = false)
    val hms = StyleKind.elapsed(StyleKind.ElapsedH, 2)
    val hm = StyleKind.elapsed(StyleKind.ElapsedH, 1)
    val ms = StyleKind.elapsed(StyleKind.ElapsedM, 1)
    // 1.104166... days = 26h30m — [h] must NOT wrap at 24
    assert(e("1.1041666666666667", hms) === "26:30:00")
    assert(e("0.5", hms) === "12:00:00")
    // the tail follows the format code, not a hardcoded pattern:
    // [hh]:mm renders hours:minutes, bare [h] just the total hours
    assert(e("1.1041666666666667", hm) === "26:30")
    assert(e("1.1041666666666667", StyleKind.ElapsedH) === "26")
    // 0.06... days = 90 minutes — [mm] must NOT wrap at 60
    assert(e("0.0625", ms) === "90:00")
    assert(e("0.0625", StyleKind.ElapsedM) === "90")
    assert(e("0.0625", StyleKind.ElapsedS) === "5400")
    // 1900 system: negative serials stay raw, same as the date kinds
    assert(e("-1.5", hms) === "-1.5")
    // 1904 system allows negative durations: abs rendering with one
    // leading '-', never %02d on negative remainders
    def e4(s: String, k: Int) = XlsxSource.serialToIso(s, k, date1904 = true)
    assert(e4("-0.052083333333333336", hms) === "-1:15:00") // −75 min
    assert(e4("-0.052083333333333336", hm) === "-1:15")
    assert(e4("-0.052083333333333336", ms) === "-75:00")
    assert(e4("-0.052083333333333336", StyleKind.ElapsedS) === "-4500")
  }

  test("customKind classifies format codes like POI's heuristic") {
    import XlsxSource.customKind
    assert(customKind("yyyy-mm-dd") === StyleKind.Date)
    assert(customKind("m/d/yy") === StyleKind.Date)
    assert(customKind("mmm-yy") === StyleKind.Date)
    assert(customKind("yyyy\\-mm\\-dd hh:mm:ss") === StyleKind.DateTime)
    assert(customKind("hh:mm:ss") === StyleKind.Time)
    assert(customKind("mm:ss") === StyleKind.Time)
    assert(customKind("h:mm AM/PM") === StyleKind.Time)
    // elapsed brackets are DURATION formats (round 8): totals, not
    // modulo-24/60 clock parts; the first elapsed bracket picks the
    // unit, and the parts AFTER it pick the rendered tail (round 9)
    assert(customKind("[h]:mm:ss") === StyleKind.elapsed(StyleKind.ElapsedH, 2))
    assert(customKind("[hh]:mm") === StyleKind.elapsed(StyleKind.ElapsedH, 1))
    assert(customKind("[h]") === StyleKind.ElapsedH)
    assert(customKind("[mm]:ss") === StyleKind.elapsed(StyleKind.ElapsedM, 1))
    assert(customKind("[mm]") === StyleKind.ElapsedM)
    assert(customKind("[ss]") === StyleKind.ElapsedS)
    // the second format section (negatives) must not add parts
    assert(customKind("[h];[h]:mm:ss") === StyleKind.ElapsedH)
    // quoted literals after the bracket must not add parts either
    assert(customKind("[h] \"ms\"") === StyleKind.ElapsedH)
    // color/condition brackets still strip without classifying
    assert(customKind("[Red][h]:mm") === StyleKind.elapsed(StyleKind.ElapsedH, 1))
    // non-dates: literals in quotes/brackets/escapes must not classify
    assert(customKind("General") === StyleKind.NotDate)
    assert(customKind("#,##0.00") === StyleKind.NotDate)
    assert(customKind("0.00%") === StyleKind.NotDate)
    assert(customKind("@") === StyleKind.NotDate)
    assert(customKind("[Red]0.00") === StyleKind.NotDate)
    assert(customKind("0.00\" yds\"") === StyleKind.NotDate)
  }

  test("typedDates=false leaves raw serials (the default contract)") {
    val rows = XlsxSource.parseWorkbook(new FileInputStream(dated))
    val r = rows.find(_.cells.head == "E100").get.cells
    assert(r(2) === "42005")             // raw day serial, untouched
  }

  test("typedDates=true decodes date/datetime/time styles; passthrough elsewhere") {
    val rows = XlsxSource.parseWorkbook(new FileInputStream(dated),
      typedDates = true)
    val r = rows.find(_.cells.head == "E100").get.cells
    assert(r(2) === "2015-01-01")
    assert(r(3) === "2015-01-01 00:00:00")
    assert(r(4) === "00:00:00")
    assert(r(5) === "0.5")               // General-styled float stays raw
    // text-typed date cell is not a numeric serial → untouched
    val txt = rows.find(_.cells.head == "E903").get.cells
    assert(txt(2) === "2020-05-05")
    // leap-bug edges as committed in the fixture
    assert(rows.find(_.cells.head == "E900").get.cells(2) === "1900-01-01")
    assert(rows.find(_.cells.head == "E901").get.cells(2) === "1900-02-28")
    assert(rows.find(_.cells.head == "E902").get.cells(2) === "1900-03-01")
  }

  test("date1904 workbooks count from 1904-01-01") {
    val rows = XlsxSource.parseWorkbook(new FileInputStream(dated1904),
      typedDates = true)
    val r = rows.find(_.cells.head == "R1").get.cells
    assert(r(1) === "1904-01-01")        // serial 0
    assert(r(2) === "1904-04-10 12:00:00") // serial 100.5, custom fmt 164
  }

  test("imposeTypes: decoded ISO strings land as real date/timestamp/double") {
    import org.apache.spark.sql.types._
    val df = XlsxSource.readAutoHeader(spark, dated,
      Seq("Event ID", "Name", "Registration Date", "Last Seen",
          "Duration", "Score"),
      typedDates = true)
    val typed = graft.etl.CleanPipeline.imposeTypes(df, StructType(Seq(
      StructField("registration_date", DateType),
      StructField("last_seen", TimestampType),
      StructField("score", DoubleType))))
    assert(typed.schema("registration_date").dataType === DateType)
    assert(typed.schema("last_seen").dataType === TimestampType)
    assert(typed.schema("score").dataType === DoubleType)
    assert(typed.schema("name").dataType === StringType) // untouched
    val r = typed.filter(col("event_id") === "E100")
      .select(col("registration_date").cast("string"),
              col("last_seen").cast("string"), col("score"))
      .head()
    assert(r.getString(0) === "2015-01-01")
    assert(r.getString(1) === "2015-01-01 00:00:00")
    assert(r.getDouble(2) === 0.5)
    // unparseable values coerce to null, never throw (edge rows carry
    // empty last_seen/score cells)
    assert(typed.filter(col("event_id") === "E900")
      .head().isNullAt(typed.columns.indexOf("last_seen")))
  }

  test("distributed read: typed column is date-castable end-to-end") {
    val df = XlsxSource.readAutoHeader(spark, dated,
      Seq("Event ID", "Name", "Registration Date", "Last Seen",
          "Duration", "Score"),
      typedDates = true)
    val years = df
      .select(year(col("registration_date").cast("date")).as("y"))
      .filter(col("y") >= 2015)
      .distinct().count()
    assert(years >= 8)                   // 2015–2023 in the fixture
    // every registration_date decodes to a castable ISO date
    assert(df.filter(col("registration_date").cast("date").isNull).count() === 0)
  }
}
