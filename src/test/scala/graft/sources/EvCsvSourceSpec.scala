package graft.sources

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.model.EvSchema

/** S1/S2 parity: headerless ragged CSV with imposed schema, quoted WKT
  * fields, multi-file glob scan (FIXTURES equivalent of the reference's
  * musemotion_databse.csv shape, SURVEY.md §1.3).
  */
class EvCsvSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeFixture(name: String, rows: Seq[String]): String = {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_csv_fixture")
    Files.createDirectories(dir)
    val f = dir.resolve(name)
    Files.writeString(f, rows.mkString("\n"))
    f.toString
  }

  private val goodRows = Seq(
    // 11 clean columns, quoted WKT with comma-free interior
    """VIN1,Seattle,2020,TESLA,Model 3,BEV,Eligible,266,123,"POINT (-122.33 47.61)",PSE""",
    // ragged: 15 columns (junk tail) like 1,496 rows of the real file
    """VIN2,Tacoma,2019,KIA,EV6,BEV,Eligible,310,124,"POINT (-122.44 47.25)",PSE,junk1,junk2,junk3,junk4""",
    // critical null (blank vin) -> dropped by clean
    """,Olympia,2018,BMW,i3,BEV,Eligible,150,125,"POINT (-122.9 47.0)",PSE""",
    // unparseable year + bad WKT -> nulls, row survives
    """VIN4,Spokane,unknown,FORD,F150,BEV,Eligible,bad,126,not_a_point,AVISTA""")

  test("S1: headerless ragged CSV, schema imposed, tail ignored") {
    val p = writeFixture("part1.csv", goodRows)
    val raw = EvCsvSource.readRaw(spark, p)
    assert(raw.columns.toSeq == EvSchema.sourceColumns)
    assert(raw.count() == 4)
    val v2 = raw.filter("vin = 'VIN2'").collect()(0)
    assert(v2.getString(1) == "Tacoma")   // columns aligned despite tail
    assert(v2.getString(9) == "POINT (-122.44 47.25)")
  }

  test("S1+clean: full ingest pipeline semantics") {
    val p = writeFixture("part1.csv", goodRows)
    val clean = EvCsvSource.readClean(spark, p).orderBy("vin").collect()
    assert(clean.map(_.getString(0)).toSeq == Seq("VIN1", "VIN2", "VIN4"))
    val v1 = clean(0)
    assert(v1.getInt(2) == 2020 && v1.getDouble(10) == 47.61)
    val v4 = clean(2)
    assert(v4.isNullAt(2) && v4.isNullAt(7))    // coerced nulls
    assert(v4.isNullAt(10) && v4.isNullAt(11))  // no WKT match
  }

  test("corrupt-record capture routes unparseable rows to quarantine") {
    // NOTE: lives outside graft_csv_fixture/ so the glob test's row
    // count stays isolated
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_csv_corrupt")
    Files.createDirectories(dir)
    val p = dir.resolve("corrupt.csv").toString
    Files.writeString(Paths.get(p), Seq(
      goodRows.head,
      "\"unterminated quote,oops,2020"    // malformed line
    ).mkString("\n"))
    val df = EvCsvSource.readRawCapturing(spark, p).cache()
    val bad = df.filter("_corrupt_record IS NOT NULL")
    val good = df.filter("_corrupt_record IS NULL")
    assert(bad.count() == 1)
    assert(bad.collect()(0).getAs[String]("_corrupt_record")
      .contains("unterminated"))
    assert(good.count() == 1)
    df.unpersist()
  }

  test("S2: multi-file glob is one scan, bag-union semantics") {
    writeFixture("part1.csv", goodRows)
    writeFixture("part2.csv", Seq(
      """VIN9,Bellevue,2021,RIVIAN,R1T,BEV,Eligible,314,127,"POINT (-122.2 47.6)",PSE"""))
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_csv_fixture")
    val all = EvCsvSource.readRaw(spark, s"$dir/*.csv")
    assert(all.count() == 5)
    // one relation, not a union of per-file plans
    val scans = all.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.length == 1)
  }
}
