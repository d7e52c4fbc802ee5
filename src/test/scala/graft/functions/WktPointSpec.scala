package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.plans.GraftFunctions

class WktPointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parse(values: String*) = {
    GraftFunctions.register(spark)
    values.toDF("loc")
      .select(WktPoint.wkt_point($"loc").as("pt"))
      .select($"pt.latitude", $"pt.longitude")
      .collect()
  }

  test("parses WKT points incl. spacing variants and negatives") {
    val rows = parse(
      "POINT (-122.33 47.61)",
      "POINT(-122.33 47.61)",
      "POINT  ( -122.33   47.61 )",
      "POINT (0.5 -90.25)")
    assert(rows(0).getDouble(0) == 47.61 && rows(0).getDouble(1) == -122.33)
    assert(rows(1).getDouble(0) == 47.61)
    assert(rows(2).getDouble(1) == -122.33)
    assert(rows(3).getDouble(0) == -90.25 && rows(3).getDouble(1) == 0.5)
  }

  test("no-match and malformed inputs yield null struct") {
    val rows = parse("not a point", "", "POINT ()", "POINT (a b)")
    rows.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }

  test("registered in SQL via extensions/registry") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT wkt_point('POINT (1.5 2.5)').latitude AS lat").as[Double].head()
    assert(got == 2.5)
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    // a parquet-backed frame, so ConvertToLocalRelation can't pre-fold
    // the projection away and a real codegen stage is planned
    GraftFunctions.register(spark)
    val df = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .selectExpr("c_custkey",
        "concat('POINT (', c_nationkey, ' ', c_custkey, ')') AS loc")
      .select($"c_custkey", WktPoint.wkt_point($"loc").as("pt"))
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty,
      s"expected a codegen stage in:\n${df.queryExecution.executedPlan}")
    // and results are correct through the generated-code path
    val rows = df.select($"c_custkey", $"pt.latitude").orderBy("c_custkey")
      .limit(5).collect()
    rows.foreach(r => assert(r.getDouble(1) == r.getLong(0).toDouble))
  }

  test("null input propagates null") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT wkt_point(CAST(NULL AS STRING)) IS NULL")
      .as[Boolean].head()
    assert(got)
  }
}
