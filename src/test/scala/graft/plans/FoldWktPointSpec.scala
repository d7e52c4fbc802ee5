package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.WktPoint

class FoldWktPointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def synthesized = {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select($"c_custkey", $"c_nationkey",
        WktPoint.wkt_point(concat(lit("POINT ("),
          $"c_nationkey".cast("string"), lit(" "),
          $"c_custkey".cast("string"), lit(")"))).as("pt"))
  }

  test("synthesize-then-parse folds to a direct struct (no regex parse)") {
    val optimized = synthesized.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("wkt_point"),
      s"wkt_point survived optimization:\n$optimized")
    assert(optimized.contains("named_struct"),
      s"expected folded struct in:\n$optimized")
  }

  test("folded plan produces identical results to the unfolded parse") {
    val got = synthesized
      .select($"c_custkey", $"pt.latitude", $"pt.longitude")
      .orderBy("c_custkey").collect()
    got.foreach { r =>
      assert(r.getDouble(1) == r.getLong(0).toDouble)  // lat == custkey
    }
    // and against the interpreted parser on the same input
    val raw = WktPoint.parse(
      org.apache.spark.unsafe.types.UTF8String.fromString("POINT (3 7)"))
    assert(raw.getDouble(0) == 7.0 && raw.getDouble(1) == 3.0)
  }

  test("rule does NOT fire for double-typed coordinates (scientific notation hazard)") {
    GraftFunctions.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(WktPoint.wkt_point(concat(lit("POINT ("),
        $"c_acctbal".cast("string"), lit(" "),
        $"c_acctbal".cast("string"), lit(")"))).as("pt"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("wkt_point"),
      s"rule unsoundly fired on doubles:\n$optimized")
  }

  test("null coordinate yields a null STRUCT, matching parse semantics") {
    GraftFunctions.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(WktPoint.wkt_point(concat(lit("POINT ("),
        when($"c_custkey" < 5, $"c_nationkey").cast("string"), lit(" "),
        $"c_custkey".cast("string"), lit(")"))).as("pt"),
        $"c_custkey")
    val rows = df.orderBy("c_custkey").limit(10).collect()
    rows.foreach { r =>
      val k = r.getLong(1)
      if (k < 5) assert(!r.isNullAt(0), s"key $k should parse")
      else assert(r.isNullAt(0), s"key $k should be a null struct")
    }
  }
}
