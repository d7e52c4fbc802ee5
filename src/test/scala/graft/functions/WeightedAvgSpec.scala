package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class WeightedAvgSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val df = Seq(
    ("a", 10.0, 1.0), ("a", 20.0, 3.0),
    ("b", 5.0, 2.0)).toDF("g", "x", "w")

  test("weighted mean matches hand computation, via Column API") {
    val wavg = udaf(WeightedAvg)
    val got = df.groupBy("g").agg(wavg($"x", $"w").as("wa"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - (10.0 * 1 + 20.0 * 3) / 4.0) < 1e-12)
    assert(got("b") == 5.0)
  }

  test("SQL registration path agrees with the Column path") {
    spark.udf.register("weighted_avg", udaf(WeightedAvg))
    df.createOrReplaceTempView("wa_in")
    val got = spark.sql(
      "SELECT g, weighted_avg(x, w) AS wa FROM wa_in GROUP BY g")
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 17.5) < 1e-12 && got("b") == 5.0)
  }

  test("zero-weight group finishes as NaN") {
    val z = Seq(("z", 1.0, 0.0)).toDF("g", "x", "w")
    val wavg = udaf(WeightedAvg)
    val v = z.groupBy("g").agg(wavg($"x", $"w")).collect()(0).getDouble(1)
    assert(v.isNaN)
  }
}
