package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the property VERDICT r3 flagged: the bench timing action must
  * consume every output column, so Catalyst cannot prune away the very
  * work being measured.
  */
class BenchActionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("count() prunes a projection column; consumeAll evaluates it") {
    import spark.implicits._
    // raise_error only fires if the column is actually evaluated.
    val df = spark.range(8).toDF("id")
      .select(col("id"), raise_error(lit("projection evaluated")).as("boom"))
    // Under .count() the projection is pruned — no error, which is exactly
    // why count() was the wrong bench action.
    assert(df.count() === 8L)
    val e = intercept[Exception] { BenchAction.consumeAll(df) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("projection evaluated")))
  }

  test("consumeAll returns the row count and handles map columns") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .select(col("k"), map(col("v"), col("k")).as("m"), array(col("k")).as("arr"))
    assert(BenchAction.consumeAll(df) === 3L)
  }

  test("consumeAll on an empty result returns 0") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x").filter(col("x") > 10)
    assert(BenchAction.consumeAll(df) === 0L)
  }
}
