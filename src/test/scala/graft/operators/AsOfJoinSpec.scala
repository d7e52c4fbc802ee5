package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward: most recent at-or-before per key, null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")
    ).toDF("user_id", "ts", "label")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 20.0),  // equal ts -> matches p2
      (1L, ts("2024-01-01 13:00:00"), 30.0),  // after everything
      (2L, ts("2024-01-01 23:00:00"), 40.0)   // after p3 -> p3 unmatched
    ).toDF("user_id", "ts", "price")

    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts")
      .orderBy("user_id", "ts")
      .select("label", "price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toSeq
    assert(got == Seq(
      "p1" -> Some(10.0),    // 09:30 is latest <= 10:00
      "p2" -> Some(20.0),    // equal timestamp matches
      "p3" -> None))         // nothing at-or-before
  }

  test("multi-column payload comes from the SAME matched row") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("user_id", "ts", "label")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1.0, "early"),
      (1L, ts("2024-01-01 09:00:00"), 2.0, "late")
    ).toDF("user_id", "ts", "price", "tag")
    val row = AsOfJoin.backward(left, right, Seq("user_id"), "ts").collect()(0)
    val byName = row.getValuesMap[Any](Seq("price", "tag"))
    assert(byName("price") == 2.0 && byName("tag") == "late")
  }

  test("column collision rejected") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("user_id", "ts", "v")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), "y")).toDF("user_id", "ts", "v")
    assertThrows[IllegalArgumentException](
      AsOfJoin.backward(l, r, Seq("user_id"), "ts"))
  }
}
