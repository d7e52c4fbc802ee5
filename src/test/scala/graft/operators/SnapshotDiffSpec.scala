package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("classifies added/removed/changed incl. null-safe value edits") {
    val before = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("same"))).toDF("k", "v")
    val after = Seq(
      (2L, Some("B")),        // changed value
      (3L, Some("now")),      // null -> value: changed
      (4L, Some("same")),     // unchanged: dropped
      (5L, Some("new"))       // added
    ).toDF("k", "v")          // 1 removed
    val got = SnapshotDiff.diff(before, after, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "removed", 2L -> "changed", 3L -> "changed", 5L -> "added"))
  }
}
