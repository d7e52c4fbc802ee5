package graft.plans

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.AsOfJoin

class AsOfJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  // quotes (right): per-symbol price timeline
  private lazy val quotes = Seq(
    ("A", ts(10), 1.0), ("A", ts(20), 2.0), ("A", ts(30), 3.0),
    ("B", ts(15), 10.0),
    ("C", ts(99), 42.0)
  ).toDF("sym", "t", "px")

  // trades (left): before-first, tie, between, after-last, key-no-quote
  private lazy val trades = Seq(
    ("A", ts(5), 100L),   // before first quote -> null
    ("A", ts(20), 101L),  // tie -> 2.0
    ("A", ts(25), 102L),  // between -> 2.0
    ("A", ts(99), 103L),  // after last -> 3.0
    ("B", ts(14), 104L),  // before only quote -> null
    ("B", ts(16), 105L),  // -> 10.0
    ("D", ts(50), 106L)   // key with no quotes -> null
  ).toDF("sym", "t", "qty")

  test("custom exec: hand-computed backward matches") {
    val out = AsOfJoinExecOp.backward(trades, quotes, Seq("sym"), "t")
      .orderBy("sym", "t").collect()
    val px = out.map(r => (r.getString(0), r.getLong(2),
      if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(px.toSeq == Seq(
      ("A", 100L, null), ("A", 101L, 2.0), ("A", 102L, 2.0), ("A", 103L, 3.0),
      ("B", 104L, null), ("B", 105L, 10.0), ("D", 106L, null)))
  }

  test("custom exec result ≡ window-composed AsOfJoin on the same input") {
    val a = AsOfJoinExecOp.backward(trades, quotes, Seq("sym"), "t")
      .orderBy("sym", "t", "qty").collect()
    val b = AsOfJoin.backward(trades, quotes, Seq("sym"), "t")
      .orderBy("sym", "t", "qty").collect()
    assert(a.sameElements(b))
  }

  test("larger randomized-ish parity (deterministic synthetic)") {
    val right = (0 until 500).map { i =>
      (s"k${i % 7}", ts(i * 3 % 997), i.toDouble)
    }.toDF("k", "t", "v")
    val left = (0 until 800).map { i =>
      (s"k${i % 9}", ts(i * 7 % 997), i.toLong)
    }.toDF("k", "t", "id")
    val a = AsOfJoinExecOp.backward(left, right, Seq("k"), "t")
      .orderBy("k", "t", "id").collect()
    val b = AsOfJoin.backward(left, right, Seq("k"), "t")
      .orderBy("k", "t", "id").collect()
    assert(a.length == 800 && a.sameElements(b))
  }

  test("plan uses AsOfJoinExec (custom physical operator)") {
    val plan = AsOfJoinExecOp.backward(trades, quotes, Seq("sym"), "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
  }

  test("self-join (both sides from one scan) does not corrupt pruning") {
    // shared exprIds across children broke column pruning before the
    // right-side re-alias; this pins the fix
    val ev = Seq(("A", ts(10), "click", 1.0), ("A", ts(20), "buy", 2.0),
                 ("B", ts(5), "click", 3.0), ("B", ts(9), "buy", 4.0))
      .toDF("u", "t", "kind", "v")
    val buys = ev.filter($"kind" === "buy").select($"u", $"t", $"v")
    val clicks = ev.filter($"kind" === "click")
      .select($"u", $"t", $"v".as("cv"))
    val out = AsOfJoinExecOp.backward(buys, clicks, Seq("u"), "t")
      .orderBy("u").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 3.0))
  }

  test("null right time skipped; null left time matches nothing") {
    val r = Seq(("A", Option.empty[Timestamp], 7.0),
                ("A", Some(ts(10)), 1.0)).toDF("sym", "t", "px")
    val l = Seq(("A", Some(ts(20)), 1L),
                ("A", Option.empty[Timestamp], 2L)).toDF("sym", "t", "qty")
    val out = AsOfJoinExecOp.backward(l, r, Seq("sym"), "t")
      .orderBy(asc_nulls_first("t")).collect()
    assert(out(0).isNullAt(3))          // null left time -> no match
    assert(out(1).getDouble(3) == 1.0)  // matches the non-null quote
  }
}
