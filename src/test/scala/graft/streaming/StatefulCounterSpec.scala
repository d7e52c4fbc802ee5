package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import StatefulCounter._

/** flatMapGroupsWithState with REAL cross-batch state: a MemoryStream
  * fed in two micro-batches; totals must accumulate across them.
  */
class StatefulCounterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("per-user totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[UserEventIn]
    val out = StatefulCounter.runningTotals(spark, in.toDS())
    val q = out.writeStream
      .format("memory").queryName("stateful_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      in.addData(UserEventIn(1, 10.0), UserEventIn(1, 5.0), UserEventIn(2, 1.0))
      q.processAllAvailable()
      in.addData(UserEventIn(1, 2.5), UserEventIn(3, 7.0))
      q.processAllAvailable()
      val rows = spark.table("stateful_out")
        .as[UserTotals].collect().toSeq
      // update mode appends each batch's emissions; the LAST row per
      // user is the running total
      val last = rows.zipWithIndex.groupBy(_._1.user_id)
        .map { case (u, rs) => u -> rs.maxBy(_._2)._1 }
      assert(last(1L) == UserTotals(1, 3, 17.5))   // state crossed batches
      assert(last(2L) == UserTotals(2, 1, 1.0))
      assert(last(3L) == UserTotals(3, 1, 7.0))
    } finally q.stop()
  }
}
