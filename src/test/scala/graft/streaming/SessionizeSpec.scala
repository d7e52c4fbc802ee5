package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val ev = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1.0),
    (1L, ts("2024-01-01 10:10:00"), 2.0),   // same session (10 min gap)
    (1L, ts("2024-01-01 11:00:00"), 3.0),   // new session (50 min gap)
    (2L, ts("2024-01-01 09:00:00"), 4.0)
  ).toDF("user_id", "ts", "value")

  test("session_window groups by inactivity gap") {
    val got = Sessionize.sessions(ev, "30 minutes")
      .orderBy("user_id", "session_start")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "2024-01-01 10:00:00", 2L, 3.0),
      (1L, "2024-01-01 11:00:00", 1L, 3.0),
      (2L, "2024-01-01 09:00:00", 1L, 4.0)))
  }

  test("userActivity: typed per-group scan computes max gap") {
    val got = Sessionize.userActivity(spark, ev).collect()
      .map(a => a.user_id -> a).toMap
    assert(got(1L).n_events == 3)
    assert(got(1L).max_gap_seconds == 50 * 60)
    assert(got(1L).first_ts == "2024-01-01 10:00:00")
    assert(got(1L).last_ts == "2024-01-01 11:00:00")
    assert(got(2L).max_gap_seconds == 0)
  }

  test("sessions works identically on a stream (availableNow)") {
    val sf = "/root/testdata/sf0.001"
    val streamed = Sessionize.sessions(
      EventsStream.readEvents(spark, sf).withWatermark("ts", "2 hours"))
    val got = EventsStream.runToCompletion(spark, streamed)
      .orderBy("user_id", "session_start").collect()
    val batch = Sessionize.sessions(graft.Tables.events(spark, sf))
      .orderBy("user_id", "session_start").collect()
    assert(got.length == batch.length && got.length > 0)
    got.zip(batch).foreach { case (g, b) => assert(g == b) }
  }
}
