package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudication rule: registered number = min over
  * steal-quiet reps when any exist; else min over all, flagged
  * not-quiet so the artifact says out loud that its number needs a
  * noise adjudication.
  */
class BenchQuietSpec extends AnyFunSuite {

  test("min over quiet reps only — contaminated fast rep is ignored") {
    // the 3.0s rep with 5k steal ticks is noise-window data, not cost
    val (sec, quiet) = Bench.registered(
      Seq((3.0, 5000L), (5.0, 10L), (6.0, 20L)), quietThreshold = 300L)
    assert(sec == 5.0 && quiet)
  }

  test("no quiet rep: min over all, flagged not quiet") {
    val (sec, quiet) = Bench.registered(
      Seq((7.0, 4000L), (9.0, 900L)), quietThreshold = 300L)
    assert(sec == 7.0 && !quiet)
  }

  test("threshold boundary: steal == threshold is NOT quiet") {
    val (sec, quiet) = Bench.registered(
      Seq((2.0, 300L), (4.0, 299L)), quietThreshold = 300L)
    assert(sec == 4.0 && quiet)
  }
}
