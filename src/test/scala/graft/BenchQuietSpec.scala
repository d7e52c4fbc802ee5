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

  test("self-healing: only an all-contaminated query under budget heals") {
    // zero quiet reps, budget left → heal
    assert(Bench.needsHealing(Seq((7.0, 4000L), (9.0, 900L)),
      quietThreshold = 300L, maxReps = 6))
    // one quiet rep → no healing regardless of budget
    assert(!Bench.needsHealing(Seq((7.0, 4000L), (9.0, 10L)),
      quietThreshold = 300L, maxReps = 6))
    // budget exhausted → no more healing even with zero quiet reps
    assert(!Bench.needsHealing(
      Seq.fill(6)((7.0, 4000L)), quietThreshold = 300L, maxReps = 6))
    // empty history never heals (nothing was measured at all)
    assert(!Bench.needsHealing(Nil, quietThreshold = 300L, maxReps = 6))
  }

  test("healing convergence: one quiet rep ends the loop mid-budget") {
    // the driver-shaped loop: start with 3 contaminated reps, healing
    // passes append one rep at a time; a quiet 4th rep must stop the
    // loop (needsHealing flips false) and register quiet
    var reps = List((7.0, 4000L), (8.0, 900L), (7.5, 600L))
    assert(Bench.needsHealing(reps, 300L, 6))
    reps = reps :+ ((6.8, 12L)) // a steal-quiet healing rep arrives
    assert(!Bench.needsHealing(reps, 300L, 6))
    val (sec, quiet) = Bench.registered(reps, 300L)
    assert(sec == 6.8 && quiet)
    assert(!Bench.repsExhausted(reps, 300L, 6))
  }

  test("reps_exhausted: at budget with zero quiet reps, marked loudly") {
    val reps = Seq.fill(6)((7.0, 4000L))
    assert(Bench.repsExhausted(reps, quietThreshold = 300L, maxReps = 6))
    val (sec, quiet) = Bench.registered(reps, 300L)
    assert(sec == 7.0 && !quiet)
    // under budget or with any quiet rep the marker must NOT appear
    assert(!Bench.repsExhausted(Seq.fill(5)((7.0, 4000L)), 300L, 6))
    assert(!Bench.repsExhausted(
      Seq.fill(5)((7.0, 4000L)) :+ ((7.0, 1L)), 300L, 6))
  }

  test("control normalization: slower host deflates, faster inflates") {
    // run control 2× the reference ⇒ host is 2× slower on fixed work ⇒
    // the measured total halves when restated on the reference host
    assert(math.abs(Bench.normalizedTotal(80.0, controlRun = 0.78,
      controlRef = 0.39) - 40.0) < 1e-9)
    assert(math.abs(Bench.normalizedTotal(40.0, controlRun = 0.195,
      controlRef = 0.39) - 80.0) < 1e-9)
    // degenerate control (the /proc-less fallback) leaves totals raw
    assert(Bench.normalizedTotal(80.0, controlRun = 0.0) == 80.0)
    assert(Bench.normalizedTotal(80.0, controlRun = -1.0) == 80.0)
  }
}
