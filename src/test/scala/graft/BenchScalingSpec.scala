package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-sf scaling guard must trip on a seeded quadratic growth
  * profile (t ~ n^2: time ratio = dataRatio^2) and stay quiet for
  * linear, constant-overhead, and below-timing-floor profiles — the
  * contract behind the `scaling` block Bench emits into the bench
  * artifact.
  */
class BenchScalingSpec extends AnyFunSuite {

  test("seeded quadratic query trips the super-linear flag") {
    val small = Map("q_quad" -> 0.5, "q_linear" -> 0.5, "q_const" -> 0.5)
    val big = Map("q_quad" -> 50.0, "q_linear" -> 5.0, "q_const" -> 0.6)
    val flagged = Bench.superLinear(small, big, dataRatio = 10.0)
    assert(flagged.keySet === Set("q_quad"))
    assert(math.abs(flagged("q_quad") - 100.0) <= 1e-9)
  }

  test("slack absorbs the documented ~2x box variance on linear queries") {
    // a linear query on a 2x slower box at the big sf: ratio 20 vs
    // dataRatio 10 — within slack 1.5? No: 20 > 15, by design this DOES
    // flag (it is indistinguishable from n log n growth); slack 2.1
    // would not. The default is deliberately the tighter bound.
    val flagged = Bench.superLinear(
      Map("q" -> 0.5), Map("q" -> 10.0), dataRatio = 10.0)
    assert(flagged.contains("q"))
    val lenient = Bench.superLinear(
      Map("q" -> 0.5), Map("q" -> 10.0), dataRatio = 10.0, slack = 2.1)
    assert(lenient.isEmpty)
  }

  test("below-floor small timings are noise, never flagged") {
    val flagged = Bench.superLinear(
      Map("q" -> 0.01), Map("q" -> 1.0), dataRatio = 10.0)
    assert(flagged.isEmpty)
  }
}
