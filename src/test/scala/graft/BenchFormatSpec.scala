package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench emitter's JSON must be byte-identical regardless of the
  * host JVM's default locale — a comma-decimal default (de_DE) once made
  * the f-interpolated numbers unparsable (`"q1":1,234`).
  */
class BenchFormatSpec extends AnyFunSuite {

  test("num renders ROOT-locale decimals under a comma-decimal default locale") {
    val prior = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.num(1.2345, 3) == "1.234" || Bench.num(1.2345, 3) == "1.235")
      assert(!Bench.num(1234.5, 2).contains(","), "no grouping or comma decimals")
      assert(Bench.num(0.5, 2) == "0.50")
      // the old f-interpolator path would have produced "1,234" here
      assert(f"${1.2345}%.3f" == "1,234" || f"${1.2345}%.3f" == "1,235",
        "precondition: the default-locale formatter really is comma-decimal")
    } finally java.util.Locale.setDefault(prior)
  }

  test("median: odd takes the middle, even averages the middle two") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Seq(7.0)) == 7.0)
  }
}
