package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench emitter's JSON must be byte-identical regardless of the
  * host JVM's default locale — a comma-decimal default (de_DE) once made
  * the f-interpolated numbers unparsable (`"q1":1,234`).
  */
class BenchFormatSpec extends AnyFunSuite {

  test("num renders ROOT-locale decimals independent of comma-decimal locales") {
    // No Locale.setDefault here: sbt runs suites concurrently in one JVM, so
    // mutating the global default could make OTHER suites transiently observe
    // comma-decimal formatting. Instead prove the two halves separately:
    // (a) %f really is locale-sensitive (GERMANY produces the comma form the
    //     old f-interpolator path would have emitted), and
    // (b) Bench.num pins ROOT explicitly, so its output is the dot form —
    //     String.format(ROOT, ...) is what num calls, byte-for-byte, and is
    //     unaffected by whatever the ambient default locale happens to be.
    val german = String.format(java.util.Locale.GERMANY, "%.3f", Double.box(1.2345))
    assert(german == "1,234" || german == "1,235",
      "precondition: the comma-decimal formatter really is comma-decimal")
    assert(Bench.num(1.2345, 3) == "1.234" || Bench.num(1.2345, 3) == "1.235")
    assert(!Bench.num(1234.5, 2).contains(","), "no grouping or comma decimals")
    assert(Bench.num(0.5, 2) == "0.50")
  }

  test("compact tail digest is keyed total_compact, distinct from the full line") {
    // Two stdout lines both keyed metric:"total" double-count for a summing
    // consumer; the tail digest must carry its own metric name.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/Bench.scala")), "UTF-8")
    assert(src.contains("\"metric\":\"total_compact\""),
      "the compact tail line must be keyed total_compact")
    assert(src.sliding("{\"metric\":\"total\",".length).count(
      _ == "{\"metric\":\"total\",") == 2,
      "exactly the full-vector stdout line and the detail file carry metric:total")
  }

  test("median: odd takes the middle, even averages the middle two") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Seq(7.0)) == 7.0)
  }
}
