package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Timing

/** Reference unit vectors: timing format (duo/src/models.rs:201-213) and
  * duration parse (duo/src/web/deser.rs:241-252), per FIXTURES.md §F.
  */
class TimingSpec extends AnyFunSuite {

  test("format_timing_value matches the reference vectors") {
    val cases = Seq(
      3L -> "3us",
      303L -> "303us",
      3003L -> "3.00ms",
      30003L -> "30.00ms",
      300030L -> "300.03ms",
      3000300L -> "3.00s",
      3003300L -> "3.00s",
      30033300L -> "30.03s",
      33300330L -> "33.30s",
      999L -> "999us",
      1000L -> "1.00ms",
      999999L -> "1000.00ms",
      1000000L -> "1.00s")
    cases.foreach { case (us, want) =>
      assert(Timing.formatTimingValue(us) == want, s"for $us")
    }
  }

  test("format uses half-even rounding like printf (1125us -> 1.12ms)") {
    // 1.125 is exactly representable in binary; printf/fmt/Rust all round
    // half-to-even here. Java String.format would give 1.13 — we must not.
    assert(Timing.formatTimingValue(1125L) == "1.12ms")
    assert(Timing.formatTimingValue(1375L) == "1.38ms")
  }

  test("parse_duration suffixes and errors") {
    assert(Timing.parseDuration("300us").contains(300L))
    assert(Timing.parseDuration("300ms").contains(300000L))
    assert(Timing.parseDuration("3s").contains(3000000L))
    assert(Timing.parseDuration("300MS").contains(300000L)) // lowercased
    assert(Timing.parseDuration("300").isEmpty)
    assert(Timing.parseDuration("abcms").isEmpty)
    assert(Timing.parseDuration("3m").isEmpty)
  }
}
