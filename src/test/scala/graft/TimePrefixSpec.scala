package graft

import java.time.OffsetDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.store.TimePrefix

/** The reference's 9 rstest prefix-generation cases, verbatim
  * (duo/src/utils.rs:200-265).
  */
class TimePrefixSpec extends AnyFunSuite {

  private def us(s: String): Long =
    OffsetDateTime.parse(s).toInstant.toEpochMilli * 1000L

  private def gen(start: String, end: String): Seq[String] =
    TimePrefix.generatePrefixes(us(start), us(end), granularity = 1)

  private val cases: Seq[(String, String, Seq[String])] = Seq(
    ("2022-06-11T16:30:00+00:00", "2022-06-11T16:30:59+00:00",
      Seq("date=2022-06-11/hour=16/minute=30/")),
    ("2022-06-11T16:57:00+00:00", "2022-06-11T16:59:00+00:00",
      Seq("date=2022-06-11/hour=16/minute=57/",
        "date=2022-06-11/hour=16/minute=58/")),
    ("2022-06-11T16:00:00+00:00", "2022-06-11T16:59:59+00:00",
      Seq("date=2022-06-11/hour=16/")),
    ("2022-06-11T15:00:00+00:00", "2022-06-11T17:00:00+00:00",
      Seq("date=2022-06-11/hour=15/", "date=2022-06-11/hour=16/")),
    ("2022-06-11T15:59:00+00:00", "2022-06-11T16:01:00+00:00",
      Seq("date=2022-06-11/hour=15/minute=59/",
        "date=2022-06-11/hour=16/minute=00/")),
    ("2022-06-11T15:59:00+00:00", "2022-06-11T17:01:00+00:00",
      Seq("date=2022-06-11/hour=15/minute=59/",
        "date=2022-06-11/hour=16/",
        "date=2022-06-11/hour=17/minute=00/")),
    ("2022-06-11T00:00:00+00:00", "2022-06-13T00:00:00+00:00",
      Seq("date=2022-06-11/", "date=2022-06-12/")),
    ("2022-06-11T23:00:01+00:00", "2022-06-12T01:59:59+00:00",
      Seq("date=2022-06-11/hour=23/",
        "date=2022-06-12/hour=00/", "date=2022-06-12/hour=01/")),
    ("2022-06-11T23:59:59+00:00", "2022-06-12T00:01:00+00:00",
      Seq("date=2022-06-11/hour=23/minute=59/",
        "date=2022-06-12/hour=00/minute=00/")))

  test("prefix generation matches the reference's 9 cases") {
    cases.foreach { case (s, e, want) =>
      assert(gen(s, e) == want, s"range $s .. $e")
    }
  }

  test("coarser granularity emits slot ranges") {
    val got = TimePrefix.generatePrefixes(
      us("2022-06-11T16:15:00+00:00"), us("2022-06-11T16:25:00+00:00"),
      granularity = 10)
    assert(got == Seq(
      "date=2022-06-11/hour=16/minute=10-19/",
      "date=2022-06-11/hour=16/minute=20-29/"))
  }
}
