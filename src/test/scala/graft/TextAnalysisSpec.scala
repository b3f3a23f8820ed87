package graft

import graft.operators.TextAnalysis

/** Repetition signals (the other TextAnalysis operators are pinned by
  * their oracle gates t01-t04; repetition's bigram math is worth a
  * hand-computed fixture too).
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals count bigram mass exactly") {
    val docs = Seq(
      // bigrams: "a b","b a","a b","b a","a b" -> 5 total, top=3,
      // dup mass = 5 (both bigrams repeat)
      (1L, "a b a b a b"),
      // bigrams all distinct -> top=1, dup=0
      (2L, "v w x y z"),
      // single token -> no bigrams -> absent from output
      (3L, "solo"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionSignals(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      (1L, 5L, 3L, 5L, 600000L, 1000000L),
      (2L, 4L, 1L, 0L, 250000L, 0L)))
  }
}
