package graft

import graft.operators.Dedup

/** Stop-shingle capping on the d02 inverted index (boilerplate text —
  * license headers, shared templates — otherwise creates df²-sized join
  * buckets at corpus scale).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // "common boiler plate" is a shingle shared by docs 1-3 (df = 3); the
  // docs share nothing else.
  private def docs = Seq(
    (1L, "common boiler plate alpha beta gamma"),
    (2L, "common boiler plate delta epsilon zeta"),
    (3L, "common boiler plate eta theta iota"),
    (4L, "entirely different words appear here now"))
    .toDF("doc_id", "text")

  test("stop-shingle cap drops boilerplate buckets from the index") {
    assert(Dedup.hotShingles(docs, 3, 2L).select("s").as[String]
      .collect().toSeq == Seq("common boiler plate"))
    // uncapped: the shared boilerplate shingle yields all 3 pairs
    assert(Dedup.ngramJaccardPairs(docs, 0.1).count() == 3)
    // capped at df<=2: the hot bucket is dropped, no candidates remain
    assert(Dedup.ngramJaccardPairs(docs, 0.1, maxShingleDf = 2L).count() == 0)
    // a cap above the true max df is a semantic no-op
    assert(Dedup.ngramJaccardPairs(docs, 0.1, maxShingleDf = 3L).count() == 3)
  }
}
