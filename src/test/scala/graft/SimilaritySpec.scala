package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** IVF edge cases the gate's fixed-size corpus can't reach: a corpus
  * smaller than the requested centroid count, and nProbe above the
  * number of cells that exist.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def tinyCorpus = Seq(
    (0L, "q", Array(1.0f, 0.0f, 0.0f)),
    (1L, "a", Array(0.9f, 0.1f, 0.0f)),
    (2L, "b", Array(0.0f, 1.0f, 0.0f)))
    .toDF("vec_id", "label", "embedding")

  test("ivfTopK clamps centroids and probes to the corpus size") {
    // 3 vectors but 8 centroids / 5 probes requested: must not throw,
    // and with every cell probed the result is the exact top-k
    val got = Similarity.ivfTopK(tinyCorpus, queryMaxId = 1L, k = 2,
      nCentroids = 8, nProbe = 5)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L))
    val brute = Similarity.bruteForceTopK(tinyCorpus, queryMaxId = 1L, k = 2)
      .orderBy("rank").collect()
    assert(got.map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq
      == brute.map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq)
  }

  test("ivfTopK rejects an empty corpus loudly") {
    val empty = tinyCorpus.filter(col("vec_id") < 0)
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(empty, queryMaxId = 1L, k = 2)
    }
  }
}
