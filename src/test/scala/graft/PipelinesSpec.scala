package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipelines}

/** Pipeline-composition contracts not covered by the oracle gates:
  * the precomputed-cluster overloads must return exactly what the
  * self-contained forms do (a real pipeline runs connected components
  * once and fans the table out to split + keeper + dedup).
  */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  // two near-dup pairs (docs 0/1 and 2/3 share most shingles) plus a
  // loner; enough structure for minhash clusters to be non-trivial
  private def docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (2L, "one two three four five six seven eight nine ten."),
    (3L, "one two three four five six seven eight nine ten!"),
    (4L, "entirely unrelated text with different words in this row"))
    .toDF("doc_id", "text")

  test("leakageSafeSplit via a precomputed cluster table is identical") {
    val clusters = Dedup.minhashClusters(docs)
    val self = Pipelines.leakageSafeSplit(docs).collect().toSet
    val pre = Pipelines.leakageSafeSplit(docs, clusters).collect().toSet
    assert(self.nonEmpty && self == pre)
  }

  test("clusterQualityKeeper via a precomputed cluster table is identical") {
    val clusters = Dedup.minhashClusters(docs, 0.5)
    val self = Pipelines.clusterQualityKeeper(docs).collect().toSet
    val pre = Pipelines.clusterQualityKeeper(docs, clusters).collect().toSet
    assert(self.nonEmpty && self == pre)
  }

  test("partitioned packs never collide across streams and cut at maxTokens") {
    val got = Pipelines.sequencePackPartitioned(docs, maxTokens = 8L).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val part = r.getAs[Int]("part")
      val packFirst = r.getAs[Long]("pack_first")
      val offset = r.getAs[Long]("pack_offset")
      // pack ids live in their stream's namespace, offsets inside a pack
      assert(packFirst >> 40 == part.toLong)
      assert(offset >= 0 && offset < 8)
      assert(r.getAs[Long]("pack_last") >= packFirst)
    }
    // within a stream the layout is gapless: starts are the cumsum of
    // the stream's token counts in md5 order
    got.groupBy(_.getAs[Int]("part")).foreach { case (_, rows) =>
      val starts = rows.map(_.getAs[Long]("start_tok")).sorted
      val total = rows.map(_.getAs[Long]("n_tokens")).sum
      assert(starts.head == 0L)
      assert(starts.zip(rows.sortBy(_.getAs[Long]("start_tok"))
        .map(r => r.getAs[Long]("start_tok") + r.getAs[Long]("n_tokens")))
        .forall { case (_, e) => e <= total })
    }
  }
}
