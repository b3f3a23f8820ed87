package graft

import graft.ingest.{SpanMerger, SpanRecord}

/** Upsert semantics from duo/src/aggregator.rs:17-30 (SURVEY J4/ST2). */
class SpanMergerSpec extends SparkSpec {

  private def rec(seq: Long, id: Long, parent: Option[Long] = None,
      end: Option[Long] = None, tags: Map[String, String] = Map.empty) =
    SpanRecord(seq, id, parent, trace_id = 9001L, name = "op",
      process_id = "svc-0", start = 1000L, end = end, tags = tags)

  test("close record completes an open span") {
    val merged = SpanMerger.mergeAll(Seq(
      rec(1, 101, tags = Map("k" -> "v")),
      rec(2, 101, parent = Some(100L), end = Some(2000L), tags = Map("k2" -> "v2"))))
    assert(merged.parent_id.contains(100L))
    assert(merged.end.contains(2000L))
    assert(merged.tags == Map("k" -> "v", "k2" -> "v2"))
    assert(merged.start == 1000L) // first record pins identity fields
  }

  test("later tag values win; missing parent does not erase") {
    val merged = SpanMerger.mergeAll(Seq(
      rec(1, 5, parent = Some(4L), tags = Map("a" -> "1")),
      rec(2, 5, tags = Map("a" -> "2"))))
    assert(merged.parent_id.contains(4L))
    assert(merged.tags == Map("a" -> "2"))
    // end mirrors the LAST record, even when unset (reference overwrites
    // unconditionally, aggregator.rs:26)
    assert(merged.end.isEmpty)
  }

  test("batch merge splits intact from ongoing") {
    import spark.implicits._
    val records = Seq(
      rec(1, 1), rec(2, 1, end = Some(1500L)), // closes
      rec(3, 2)) // stays open
      .toDS()
    val (intact, ongoing) = SpanMerger.mergeBatch(spark, records)
    val closed = intact.collect()
    assert(closed.length == 1 && closed.head.id == 1L &&
      closed.head.end.contains(1500L))
    assert(ongoing.collect().map(_.id).toSeq == Seq(2L))
  }

  test("streaming merge buffers opens and emits on close") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // Default NoTimeout semantics (reference behavior): no timeout-check
    // batches, so processAllAvailable settles deterministically.
    val input = MemoryStream[SpanRecord]
    val out = SpanMerger.mergeStream(spark, input.toDS())
    val q = out.writeStream.format("memory").queryName("merged")
      .outputMode("append").start()
    try {
      input.addData(rec(1, 7), rec(2, 8))
      q.processAllAvailable()
      assert(spark.table("merged").count() == 0) // both still open
      input.addData(rec(3, 7, end = Some(9000L)))
      q.processAllAvailable()
      val rows = spark.table("merged").as[graft.model.Span].collect()
      assert(rows.map(_.id).toSeq == Seq(7L)) // 8 still held in state
      assert(rows.head.end.contains(9000L))
    } finally q.stop()
  }
}
