package graft

import graft.ingest.{SpanMerger, SpanRecord}
import graft.model.TagValue

/** Upsert semantics from duo/src/aggregator.rs:17-30 (SURVEY J4/ST2). */
class SpanMergerSpec extends SparkSpec {

  private def rec(seq: Long, id: Long, parent: Option[Long] = None,
      end: Option[Long] = None, tags: Map[String, TagValue] = Map.empty) =
    SpanRecord(seq, id, parent, trace_id = 9001L, name = "op",
      process_id = "svc-0", start = 1000L, end = end, tags = tags)

  test("close record completes an open span") {
    val merged = SpanMerger.mergeAll(Seq(
      rec(1, 101, tags = Map("k" -> TagValue.str("v"))),
      rec(2, 101, parent = Some(100L), end = Some(2000L),
        tags = Map("k2" -> TagValue.str("v2")))))
    assert(merged.parent_id.contains(100L))
    assert(merged.end.contains(2000L))
    assert(merged.tags ==
      Map("k" -> TagValue.str("v"), "k2" -> TagValue.str("v2")))
    assert(merged.start == 1000L) // first record pins identity fields
  }

  test("later tag values win; missing parent does not erase") {
    val merged = SpanMerger.mergeAll(Seq(
      rec(1, 5, parent = Some(4L), tags = Map("a" -> TagValue.str("1"))),
      rec(2, 5, tags = Map("a" -> TagValue.str("2")))))
    assert(merged.parent_id.contains(4L))
    assert(merged.tags == Map("a" -> TagValue.str("2")))
    // end mirrors the LAST record, even when unset (reference overwrites
    // unconditionally, aggregator.rs:26)
    assert(merged.end.isEmpty)
  }

  test("typed tags reach the span JSON typed; u64 busy/idle formatted") {
    // ported reference behavior: Span::from formats U64Val busy/idle via
    // format_timing_value (duo/src/models.rs:104-113) — 3000us -> 3.00ms
    val merged = SpanMerger.mergeAll(Seq(
      rec(1, 9, end = Some(2000L), tags = Map(
        "busy" -> TagValue.u64(3000L),
        "idle" -> TagValue.u64(200L),
        "n" -> TagValue.i64(-5L),
        "big" -> TagValue.u64(-1L), // u64 bit pattern 2^64-1
        "ok" -> TagValue.bool(true),
        "note" -> TagValue.str("he said \"hi\" {braces}")))))
    val json = SpanMerger.toSpan(merged).tags.get
    assert(json.contains(""""busy":"3.00ms""""))
    assert(json.contains(""""idle":"200us""""))
    assert(json.contains(""""n":-5"""))
    assert(json.contains(""""big":18446744073709551615"""))
    assert(json.contains(""""ok":true"""))
    assert(json.contains(""""note":"he said \"hi\" {braces}""""))
    // a STRING-typed busy passes through unformatted (only u64 triggers)
    val strBusy = SpanMerger.toSpan(
      rec(1, 10, end = Some(2L), tags = Map("busy" -> TagValue.str("raw"))))
    assert(strBusy.tags.get.contains(""""busy":"raw""""))
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

  test("mergeBatchSql agrees with the typed merge on random record sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val recs = (0 until 400).map { i =>
      SpanRecord(i.toLong, rnd.nextInt(40).toLong,
        if (rnd.nextBoolean()) Some(rnd.nextInt(5).toLong) else None,
        trace_id = rnd.nextInt(10).toLong, name = s"n$i",
        process_id = s"p${rnd.nextInt(3)}",
        start = 1000L + rnd.nextInt(100),
        end = if (rnd.nextBoolean()) Some(2000L + rnd.nextInt(100)) else None,
        tags = Map.empty)
    }
    // arrival order scrambled; seq alone defines merge order
    val sqlOut = SpanMerger.mergeBatchSql(rnd.shuffle(recs).toDF()).collect()
      .map { r =>
        def optLong(c: String): Option[Long] =
          if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
        r.getAs[Long]("id") ->
          (optLong("parent_id"), r.getAs[Long]("trace_id"),
            r.getAs[String]("name"), r.getAs[Long]("start"), optLong("end"))
      }.toMap
    val expected = recs.groupBy(_.id).map { case (_, rs) => SpanMerger.mergeAll(rs) }
    assert(sqlOut.size == expected.size)
    expected.foreach { e =>
      // parent_id must be last-NON-NULL-by-seq (not max value), identity
      // fields first-by-seq, end last-by-seq — same laws as mergeTwo
      assert(sqlOut(e.id) ==
        ((e.parent_id, e.trace_id, e.name, e.start, e.end)), s"id=${e.id}")
    }
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

  test("w07 gate: streamed upsert equals the batch merge replay") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val streamed = graft.queries.EngineQueries.spanMergeStreamGate(spark, d)
      .as[graft.model.Span].collect().sortBy(_.id)
    // batch replay: same partial-record derivation, mergeBatch + toSpan
    // same deterministic id-dedup as the gate feed (the synthetic
    // lineitem has duplicate (l_orderkey, l_linenumber) pairs)
    val base = graft.queries.EngineQueries.ordersAsSpans(spark, d)._1
      .select("id", "parent_id", "trace_id", "name", "process_id",
        "start", "end")
      .as[(Long, Option[Long], Long, String, String, Long, Long)]
      .collect()
      .groupBy(_._1).valuesIterator
      .map(_.minBy(t => (t._4, t._6, t._7)))
      .toArray.sortBy(_._1)
    val partials = base.toSeq.flatMap {
      case (id, parent, tid, name, proc, start, end) =>
        Seq(
          SpanRecord(0L, id, None, tid, name, proc, start, None,
            Map("op" -> TagValue.str(name)))) ++
          (if (parent.isEmpty)
            Seq(SpanRecord(1L, id, None, tid, name, proc, start, None,
              Map("phase" -> TagValue.str("work"))))
          else Nil) ++
          Seq(SpanRecord(2L, id, parent, tid, name, proc, start, Some(end),
            Map("phase" -> TagValue.str("closed"),
              "busy" -> TagValue.u64(end - start))))
    }
    val (intact, ongoing) = SpanMerger.mergeBatch(spark, partials.toDS())
    assert(ongoing.isEmpty)
    val batch = intact.collect().sortBy(_.id)
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    // every span closed with the merged three-key tag JSON
    assert(streamed.forall(sp => sp.end.isDefined &&
      sp.tags.exists(t => t.startsWith("""{"busy":""") &&
        t.endsWith(""","phase":"closed"}"""))))
  }

  test("state backend is an engine config and results are backend-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.util.StateBackend
    // the selection rule pins the documented threshold (the w11 100×
    // finding: in-heap OOM at ~60M keys — SCALE.md)
    assert(StateBackend.forExpectedKeys(1000L) == StateBackend.HeapProvider)
    assert(StateBackend.forExpectedKeys(StateBackend.HeapKeyCeiling)
      == StateBackend.HeapProvider)
    assert(StateBackend.forExpectedKeys(60L * 1000 * 1000)
      == StateBackend.RocksDBProvider)
    // the SAME streamed merge under both providers: provider choice
    // moves WHERE state lives, never what the operator computes
    val raw = graft.queries.EngineQueries
      .ordersAsSpans(spark, "/root/testdata/sf0.001")._1
      .filter(col("trace_id") % 11 === 0)
    def runWith(backend: String): Seq[graft.model.Span] = {
      val (opens, rearrivals, closes, base) =
        graft.queries.EngineQueries.spanRecordFeedFrom(raw)
      try graft.util.StreamGate.runParquet(spark, "backend_invariance",
          Seq(opens, rearrivals.unionAll(closes)),
          df => SpanMerger.mergeStream(spark, df.as[SpanRecord]).toDF(),
          statePartitions = Some(4), stateBackend = Some(backend))
        .as[graft.model.Span].collect().toSeq.sortBy(_.id)
      finally base.unpersist(): Unit
    }
    val heap = runWith(StateBackend.HeapProvider)
    val rocks = runWith(StateBackend.RocksDBProvider)
    assert(heap.nonEmpty && heap == rocks)
    // the scoped override restored the session's provider conf
    assert(spark.conf.getOption(StateBackend.ConfKey).isEmpty ||
      !spark.conf.get(StateBackend.ConfKey).contains("RocksDB"))
  }

  test("w11 gate: stream->store->query loop equals the batch pipeline") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val streamed = graft.queries.EngineQueries.ingestLoopGate(spark, d)
      .collect().toSeq
    // batch replay of the whole loop without stream or store: deduped
    // feed -> batch merge -> the same trace search over the merged spans
    val base = graft.queries.EngineQueries.ordersAsSpans(spark, d)._1
      .select("id", "parent_id", "trace_id", "name", "process_id",
        "start", "end")
      .as[(Long, Option[Long], Long, String, String, Long, Long)]
      .collect()
      .groupBy(_._1).valuesIterator
      .map(_.minBy(t => (t._4, t._6, t._7)))
      .toSeq.toSeq
    val partials = base.flatMap {
      case (id, parent, tid, name, proc, start, end) =>
        Seq(SpanRecord(0L, id, None, tid, name, proc, start, None,
            Map("op" -> TagValue.str(name))),
          SpanRecord(2L, id, parent, tid, name, proc, start, Some(end),
            Map("phase" -> TagValue.str("closed"),
              "busy" -> TagValue.u64(end - start))))
    }
    val (intact, _) = SpanMerger.mergeBatch(spark, partials.toDS())
    val logs = graft.queries.EngineQueries.ordersAsSpans(spark, d)._2
    val batch = graft.query.TraceQueries.filterTraces(spark,
        intact.toDF(), logs,
        graft.query.TraceQueries.TraceSearchParams(service = "oltp",
          operation = Some("1-URGENT"), minDurationUs = Some(2000000L),
          limit = 20))
      .select(col("trace_id"), col("n_spans"), col("trace_start"),
        col("trace_end"), col("has_error"), col("n_logs"),
        concat_ws(",", transform(col("spans"),
          sp => sp.getField("id").cast("string"))).as("span_digest"),
        concat_ws("|", transform(col("spans"),
          sp => coalesce(sp.getField("tags"), lit(""))))
          .as("tag_digest"))
      .orderBy(col("trace_id")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // the loop surfaced both merge-produced and correlation-spliced
    // tag content: busy formatted at ingest, error spliced at query
    val digests = streamed.map(_.getAs[String]("tag_digest"))
    assert(digests.forall(_.contains(""""busy":""")))
    assert(digests.exists(_.contains(""""error":true""")))
  }
}
