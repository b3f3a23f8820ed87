package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.SpanRecord
import graft.query.LogQueries.LogSearchParams
import graft.store.{ParquetStore, ProcessRegistry, SchemaRegistry}

/** End-to-end engine lifecycle: ingest → memory view → parquet flush →
  * unioned query, plus the store components (SURVEY §2.1, §2.8).
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("duospark-test").toString

  private val t0 = 1760000000000000L // 2025-10-09T08:53:20Z

  private def rec(seq: Long, id: Long, trace: Long, start: Long,
      end: Option[Long]) =
    SpanRecord(seq, id, None, trace, "op", "svc-0", start, end, Map.empty)

  test("ingest -> flush -> query unions memory and parquet") {
    val root = tmpRoot()
    val engine = new DuoEngine(spark, root)

    val logs1 = Seq(("svc-0", t0 + 1000L, "INFO", "first"))
      .toDF("process_id", "time", "level", "message")
    engine.ingestBatch(Seq(rec(1, 1, 100, t0, Some(t0 + 5000L))), logs1)
    engine.flush() // everything now in parquet, memory empty

    // second batch stays hot in memory, with a NEW dynamic column
    val logs2 = Seq(("svc-0", t0 + 2000L, "WARN", "second", 42L))
      .toDF("process_id", "time", "level", "message", "flag")
    engine.ingestBatch(Seq(rec(2, 2, 100, t0 + 10000L, Some(t0 + 20000L))), logs2)

    assert(engine.spanTable().count() == 2) // 1 parquet + 1 memory
    val got = engine.searchLogs(LogSearchParams(service = "svc"))
    assert(got.count() == 2)
    // drift: old parquet row surfaces the new column as null
    assert(got.filter(col("flag").isNull).count() == 1)
    assert(got.filter(col("flag") === 42L).count() == 1)

    // partitioned layout (hive dirs derived from row time)
    val spanDir = new java.io.File(s"$root/span")
    assert(spanDir.listFiles().exists(_.getName.startsWith("date=")))
    // log schema persisted with the dynamic column
    val persisted = SchemaRegistry.load(s"$root/schema/log_schema.json").get
    assert(persisted.fieldNames.contains("flag"))
  }

  test("WAL replays un-flushed batches on restart and clears on flush") {
    val root = tmpRoot()
    val e1 = new DuoEngine(spark, root)
    val logs = Seq(("svc-0", t0 + 500L, "INFO", "walled"))
      .toDF("process_id", "time", "level", "message")
    e1.ingestBatch(Seq(rec(1, 11, 300, t0, Some(t0 + 1L))), logs)
    // crash before flush: a fresh engine over the same root replays WAL
    val e2 = new DuoEngine(spark, root)
    assert(e2.spanTable().count() == 1)
    assert(e2.logTable().count() == 1)
    e2.flush()
    assert(!new java.io.File(s"$root/wal/span").exists())
    assert(!new java.io.File(s"$root/wal/log").exists())
    // after the flush the data lives in cold parquet only — no double count
    val e3 = new DuoEngine(spark, root)
    assert(e3.spanTable().count() == 1)
    assert(e3.logTable().count() == 1)
  }

  test("open spans survive batches until closed") {
    val engine = new DuoEngine(spark, tmpRoot(), memoryMode = true)
    val noLogs = Seq.empty[(String, Long, String, String)]
      .toDF("process_id", "time", "level", "message")
    engine.ingestBatch(Seq(rec(1, 7, 200, t0, None)), noLogs)
    assert(engine.spanTable().count() == 0) // still open
    engine.ingestBatch(Seq(rec(2, 7, 200, t0, Some(t0 + 99L))), noLogs)
    assert(engine.spanTable().count() == 1) // merged + emitted
  }

  test("memory mode never writes to disk") {
    val root = tmpRoot()
    val engine = new DuoEngine(spark, root, memoryMode = true)
    val logs = Seq(("svc-0", t0, "INFO", "m")).toDF("process_id", "time", "level", "message")
    engine.ingestBatch(Nil, logs)
    engine.flush()
    assert(!new java.io.File(s"$root/log").exists())
    assert(engine.searchLogs(LogSearchParams(service = "svc")).count() == 1)
  }

  test("parquet store prunes by time range and drops partition cols") {
    val root = tmpRoot()
    val store = new ParquetStore(spark, root, "span", "start")
    val day1 = 1760000000000000L
    val day2 = day1 + 86400L * 1000000L
    store.write(Seq((1L, day1, 100L), (2L, day2, 200L))
      .toDF("id", "start", "trace_id"))
    val all = store.read(None, None).get
    assert(all.count() == 2 && !all.columns.contains("date"))
    val onlyDay1 = store.read(Some(day1 - 1000), Some(day1 + 1000)).get
    assert(onlyDay1.select("id").as[Long].collect().toSeq == Seq(1L))
    // reference-shaped prefix listing finds the same row
    val viaPrefixes = store.readPrefixes(day1 - 1000000L, day1 + 1000000L).get
    assert(viaPrefixes.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("streaming ingest wires merged spans into the engine") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val engine = new DuoEngine(spark, tmpRoot(), memoryMode = true)
    val input = MemoryStream[SpanRecord]
    input.addData(
      rec(1, 21, 400, t0, None),
      rec(2, 21, 400, t0, Some(t0 + 5L)), // closes span 21
      rec(3, 22, 400, t0, None)) // stays open in state
    val q = graft.ingest.StreamingIngest.startSpans(
      engine, input.toDS(), Trigger.AvailableNow(), flushEveryBatches = 1000)
    q.awaitTermination()
    assert(engine.spanTable().count() == 1)
    assert(engine.spanTable().select("id").as[Long].collect().toSeq == Seq(21L))
  }

  test("process registry assigns {service}-{n} ids and round-trips") {
    val path = tmpRoot() + "/process.json"
    val reg = new ProcessRegistry(path)
    assert(reg.register("example", Map("duo-version" -> "0.2.0")) == "example-0")
    assert(reg.register("example", Map.empty) == "example-1")
    assert(reg.register("log", Map.empty) == "log-0")
    val reloaded = new ProcessRegistry(path)
    assert(reloaded.all.map(_.id) == Seq("example-0", "example-1", "log-0"))
    assert(reloaded.byService("example").head.tags("duo-version") == "0.2.0")
  }

  test("schema registry merge is monotone and rejects retypes") {
    import org.apache.spark.sql.types._
    val base = StructType(Seq(StructField("a", LongType)))
    val incoming = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType)))
    val merged = SchemaRegistry.merge(base, incoming)
    assert(merged.fieldNames.toSeq == Seq("a", "b"))
    val conflicting = StructType(Seq(StructField("a", StringType)))
    intercept[IllegalArgumentException](SchemaRegistry.merge(merged, conflicting))
  }
}
