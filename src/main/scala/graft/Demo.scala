package graft

import org.apache.spark.sql.SparkSession

import graft.ingest.SpanRecord
import graft.model.TagValue
import graft.query.LogQueries.LogSearchParams

/** End-to-end engine lifecycle demo driven through the public API:
  * ingest → simulated crash → WAL replay → flush → restart → query.
  * Prints one status line per phase; used for manual verification.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("duospark-demo").toString
    val t0 = 1760000000000000L

    val e1 = new DuoEngine(spark, root)
    e1.processes.register("example", Map("duo-version" -> TagValue.str("0.2.0")))
    e1.ingestBatch(
      Seq(
        SpanRecord(1, 101, None, 9001, "foo", "example-0", t0, None, Map.empty),
        // raw u64 busy/idle arrive from the wire; ingest formats them
        SpanRecord(2, 101, None, 9001, "foo", "example-0", t0, Some(t0 + 250000),
          Map("busy" -> TagValue.u64(3000), "retries" -> TagValue.i64(2),
            "cached" -> TagValue.bool(true))),
        SpanRecord(3, 102, Some(101), 9001, "bar", "example-0", t0 + 10000, Some(t0 + 120000), Map.empty)),
      Seq(("example-0", t0 + 5000L, Some(9001L), Some(101L), "INFO", Some("hello foo!")),
        ("example-0", t0 + 200000L, Some(9001L), Some(101L), "ERROR", Some("Oops!")))
        .toDF("process_id", "time", "trace_id", "span_id", "level", "message"))
    println(s"[demo] ingested: spans=${e1.spanTable().count()} logs=${e1.logTable().count()}")

    // simulated crash: new engine over the same root replays the WAL
    val e2 = new DuoEngine(spark, root)
    println(s"[demo] after restart (WAL replay): spans=${e2.spanTable().count()} logs=${e2.logTable().count()}")

    val hits = e2.searchLogs(LogSearchParams(service = "example", expr = Some("level = 'ERROR'")))
    println(s"[demo] log search level='ERROR': ${hits.count()} hit(s)")

    val trace = e2.getTrace(9001L).collect().head
    println(s"[demo] trace 9001: n_spans=${trace.getAs[Long]("n_spans")} " +
      s"n_logs=${trace.getAs[Long]("n_logs")} has_error=${trace.getAs[Int]("has_error")}")
    val span101 = e2.spans.collect().find(_.id == 101L).get
    println(s"[demo] span 101 tags (u64 busy formatted at ingest, " +
      s"typed values kept): ${span101.tags.getOrElse("")}")

    e2.flush()
    val e3 = new DuoEngine(spark, root)
    println(s"[demo] after flush + restart (cold parquet only, WAL cleared=" +
      s"${!new java.io.File(s"$root/wal/span").exists()}): " +
      s"spans=${e3.spanTable().count()} logs=${e3.logTable().count()}")

    new graft.store.ParquetStore(spark, root, "span", "start").compact()
    println(s"[demo] after span-store compaction: spans=${e3.spanTable().count()}")
    spark.stop()
  }
}
