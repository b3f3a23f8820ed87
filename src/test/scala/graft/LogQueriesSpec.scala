package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.query.LogQueries
import graft.query.LogQueries.LogSearchParams

/** Log search semantics (SURVEY §3.1/§3.3): prefix filter, SQL expr with
  * ILIKE fallback, sort/offset/limit, field-stats top-K with 404, null
  * group drop, drift-safe union.
  */
class LogQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def logs: DataFrame = Seq(
    // process_id, time, trace_id, span_id, level, target, file, line, message, flag
    ("example-0", 1000L, Some(9001L), Some(101L), "INFO", "main", "hello foo!", Some(1L)),
    ("example-0", 2000L, Some(9001L), Some(101L), "ERROR", "main", "Oops!", None),
    ("example-1", 3000L, None, None, "DEBUG", "aux", "debugging", Some(2L)),
    ("log-0", 4000L, None, None, "INFO", "boot", "Bootstrap...", None),
    ("example-0", 5000L, Some(9002L), Some(103L), "DEBUG", "main", "more debug", Some(1L)))
    .toDF("process_id", "time", "trace_id", "span_id", "level", "target",
      "message", "flag")

  test("service prefix + SQL expr filter, newest first, paged") {
    val got = LogQueries.search(logs,
      LogSearchParams(service = "example", expr = Some("level = 'DEBUG'")))
      .select("time").as[Long].collect().toSeq
    assert(got == Seq(5000L, 3000L))
  }

  test("unparseable expr falls back to message ILIKE contains") {
    val got = LogQueries.search(logs,
      LogSearchParams(service = "example", expr = Some("OOPS")))
      .select("time").as[Long].collect().toSeq
    assert(got == Seq(2000L)) // matched via ILIKE '%OOPS%'
  }

  test("time range + offset/limit") {
    val got = LogQueries.search(logs,
      LogSearchParams(service = "example", startUs = Some(1000L),
        endUs = Some(5000L), skip = 1, limit = 2))
      .select("time").as[Long].collect().toSeq
    assert(got == Seq(3000L, 2000L)) // 5000 skipped by offset
  }

  test("field stats: top-K with null drop; absent field is None (404)") {
    val stats = LogQueries.fieldStats(logs, "flag",
      LogSearchParams(service = "example")).get
      .as[(Long, Long)].collect().toSeq
    assert(stats == Seq((1L, 2L), (2L, 1L))) // null flags dropped
    assert(LogQueries.fieldStats(logs, "no_such_field",
      LogSearchParams(service = "example")).isEmpty)
  }

  test("drift-safe union aligns old rows with new dynamic columns") {
    val old = logs.drop("flag")
    val merged = LogQueries.unionStore(old, Some(logs))
    assert(merged.columns.contains("flag"))
    assert(merged.count() == 10)
    assert(merged.filter(col("flag").isNull).count() == 5 + 2)
  }
}
