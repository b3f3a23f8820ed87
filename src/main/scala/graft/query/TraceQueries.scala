package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Jaeger-style trace search + assembly
  * (reference: duo/src/web/services.rs:13-130, correlation
  * duo/src/models.rs:80-94).
  *
  * The reference does all of this app-side after collecting every
  * matching span; here each step is a distributed operator (SURVEY §2.3
  * J1-J3):
  *  - root-span admission = filter on parent_id IS NULL + operation /
  *    start-range / duration predicates (F8-F11);
  *  - trace scoping = left_semi joins on trace_id (J1) — the admitted
  *    trace-id set is tiny (≤ limit) and broadcastable;
  *  - span↔log correlation + error tag = left outer join on
  *    span_id == id with an ERROR-count aggregate (J2/A3);
  *  - assembly = groupBy(trace_id) + collect_list(struct(...)) (J3) —
  *    one shuffle keyed by trace_id; a trace's spans are bounded (one
  *    request), so collect_list cannot skew a reducer.
  *
  * Deliberate divergences (documented, SURVEY §7.4): the trace limit
  * picks the N most recent roots (the reference's HashMap take(limit) is
  * nondeterministic, O4); children arriving before their root are kept
  * (the reference drops them, §3.2).
  */
object TraceQueries {

  /** Search parameters. Like [[graft.query.LogQueries.LogSearchParams]],
    * an unset time range defaults to the last 15 minutes at the engine's
    * cold-storage read (duo/src/query.rs:104-109); `unbounded = true`
    * opts out explicitly.
    */
  case class TraceSearchParams(
      service: String,
      operation: Option[String] = None,
      startUs: Option[Long] = None,
      endUs: Option[Long] = None,
      minDurationUs: Option[Long] = None,
      maxDurationUs: Option[Long] = None,
      limit: Int = 20,
      unbounded: Boolean = false)

  /** Root spans passing the admission predicates (F8-F11). */
  def admittedRoots(spans: DataFrame, p: TraceSearchParams): DataFrame = {
    var roots = spans
      .filter(col("process_id").like(s"${p.service}%"))
      .filter(col("parent_id").isNull)
    p.operation.foreach(op => roots = roots.filter(col("name") === op))
    p.startUs.foreach(s => roots = roots.filter(col("start") >= s))
    p.endUs.foreach(e => roots = roots.filter(col("start") <= e))
    val dur = col("end") - col("start")
    p.minDurationUs.foreach(m => roots = roots.filter(dur >= m))
    p.maxDurationUs.foreach(m => roots = roots.filter(dur <= m))
    // Derived END-RANGE conjuncts: `end - start` is an arithmetic
    // expression parquet row-group statistics can never serve, but
    // each (start-bound, duration-bound) pair IMPLIES a bound on the
    // STORED `end` column — redundant predicates, so results are
    // unchanged, while the scan gains pushable row-group filters that
    // a z-ordered layout (ParquetStore.compact zorderOn start ×
    // duration) makes decisive (measured skip ratios in SCALE.md;
    // read-path form at ParquetStore.readSpanRange).
    for (s <- p.startUs; m <- p.minDurationUs)
      roots = roots.filter(col("end") >= s + m)
    for (e <- p.endUs; m <- p.maxDurationUs)
      roots = roots.filter(col("end") <= e + m)
    roots
  }

  /** Attach logs to spans and inject the `error=true` tag for spans with
    * at least one ERROR-level log (J2 + A3 + C4: the tag lives in the
    * JSON tags string, so it is decoded, merged, re-encoded).
    */
  def correlateSpanLogs(spans: DataFrame, logs: DataFrame): DataFrame = {
    val errCounts = logs
      .filter(col("level") === "ERROR" && col("span_id").isNotNull)
      .groupBy(col("span_id")).agg(count(lit(1)).as("n_errors"))
    spans.join(errCounts, spans("id") === errCounts("span_id"), "left_outer")
      // the error flag rides out as a real column (consumed by
      // [[assemble]]): log-derived, OR already present in the span's own
      // tags — decoded with a real JSON path lookup, not a substring
      // sniff a user tag could false-positive
      .withColumn("has_err",
        (col("n_errors").isNotNull && col("n_errors") > 0) ||
          coalesce(get_json_object(col("tags"), "$.error") === "true",
            lit(false)))
      // splice `"error":true` into the raw JSON text — a typed JSON
      // bool like the reference's Value::Bool insert
      // (duo/src/models.rs:80-94); a from_json(Map[String,String])
      // round-trip would stringify every typed tag value on exactly
      // the spans that have errors. Tags that already carry an `error`
      // key are left as-is (has_err above already accounts for them;
      // splicing a second key would produce duplicate-key JSON), and
      // the splice tolerates surrounding whitespace in the stored text.
      // Presence is checked with map_contains_key over a parsed map —
      // get_json_object returns null for BOTH a missing key and a JSON
      // null value ({"error":null}), which would splice a duplicate key.
      .withColumn("tags",
        when(
          col("n_errors").isNotNull && col("n_errors") > 0 &&
            !coalesce(map_contains_key(
              from_json(col("tags"),
                org.apache.spark.sql.types.MapType(
                  org.apache.spark.sql.types.StringType,
                  org.apache.spark.sql.types.StringType)),
              lit("error")), lit(false)),
          when(col("tags").isNull || trim(col("tags")).rlike("^\\{\\s*\\}$")
              || trim(col("tags")) === "",
            lit("""{"error":true}"""))
            .otherwise(concat(
              regexp_replace(trim(col("tags")), "\\}\\s*$", ""),
              lit(""","error":true}"""))))
          .otherwise(col("tags")))
      .drop("span_id", "n_errors")
  }

  /** GET /api/traces: search → scope → correlate → assemble. Returns one
    * row per trace with the span list collected as structs, ordered by
    * span start (deterministic), plus trace-level rollups.
    */
  def filterTraces(spark: SparkSession, spans: DataFrame, logs: DataFrame,
      p: TraceSearchParams): DataFrame = {
    val roots = admittedRoots(spans, p)
      .select(col("trace_id"), col("start").as("root_start"))
      .orderBy(col("root_start").desc, col("trace_id"))
      .limit(p.limit)
    val ids = broadcast(roots.select(col("trace_id")))
    assemble(
      correlateSpanLogs(spans.join(ids, Seq("trace_id"), "left_semi"), logs),
      logs.join(ids, Seq("trace_id"), "left_semi"))
  }

  /** GET /api/traces/:id — same pipeline, exact trace_id filter (F2). */
  def getTrace(spark: SparkSession, spans: DataFrame, logs: DataFrame,
      traceId: Long): DataFrame =
    assemble(
      correlateSpanLogs(spans.filter(col("trace_id") === traceId), logs),
      logs.filter(col("trace_id") === traceId))

  /** Group a scoped span/log set into TraceExt rows (J3). Expects the
    * [[correlateSpanLogs]] output (the `has_err` column).
    */
  def assemble(spans: DataFrame, logs: DataFrame): DataFrame = {
    val logCounts = logs.groupBy(col("trace_id"))
      .agg(count(lit(1)).as("n_logs"))
    spans
      .groupBy(col("trace_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        min(col("start")).as("trace_start"),
        max(col("end")).as("trace_end"),
        max(col("has_err").cast("int")).as("has_error"),
        sort_array(collect_list(struct(
          col("start"), col("id"), col("parent_id"), col("name"),
          col("process_id"), col("end"), col("tags")))).as("spans"))
      .join(logCounts, Seq("trace_id"), "left_outer")
      .withColumn("n_logs", coalesce(col("n_logs"), lit(0L)))
  }
}
