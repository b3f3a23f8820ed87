package graft.query

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.store.SchemaRegistry.unionByNameAllowMissing

/** The log-search / field-stats query surface
  * (reference: duo/src/web/logs.rs, shared builder duo/src/query.rs:56-152).
  *
  * Pipelines are conventional filter → sort → offset/limit and
  * filter → aggregate → sort → limit; the reference's sort-after-limit /
  * limit-before-aggregate quirk (SURVEY §2.4) is deliberately NOT
  * reproduced — it is a paging bug, and the divergence is documented
  * here and in the specs.
  */
object LogQueries {

  /** Search parameters (duo/src/web/logs.rs:13-34). Times are µs epoch;
    * defaults mirror the reference: page size 50, and — at the ENGINE's
    * storage layer, exactly like `Query::df()` (duo/src/query.rs:104-109)
    * — an unset range reads only the last 15 minutes of cold parquet
    * (the hot memory view is always included). `unbounded = true` is the
    * explicit opt-out that scans all of cold storage. Row-level time
    * filters apply only when startUs/endUs are explicitly set, again
    * like the reference.
    */
  case class LogSearchParams(
      service: String,
      startUs: Option[Long] = None,
      endUs: Option[Long] = None,
      expr: Option[String] = None,
      skip: Int = 0,
      limit: Int = 50,
      unbounded: Boolean = false)

  /** The one place user text enters the planner (SURVEY §3.1): parse the
    * expression against the frame's schema via Catalyst; on any parse or
    * resolution failure fall back to `message ILIKE '%text%'`
    * (duo/src/web/logs.rs:45-57).
    *
    * Security: this string is remotely reachable (the HTTP façade's
    * `expr` parameter), and Spark's builtin surface includes
    * `reflect`/`java_method` — arbitrary public-static JVM invocation,
    * which the reference's DataFusion expr surface has no equivalent
    * of, so route parity does not cover it. The ANALYZED tree is
    * inspected (not the raw text — that misses aliases and casing):
    * any `CallMethodViaReflection` node rejects the expression into
    * the same ILIKE fallback as a parse failure, i.e. the hostile
    * string degrades to a harmless substring match.
    */
  def userPredicate(df: DataFrame, exprStr: String): Column =
    Try {
      val c = expr(exprStr)
      val analyzed =
        df.select(c).queryExecution.analyzed // force resolution
      val reflective = analyzed.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions
          .CallMethodViaReflection => true
        case _ => false
      })
      require(!reflective, "reflective expression rejected")
      c
    }.getOrElse(col("message").ilike(s"%$exprStr%"))

  /** Union of the hot in-memory view and the pruned parquet range —
    * `Query::df()` (duo/src/query.rs:99-113), with unionByName so
    * drifted dynamic-log schemas align.
    */
  def unionStore(memory: DataFrame, parquet: Option[DataFrame]): DataFrame =
    parquet.map(p => unionByNameAllowMissing(memory, p)).getOrElse(memory)

  /** GET /api/logs (SURVEY §3.1): service-prefix filter ∧ time range ∧
    * user expression, newest first, paged. The service filter is a
    * prefix LIKE on process_id ("{service}-{n}" ids, F1).
    */
  def search(logs: DataFrame, p: LogSearchParams): DataFrame = {
    var df = logs.filter(col("process_id").like(s"${p.service}%"))
    p.startUs.foreach(s => df = df.filter(col("time") >= s))
    p.endUs.foreach(e => df = df.filter(col("time") <= e))
    p.expr.foreach(e => df = df.filter(userPredicate(df, e)))
    // span_id tiebreak on top of the reference's time-desc sort: makes
    // pagination deterministic when many logs share a microsecond.
    df.orderBy(col("time").desc, col("span_id").desc_nulls_last)
      .offset(p.skip)
      .limit(p.limit)
  }

  /** GET /api/logs/stats/:field (SURVEY §3.3): faceted top-K histogram
    * of one (possibly dynamic) field. Returns None when the field is not
    * in the schema — the reference's 404 (duo/src/web/logs.rs:69-71).
    * Null field values are excluded from the result (F12).
    */
  def fieldStats(logs: DataFrame, field: String, p: LogSearchParams,
      k: Int = 20): Option[DataFrame] = {
    if (!logs.columns.contains(field)) return None
    var df = logs.filter(col("process_id").like(s"${p.service}%"))
    p.startUs.foreach(s => df = df.filter(col("time") >= s))
    p.endUs.foreach(e => df = df.filter(col("time") <= e))
    p.expr.foreach(e => df = df.filter(userPredicate(df, e)))
    Some(df
      .filter(col(field).isNotNull)
      .groupBy(col(field).as("value"))
      .agg(count(col(field)).as("count"))
      .orderBy(col("count").desc, col("value"))
      .limit(k))
  }

  /** Distinct operation names for a service — GET /api/services'
    * span-name listing (A1, duo/src/web/services.rs:132-153).
    */
  def spanNames(spans: DataFrame, service: String): DataFrame =
    spans.filter(col("process_id").like(s"$service%"))
      .select(col("name"))
      .distinct()
      .orderBy(col("name"))
}
