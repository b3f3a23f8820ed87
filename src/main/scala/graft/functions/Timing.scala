package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Human timing formatting and duration parsing
  * (reference: duo/src/models.rs:186-195, duo/src/web/deser.rs:241-252).
  */
object Timing {

  /** µs → "3us" / "3.00ms" / "3.33s".
    *
    * Matches the reference's Rust `format!("{:.2}", f64)` output: the
    * exact binary double is rounded to 2 decimals half-to-even (also
    * what C printf and DuckDB's printf produce), NOT Java's
    * String.format which rounds half-up and disagrees on exact binary
    * ties like 1.125.
    */
  def formatTimingValue(us: Long): String = {
    def f2(d: Double): String =
      new JBigDecimal(d).setScale(2, RoundingMode.HALF_EVEN).toPlainString
    if (us < 1000L) s"${us}us"
    else if (us < 1000000L) s"${f2(us / 1000.0)}ms"
    else s"${f2(us / 1000000.0)}s"
  }

  /** Column form of [[formatTimingValue]]. A Scala UDF is acceptable
    * here: the function runs at the ingest/serving edge on tag values,
    * never in a hot aggregation path (SURVEY §2.9).
    */
  val formatTiming = udf(formatTimingValue _)
  def format_timing(c: Column): Column = formatTiming(c)

  /** "300us" | "300ms" | "3s" → µs. Lowercased first, like the
    * reference; anything else is None (the reference surfaces a 400).
    */
  def parseDuration(s: String): Option[Long] = {
    val t = s.trim.toLowerCase
    def num(body: String, mult: Long): Option[Long] =
      body.toLongOption.map(_ * mult)
    if (t.endsWith("us")) num(t.dropRight(2), 1L)
    else if (t.endsWith("ms")) num(t.dropRight(2), 1000L)
    else if (t.endsWith("s")) num(t.dropRight(1), 1000000L)
    else None
  }
}
