package graft.model

import org.apache.spark.sql.types._

/** Row models + schemas for the two columnar tables and the process
  * registry (reference: duo/src/schema.rs:16-42, duo/src/models.rs:9-52).
  *
  * Representation choices (SURVEY §1.5):
  *  - u64 ids are bit-cast into LongType (ids are only compared for
  *    equality; unsigned rendering happens at the API edge).
  *  - times are plain epoch-microsecond longs, exactly like the
  *    reference's Int64 µs columns — not TimestampType.
  *  - span tags ride as a JSON string column (duo/src/arrow.rs:33);
  *    log dynamic fields become real top-level columns (SchemaRegistry).
  */
case class Span(
    id: Long,
    parent_id: Option[Long],
    trace_id: Long,
    name: String,
    process_id: String,
    start: Long,
    end: Option[Long],
    tags: Option[String])

/** Base log row; dynamic key-value fields are carried separately by the
  * ingest layer and flattened into columns (duo/src/arrow.rs:70-91).
  */
case class Log(
    process_id: String,
    time: Long,
    trace_id: Option[Long],
    span_id: Option[Long],
    level: String,
    target: Option[String],
    file: Option[String],
    line: Option[Int],
    message: Option[String])

/** Typed tag value — the wire oneof (duo-api/proto/common.proto:28-38:
  * str_val / u64_val / sint64_val / bool_val) expressed as a
  * Spark-encodable product with exactly one field set (a sealed trait
  * has no Catalyst encoder; this struct shape does). u64 values are
  * bit-cast longs (SURVEY §1.5) rendered unsigned at the edges.
  */
case class TagValue(
    strVal: Option[String] = None,
    u64Val: Option[Long] = None,
    i64Val: Option[Long] = None,
    boolVal: Option[Boolean] = None) {

  /** Typed JSON value token, matching the reference's conversion of
    * wire values into serde_json::Value (duo/src/models.rs:117-126):
    * strings quoted+escaped, integers bare (u64 unsigned), bools bare.
    */
  def jsonToken: String =
    strVal.map(s => "\"" + TagValue.escape(s) + "\"")
      .orElse(u64Val.map(java.lang.Long.toUnsignedString))
      .orElse(i64Val.map(_.toString))
      .orElse(boolVal.map(_.toString))
      .getOrElse("null")

  /** Jaeger tag type (duo/src/web/serialize.rs:46-60): bools are
    * "bool", numbers "int64", everything else "string".
    */
  def jaegerType: String =
    if (boolVal.isDefined) "bool"
    else if (u64Val.isDefined || i64Val.isDefined) "int64"
    else "string"

  /** Plain-text rendering (no quoting). */
  def render: String =
    strVal
      .orElse(u64Val.map(java.lang.Long.toUnsignedString))
      .orElse(i64Val.map(_.toString))
      .orElse(boolVal.map(_.toString))
      .getOrElse("")
}

object TagValue {
  def str(v: String): TagValue = TagValue(strVal = Some(v))
  def u64(v: Long): TagValue = TagValue(u64Val = Some(v))
  def i64(v: Long): TagValue = TagValue(i64Val = Some(v))
  def bool(v: Boolean): TagValue = TagValue(boolVal = Some(v))

  /** JSON string-body escaping (quote, backslash, control chars). */
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}

/** Process registry entry (duo/src/models.rs:9-15): id is
  * "{serviceName}-{n}"; tags carry the wire's typed values.
  */
case class Process(id: String, serviceName: String, tags: Map[String, TagValue])

object Schemas {
  /** Fixed span schema (duo/src/schema.rs:16-27). */
  val span: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("parent_id", LongType, nullable = true),
    StructField("trace_id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("process_id", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = true),
    StructField("tags", StringType, nullable = true)))

  /** Base (pre-dynamic-merge) log schema (duo/src/schema.rs:30-42). */
  val logBase: StructType = StructType(Seq(
    StructField("process_id", StringType, nullable = false),
    StructField("time", LongType, nullable = false),
    StructField("trace_id", LongType, nullable = true),
    StructField("span_id", LongType, nullable = true),
    StructField("level", StringType, nullable = false),
    StructField("target", StringType, nullable = true),
    StructField("file", StringType, nullable = true),
    StructField("line", IntegerType, nullable = true),
    StructField("message", StringType, nullable = true)))

  /** Log level values in severity order (duo-api/proto/common.proto:5-26).
    * Unknown values degrade to DEBUG (duo-api/src/common.rs:39-60).
    */
  val levels: Seq[String] = Seq("ERROR", "WARN", "INFO", "DEBUG", "TRACE")
  def normalizeLevel(s: String): String =
    levels.find(_.equalsIgnoreCase(s)).getOrElse("DEBUG")
}
