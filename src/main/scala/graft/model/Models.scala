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

/** Process registry entry (duo/src/models.rs:9-15): id is
  * "{serviceName}-{n}".
  */
case class Process(id: String, serviceName: String, tags: Map[String, String])

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
