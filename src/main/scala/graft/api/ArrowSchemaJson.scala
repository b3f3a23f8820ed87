package graft.api

import org.apache.spark.sql.types._

/** StructType → Arrow-schema JSON for the GET /api/logs/schema wire
  * form. The reference serializes its live merged Arrow `Schema` with
  * serde (duo/src/web/logs.rs:38, `Json(schema::get_log_schema())`),
  * so wire parity means emitting what `arrow-schema = "53.0"`'s serde
  * derive emits (duo/duo/Cargo.toml pins that version with the
  * `serde` feature): a `fields` array whose entries carry
  * `name`/`data_type`/`nullable`/`dict_id`/`dict_is_ordered` in
  * declaration order — `dict_id` 0 and `dict_is_ordered` false for
  * every non-dictionary field (`Field::new`'s defaults,
  * arrow-schema 53 still serializes both) — with empty `metadata`
  * maps omitted at both the field and schema level
  * (`skip_serializing_if = "HashMap::is_empty"` on the derives).
  *
  * Type mapping: Spark has no unsigned integers, so the engine stores
  * the reference's UInt64/UInt32 columns as Long/Integer
  * (SURVEY §1.5); the wire schema must still SAY UInt64/UInt32 for
  * those columns or a reference UI reading it would mis-type ids —
  * the base-column override below pins them by name
  * (duo/src/schema.rs:31-42). Dynamic columns carry Spark's JSON
  * inference results (long/double/boolean/string), which map 1:1 to
  * the reference's own inference output types
  * (duo/src/arrow.rs:70-91: Int64/Float64/Boolean/Utf8).
  */
object ArrowSchemaJson {

  /** Reference-pinned arrow types for base columns whose unsigned
    * width Spark cannot represent (duo/src/schema.rs:33-38).
    */
  private val baseOverrides: Map[String, String] = Map(
    "trace_id" -> "UInt64",
    "span_id" -> "UInt64",
    "line" -> "UInt32")

  /** arrow-schema 53 serde token for one Spark type (unit DataType
    * enum variants serialize as bare strings). Loud on a type the log
    * schema can never legally hold — silence would ship a schema the
    * reference deserializer rejects whole.
    */
  private[api] def dataTypeToken(dt: DataType): String = dt match {
    case StringType => "Utf8"
    case LongType => "Int64"
    case IntegerType => "Int32"
    case DoubleType => "Float64"
    case FloatType => "Float32"
    case BooleanType => "Boolean"
    case other => throw new IllegalArgumentException(
      s"no arrow-schema serde mapping for Spark type $other")
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def toJson(schema: StructType): String = {
    val fields = schema.fields.map { f =>
      val tok = baseOverrides.getOrElse(f.name, dataTypeToken(f.dataType))
      s"""{"name":"${esc(f.name)}","data_type":"$tok",""" +
        s""""nullable":${f.nullable},"dict_id":0,"dict_is_ordered":false}"""
    }
    fields.mkString("""{"fields":[""", ",", "]}")
  }
}
