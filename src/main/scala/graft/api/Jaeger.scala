package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.{Log, Process, Span, TagValue}

/** Jaeger-JSON shaping (reference: duo/src/web/serialize.rs:27-195) —
  * pure edge serialization over collected rows; no Spark involvement
  * (the reference likewise materializes before serializing, SURVEY §1.5).
  *
  * Tag values are TYPED end to end: the span's JSON tags column carries
  * real JSON values (string/number/bool), decoded here with a real JSON
  * parser (json4s, on the Spark classpath) and re-emitted with the
  * reference's type labels — `bool` for booleans, `int64` for numbers,
  * `string` otherwise (duo/src/web/serialize.rs:46-60).
  */
object Jaeger {

  /** One Jaeger tag. `value` keeps the raw text; `type` drives the
    * typed rendering in [[renderTrace]] (bool/int64 emit bare JSON
    * values, string emits quoted).
    */
  case class KeyValue(key: String, `type`: String, value: String)
  case class Reference(refType: String, traceID: String, spanID: String)
  case class JaegerSpan(
      traceID: String,
      spanID: String,
      operationName: String,
      references: Seq[Reference],
      startTime: Long,
      duration: Long,
      tags: Seq[KeyValue],
      processID: String,
      warnings: Seq[String])
  case class JaegerProcess(serviceName: String, tags: Seq[KeyValue])
  case class JaegerTrace(
      traceID: String,
      spans: Seq[JaegerSpan],
      processes: Map[String, JaegerProcess])

  /** Jaeger log row (duo/src/web/serialize.rs:155-179): µs timestamp +
    * typed fields.
    */
  case class JaegerLog(timestamp: Long, fields: Seq[KeyValue])

  /** u64 ids render as unsigned decimal strings
    * (duo/src/web/serialize.rs:79,90; ids are bit-cast longs, SURVEY §1.5).
    */
  def renderId(id: Long): String = java.lang.Long.toUnsignedString(id)

  /** JSON value → Jaeger typed tag (duo/src/web/serialize.rs:46-60:
    * Bool→"bool", Number→"int64", String→"string"; anything else is
    * re-serialized as its compact JSON text).
    */
  private def toKV(key: String, v: JValue): KeyValue = v match {
    case JBool(b) => KeyValue(key, "bool", b.toString)
    case JInt(n) => KeyValue(key, "int64", n.toString)
    case JLong(n) => KeyValue(key, "int64", n.toString)
    case JDouble(d) => KeyValue(key, "int64", d.toString)
    case JDecimal(d) => KeyValue(key, "int64", d.toString)
    case JString(s) => KeyValue(key, "string", s)
    case other => KeyValue(key, "string", JsonMethods.compact(JsonMethods.render(other)))
  }

  /** Decode a span's JSON tag map into typed Jaeger tags. */
  private def tagKVs(tagsJson: Option[String]): Seq[KeyValue] =
    tagsJson.toSeq.flatMap { j =>
      JsonMethods.parseOpt(j).toSeq.flatMap {
        case JObject(fields) => fields.map { case (k, v) => toKV(k, v) }
        case _ => Nil
      }
    }

  /** One span → Jaeger span. Non-intact spans (no `end`) get the
    * reference's `name*` marker + still-running duration 0
    * (duo/src/web/serialize.rs:91-96).
    */
  def toJaegerSpan(s: Span): JaegerSpan = {
    val intact = s.end.isDefined
    JaegerSpan(
      traceID = renderId(s.trace_id),
      spanID = renderId(s.id),
      operationName = if (intact) s.name else s.name + "*",
      references = s.parent_id.toSeq.map(p =>
        Reference("CHILD_OF", renderId(s.trace_id), renderId(p))),
      startTime = s.start,
      duration = s.end.map(_ - s.start).getOrElse(0L),
      tags = tagKVs(s.tags),
      processID = s.process_id,
      warnings = Nil)
  }

  def toJaegerTrace(traceId: Long, spans: Seq[Span],
      processes: Seq[Process]): JaegerTrace = {
    val used = spans.map(_.process_id).toSet
    JaegerTrace(
      traceID = renderId(traceId),
      spans = spans.sortBy(_.start).map(toJaegerSpan),
      processes = processes.filter(p => used.contains(p.id))
        .map(p => p.id -> JaegerProcess(p.serviceName,
          p.tags.toSeq.sortBy(_._1)
            .map { case (k, v) => KeyValue(k, v.jaegerType, v.render) }))
        .toMap)
  }

  /** One log row → Jaeger log (duo/src/web/serialize.rs:155-179): base
    * fields message/level/target, `file` rendered as "file:line" (line
    * defaulting to 0 like the reference's unwrap_or_default), then any
    * dynamic fields with their types. The reference iterates a HashMap
    * (nondeterministic order); here insertion order — a documented,
    * deterministic divergence.
    */
  def toJaegerLog(l: Log, dynamic: Seq[(String, TagValue)] = Nil): JaegerLog = {
    val base = Seq(
      "message" -> TagValue.str(l.message.getOrElse("")),
      "level" -> TagValue.str(l.level),
      "target" -> TagValue.str(l.target.getOrElse(""))) ++
      l.file.map(f => "file" -> TagValue.str(s"$f:${l.line.getOrElse(0)}"))
    JaegerLog(l.time,
      (base ++ dynamic).map { case (k, v) => KeyValue(k, v.jaegerType, v.render) })
  }

  // ---- JSON rendering (S8): the serialized wire form, with typed tag
  // values — `"value": true` / `"value": 42` / `"value": "s"`, exactly
  // the shape the reference's Serialize impls emit. ----

  private def kvJson(kv: KeyValue): JValue = {
    val v: JValue = kv.`type` match {
      case "bool" => JBool(kv.value.toBoolean)
      case "int64" =>
        // numbers round-trip through BigDecimal so integer and float
        // forms both survive (the reference's Number covers both)
        scala.util.Try(JInt(BigInt(kv.value)))
          .getOrElse(JDecimal(BigDecimal(kv.value)))
      case _ => JString(kv.value)
    }
    JObject("key" -> JString(kv.key), "type" -> JString(kv.`type`), "value" -> v)
  }

  private def spanJson(s: JaegerSpan): JValue = JObject(
    "traceID" -> JString(s.traceID),
    "spanID" -> JString(s.spanID),
    "operationName" -> JString(s.operationName),
    "references" -> JArray(s.references.toList.map(r => JObject(
      "refType" -> JString(r.refType),
      "traceID" -> JString(r.traceID),
      "spanID" -> JString(r.spanID)))),
    "startTime" -> JLong(s.startTime),
    "duration" -> JLong(s.duration),
    "tags" -> JArray(s.tags.toList.map(kvJson)),
    "processID" -> JString(s.processID),
    "warnings" -> JArray(s.warnings.toList.map(JString(_))))

  private def traceJson(t: JaegerTrace): JValue = JObject(
    "traceID" -> JString(t.traceID),
    "spans" -> JArray(t.spans.toList.map(spanJson)),
    "processes" -> JObject(t.processes.toList.sortBy(_._1).map {
      case (id, p) => id -> JObject(
        "serviceName" -> JString(p.serviceName),
        "tags" -> JArray(p.tags.toList.map(kvJson)))
    }))

  private def logJson(l: JaegerLog): JValue = JObject(
    "timestamp" -> JLong(l.timestamp),
    "fields" -> JArray(l.fields.toList.map(kvJson)))

  /** Serialize an assembled trace to its Jaeger JSON wire form. */
  def renderTrace(t: JaegerTrace): String =
    JsonMethods.compact(JsonMethods.render(traceJson(t)))

  /** The JaegerData response envelope every API route wraps its payload
    * in (duo/src/web/serialize.rs:140-153): constant total/limit/offset
    * zeros and a null errors slot.
    */
  /** Envelope of bare string items — GET /api/services and
    * /api/services/:service/operations both wrap plain name lists in
    * JaegerData (duo/src/web/trace.rs:44-59).
    */
  def renderNames(names: Seq[String]): String =
    envelope(names.toList.map(JString(_)))

  private def envelope(items: List[JValue]): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "data" -> JArray(items),
      "total" -> JInt(0),
      "limit" -> JInt(0),
      "offset" -> JInt(0),
      "errors" -> JNull)))

  def renderTraces(ts: Seq[JaegerTrace]): String =
    envelope(ts.toList.map(traceJson))

  def renderLogs(ls: Seq[JaegerLog]): String =
    envelope(ls.toList.map(logJson))
}
