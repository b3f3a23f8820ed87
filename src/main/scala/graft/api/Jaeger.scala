package graft.api

import graft.model.{Process, Span}

/** Jaeger-JSON shaping (reference: duo/src/web/serialize.rs:27-195) —
  * pure edge serialization over collected rows; no Spark involvement
  * (the reference likewise materializes before serializing, SURVEY §1.5).
  */
object Jaeger {

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

  /** u64 ids render as unsigned decimal strings
    * (duo/src/web/serialize.rs:79,90; ids are bit-cast longs, SURVEY §1.5).
    */
  def renderId(id: Long): String = java.lang.Long.toUnsignedString(id)

  /** Spans' JSON tag maps are decoded into Jaeger typed tag objects;
    * values here are already strings (C4/C7).
    */
  private def tagKVs(tagsJson: Option[String]): Seq[KeyValue] =
    tagsJson.toSeq.flatMap { j =>
      """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        .findAllMatchIn(j)
        .map(m => KeyValue(m.group(1), "string", m.group(2)))
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
          p.tags.toSeq.sortBy(_._1).map { case (k, v) => KeyValue(k, "string", v) }))
        .toMap)
  }
}
