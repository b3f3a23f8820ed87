package graft.store

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.mutable

import graft.model.Process

/** Process registry (duo/src/memory.rs:60-80,141-148): tiny JSON file of
  * registered processes, grouped by service name; registration assigns
  * "{service}-{n}" with n = current count for that service
  * (duo/src/memory.rs:112). Driver-side plain-file IO — this is metadata,
  * not data (SURVEY §1.5).
  */
final class ProcessRegistry(path: String) {

  private val procs = mutable.LinkedHashMap.empty[String, Process]
  load()

  /** Register a new process for `service`, persist, return its id. */
  def register(service: String, tags: Map[String, String]): String =
    this.synchronized {
      val n = procs.valuesIterator.count(_.serviceName == service)
      val id = s"$service-$n"
      procs(id) = Process(id, service, tags)
      persist()
      id
    }

  def all: Seq[Process] = this.synchronized(procs.values.toSeq)

  def byService(service: String): Seq[Process] =
    this.synchronized(procs.values.filter(_.serviceName == service).toSeq)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def persist(): Unit = {
    val json = procs.values.map { p =>
      val tags = p.tags.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
        .mkString("{", ",", "}")
      s"""{"id":"${esc(p.id)}","serviceName":"${esc(p.serviceName)}","tags":$tags}"""
    }.mkString("[", ",", "]")
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, json,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Minimal parser for the registry's own output format. */
  private def load(): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val s = Files.readString(p)
      val entry = """\{"id":"((?:[^"\\]|\\.)*)","serviceName":"((?:[^"\\]|\\.)*)","tags":\{((?:[^{}])*)\}\}""".r
      val kv = """"((?:[^"\\]|\\.)*)":"((?:[^"\\]|\\.)*)"""".r
      entry.findAllMatchIn(s).foreach { m =>
        val tags = kv.findAllMatchIn(m.group(3))
          .map(t => unesc(t.group(1)) -> unesc(t.group(2))).toMap
        val id = unesc(m.group(1))
        procs(id) = Process(id, unesc(m.group(2)), tags)
      }
    }
  }

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
}
