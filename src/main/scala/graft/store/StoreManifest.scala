package graft.store

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** File-listing-free read planning for a [[ParquetStore]]'s
  * partitioned tree — the Iceberg/Delta manifest idea at this store's
  * scale: after a compaction (the operation that OWNS the cold
  * layout), the complete data-file list is written to one
  * `_manifest/gen-*` file, and reads plan from that single file
  * instead of walking the tree. On an object store a recursive
  * listing of a minute-grained tree is thousands of LIST calls
  * (rate-limited, latency-bound); the manifest makes read planning
  * one GET. (Reference storage layer: duo/src/partition/query.rs
  * lists per prefix; its FIXME'd cost at scale is what this removes.)
  *
  * Consistency contract (single-writer, like the store itself):
  * every mutation of the partitioned tree calls [[invalidate]] BEFORE
  * touching data and the layout-owning operations ([[ParquetStore
  * .compact]]/`compactDate`/`expire`) [[rebuild]] afterwards — so a
  * crash at ANY point leaves either no manifest (readers fall back to
  * listing: correct, just slower) or a manifest matching the tree.
  * Direct minute-grained [[ParquetStore.write]]s only invalidate (a
  * full-walk rebuild per flush would defeat the append's cheapness);
  * the LSM-shaped ingest ([[ParquetStore.writeStaged]]) never touches
  * the partitioned tree at all, so the manifest stays valid through
  * any amount of staged landing — manifest-present is the natural
  * state of a compaction-owned store.
  *
  * The underscore prefix hides `_manifest` from Spark's partition
  * discovery, like `_staging`.
  */
final class StoreManifest(fs: FileSystem, tableDir: String) {

  import StoreManifest.{Entry, Snapshot}

  private def mdir = new Path(tableDir, "_manifest")

  /** Drop every manifest generation (idempotent). Called BEFORE any
    * partitioned-tree mutation, so a reader never plans from a list
    * describing the pre-mutation tree.
    */
  def invalidate(): Unit = { fs.delete(mdir, true): Unit }

  /** Walk the whole partitioned tree (skipping `_`/`.`-prefixed
    * subtrees: staging, markers, the manifest itself) and write the
    * complete file list as a new generation. The walk costs one
    * recursive listing — the same order as the full-compaction promote
    * that just ran, amortized onto the write path so readers never pay
    * it. Mutations scoped to one subtree use [[rebuildScoped]] /
    * [[republish]] instead of paying this full walk.
    */
  def rebuild(schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Unit = publish(walkEntries(new Path(tableDir)), schema)

  /** Incremental rebuild after a mutation scoped to ONE partition
    * subtree (per-date compaction): `prior` entries outside
    * `refreshPrefix` are kept verbatim — no walk — and only the
    * refreshed subtree is re-walked. On a store with years of dates a
    * per-date drain would otherwise pay a full-tree walk per swap,
    * exactly the listing bill the manifest exists to retire. `prior`
    * MUST be read before the mutation's [[invalidate]] (single-writer,
    * so it still describes every untouched subtree).
    */
  def rebuildScoped(prior: Snapshot, refreshPrefix: String): Unit = {
    val kept = prior.entries.filterNot(_.rel.startsWith(refreshPrefix + "/"))
    // a per-date rewrite reads its subtree with mergeSchema and writes
    // files carrying the full unified column set, so the prior merged
    // schema stays exactly right
    publish(kept ++ walkEntries(new Path(tableDir, refreshPrefix)),
      prior.schema)
  }

  /** Publish an already-known entry list (expiry: the survivor set is
    * prior-minus-dropped-prefixes — zero walking). No schema: dropping
    * a date dir can retire the only files carrying a drifted column,
    * and a stale schema would resurrect it as all-null — readers infer
    * from footers until the next compact re-publishes.
    */
  def republish(entries: Seq[Entry]): Unit = publish(entries, None)

  /** Walk the live tree into entries NOW, without publishing — the
    * listing fallback for metadata consumers ([[ParquetStore
    * .planCompactions]]) when no manifest generation exists.
    */
  private[store] def walkNow(): Seq[Entry] =
    walkEntries(new Path(tableDir))

  private def walkEntries(start: Path): Seq[Entry] = {
    val files = scala.collection.mutable.ArrayBuffer.empty[Entry]
    val rootUri = new Path(tableDir).toUri.getPath
    def walk(p: Path): Unit = StoreFs.list(fs, p).foreach { st =>
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        if (st.isDirectory) walk(st.getPath)
        else if (name.endsWith(".parquet")) {
          val full = st.getPath.toUri.getPath
          val rel = full.stripPrefix(rootUri).stripPrefix("/")
          files += Entry(rel, st.getLen, st.getModificationTime)
        }
      }
    }
    if (fs.exists(start)) walk(start)
    files.toSeq
  }

  private def publish(entries: Seq[Entry],
      schema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    // rel first so sorted lines sort by path; size + mtime ride along
    // so reads can hand Spark complete FileStatuses and plan with ZERO
    // filesystem calls (see [[ManifestFileIndex]]). The merged data
    // schema (when the publisher knows it — compact just wrote every
    // file from one DataFrame) rides as a single JSON line, so reads
    // skip per-file footer inference entirely: plan cost becomes ONE
    // GET total, invariant in file count.
    val lines = entries.map(e => s"${e.rel}\t${e.size}\t${e.mtime}")
    val schemaLine = schema.toSeq.map(s =>
      s"schema\t${StoreManifest.allNullable(s).json}")
    val body = (s"count=${lines.size}" +: (schemaLine ++ lines.sorted))
      .mkString("", "\n", "\n")
    fs.mkdirs(mdir): Unit
    val uuid = java.util.UUID.randomUUID().toString
    val tmp = new Path(mdir, s".tmp-$uuid")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val gen = new Path(mdir,
      f"gen-${System.currentTimeMillis()}%019d-$uuid.list")
    if (!fs.rename(tmp, gen))
      throw new java.io.IOException(s"manifest publish failed: $gen")
    // keep only the newest generation (best effort; readers take the
    // lexicographic max, so a failed delete costs bytes, not truth)
    StoreFs.list(fs, mdir)
      .filter(s => s.getPath.getName.startsWith("gen-") &&
        s.getPath.getName < gen.getName)
      .foreach(s => fs.delete(s.getPath, false): Unit)
  }

  /** The newest generation's snapshot (entries + the publisher's
    * merged data schema when recorded), or None when no (readable,
    * self-consistent) manifest exists — the caller then falls back to
    * listing. A torn write can't be mis-read: the temp-name write +
    * rename publishes whole files only, and the self-count plus
    * per-line field checks reject a truncated or malformed body.
    */
  def read(): Option[Snapshot] = {
    if (!fs.exists(mdir)) return None
    val gens = StoreFs.list(fs, mdir)
      .filter(_.getPath.getName.startsWith("gen-"))
    if (gens.isEmpty) return None
    val latest = gens.maxBy(_.getPath.getName).getPath
    try {
      val in = fs.open(latest)
      val body =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](64 * 1024)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toString(StandardCharsets.UTF_8)
        } finally in.close()
      val lines = body.split("\n", -1).toSeq.dropRight(1)
      lines.headOption.flatMap { h =>
        val schemaJson = lines.drop(1).headOption
          .filter(_.startsWith("schema\t")).map(_.stripPrefix("schema\t"))
        val entryLines = if (schemaJson.isDefined) lines.drop(2)
          else lines.drop(1)
        if (!h.startsWith("count=") ||
            !h.stripPrefix("count=").toIntOption.contains(entryLines.size))
          None
        else {
          val schema = schemaJson.map(j =>
            org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[org.apache.spark.sql.types.StructType])
          val entries = entryLines.map { l =>
            l.split("\t") match {
              case Array(rel, size, mtime) =>
                (size.toLongOption, mtime.toLongOption) match {
                  case (Some(s), Some(m)) => Some(Entry(rel, s, m))
                  case _ => None
                }
              case _ => None
            }
          }
          if (entries.forall(_.isDefined))
            Some(Snapshot(entries.flatten, schema))
          else None
        }
      }
    } catch {
      // any unreadable/corrupt generation (I/O, torn body, malformed
      // schema JSON — json4s throws its own parse exceptions) poisons
      // the WHOLE generation: fall back to listing rather than plan
      // from half a snapshot
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Whether a manifest generation is present (for specs/gates). */
  def present: Boolean = read().isDefined
}

object StoreManifest {
  /** One data file: path relative to the table dir, plus the size and
    * mtime a read plan needs to construct the `FileStatus` without
    * touching the filesystem.
    */
  final case class Entry(rel: String, size: Long, mtime: Long)

  /** One manifest generation: the complete file list, plus the merged
    * data schema when the publishing operation knew it.
    */
  final case class Snapshot(entries: Seq[Entry],
      schema: Option[org.apache.spark.sql.types.StructType])

  /** StructType.asNullable is private[spark]; same recursive relax —
    * a stored schema must read exactly as spark.read's inference
    * (all-nullable) or plan-level nullability would differ between the
    * manifest and listing paths.
    */
  private[store] def allNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = allNullable(f.dataType), nullable = true)))
      case at: ArrayType => at.copy(
        elementType = allNullable(at.elementType), containsNull = true)
      case mt: MapType => mt.copy(keyType = allNullable(mt.keyType),
        valueType = allNullable(mt.valueType), valueContainsNull = true)
      case other => other
    }
  }

  private[store] def allNullable(st: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    allNullable(st: org.apache.spark.sql.types.DataType)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
}
