package graft.store

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** File-listing-free read planning for a [[ParquetStore]]'s
  * partitioned trees — the Iceberg/Delta manifest idea at this store's
  * scale: the complete data-file list is written to one
  * `_manifest/gen-*` file per layout mutation, and reads plan from
  * that single file instead of walking the tree. On an object store a
  * recursive listing of a minute-grained tree is thousands of LIST
  * calls (rate-limited, latency-bound); the manifest makes read
  * planning one GET. (Reference storage layer: duo/src/partition/
  * query.rs lists per prefix; its FIXME'd cost at scale is what this
  * removes.)
  *
  * Snapshot-isolation contract (round-16): the manifest generation IS
  * the commit point for every layout mutation. Rewrites land in
  * immutable `_gen-*` trees and become visible only when a new
  * generation referencing them publishes (single temp-write + rename);
  * files a mutation supersedes are never deleted inline — they are
  * recorded as `dead` lines IN the new generation (tombstones,
  * atomically visible with the entries that replace them) and
  * reclaimed later by [[ParquetStore.vacuum]] once a grace window has
  * passed. A reader that planned from generation G therefore holds
  * `FileStatus`es for files that remain on disk until G's successors
  * are at least the grace window old — a query can overlap a
  * compaction in another session (the Iceberg/Delta discipline).
  * [[publish]] retains the newest [[StoreManifest.KeepGens]]
  * generations (corruption insurance: [[read]] falls back
  * newest→oldest to the first self-consistent one); vacuum prunes
  * retained generations past the grace window.
  *
  * Direct minute-grained [[ParquetStore.write]]s do not republish (a
  * full-walk rebuild per flush would defeat the append's cheapness);
  * they drop a `dirty-*` marker instead, telling readers the legacy
  * tree holds files beyond the manifest — reads then union a legacy
  * walk in (minus tombstones) until the next compaction folds the
  * extras and clears the markers. The LSM-shaped ingest
  * ([[ParquetStore.writeStaged]]) never touches the manifest at all.
  *
  * The underscore prefix hides `_manifest` from Spark's partition
  * discovery, like `_staging`.
  */
final class StoreManifest(fs: FileSystem, tableDir: String) {

  import StoreManifest.{Dead, Entry, Snapshot}

  /** Test seam (specs only): runs after [[publish]]'s expected-parent
    * pre-check passes, immediately before its rename — the only way a
    * spec can interleave a second publisher INSIDE the pre-check→
    * rename window and prove the post-rename conflict detection makes
    * that race loud instead of a silent lost update.
    */
  private[graft] var beforeRename: () => Unit = () => ()

  private def mdir = new Path(tableDir, "_manifest")

  /** Whether any generation file exists (one listing; cheaper than a
    * full [[read]] when only presence matters, e.g. the write path's
    * dirty-marker decision).
    */
  def anyGenExists: Boolean =
    StoreFs.list(fs, mdir).exists(_.getPath.getName.startsWith("gen-"))

  /** Record that the legacy tree has been appended to since the last
    * publish: readers must union a legacy walk in until a compaction
    * folds the extras. One marker is enough — skip the create when one
    * is already present (same listing answers both questions).
    */
  def markDirty(): Unit = {
    val names = StoreFs.list(fs, mdir).map(_.getPath.getName)
    if (names.exists(_.startsWith("gen-")) &&
        !names.exists(_.startsWith("dirty-"))) {
      fs.createNewFile(new Path(mdir,
        s"dirty-${System.currentTimeMillis()}-" +
          java.util.UUID.randomUUID().toString)): Unit
    }
  }

  /** The dirty-marker file names currently present. */
  def dirtyMarkers(): Seq[String] =
    StoreFs.list(fs, mdir).map(_.getPath.getName)
      .filter(_.startsWith("dirty-"))

  /** Remove exactly the given markers (a compaction clears the ones it
    * OBSERVED before folding; markers dropped later must survive).
    */
  def clearDirty(names: Seq[String]): Unit =
    names.foreach(n => fs.delete(new Path(mdir, n), false): Unit)

  /** Walk the legacy partitioned tree (skipping `_`/`.`-prefixed
    * subtrees: staging, gen trees, markers, the manifest itself) into
    * entries NOW, without publishing — the dirty-mode union source and
    * the fallback for metadata consumers when no generation exists.
    */
  def walkLegacy(): Seq[Entry] = walkEntries(new Path(tableDir))

  /** Walk one subtree (a just-written `_gen-*` dir) into entries whose
    * rels are relative to the TABLE dir (so they carry the gen
    * prefix). Bounded by the files the rewrite just wrote.
    */
  def walkSubtree(sub: String): Seq[Entry] =
    walkEntries(new Path(tableDir, sub))

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

  /** Publish a new generation: the complete live-file list, the merged
    * data schema when the publisher knows it, and the cumulative
    * tombstone list (files superseded but not yet vacuumed). The
    * temp-write + single-file rename makes the publish the atomic
    * commit point; the self-count plus per-line field checks reject a
    * torn body on read. Prior generations are retained (newest
    * [[StoreManifest.KeepGens]]) so a corrupt latest degrades to the
    * previous consistent snapshot instead of a tree walk.
    */
  def publish(entries: Seq[Entry],
      schema: Option[org.apache.spark.sql.types.StructType],
      dead: Seq[Dead], parent: Option[String]): Unit = {
    // rel first so sorted lines sort by path; size + mtime ride along
    // so reads can hand Spark complete FileStatuses and plan with ZERO
    // filesystem calls (see [[ManifestFileIndex]]). The merged data
    // schema (when the publisher knows it — compact just wrote every
    // file from one DataFrame) rides as a single JSON line, so reads
    // skip per-file footer inference entirely: plan cost becomes ONE
    // GET total, invariant in file count.
    val lines = entries.map(e => s"${e.rel}\t${e.size}\t${e.mtime}")
    val parentLine = parent.toSeq.map(p => s"parent\t$p")
    val schemaLine = schema.toSeq.map(s =>
      s"schema\t${StoreManifest.allNullable(s).json}")
    val deadLines = dead.map(d => s"dead\t${d.rel}\t${d.millis}")
    val body = (s"count=${lines.size}" +:
      (parentLine ++ schemaLine ++ deadLines.sorted ++ lines.sorted))
      .mkString("", "\n", "\n")
    fs.mkdirs(mdir): Unit
    val uuid = java.util.UUID.randomUUID().toString
    val tmp = new Path(mdir, s".tmp-$uuid")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // expected-parent CAS, re-checked as late as the filesystem
    // allows (immediately before the rename atom): `parent` is the
    // newest generation the publishing mutation PLANNED from (None =
    // planned from a store with no manifest). If any other generation
    // is newest now, another writer committed since that planning
    // snapshot — landing this publish would make a stale file list
    // the newest truth, silently dropping the other writer's rows —
    // so the publish is rejected whole. A plain filesystem offers no
    // true compare-and-swap on rename, so a conflicting rename inside
    // the check→rename window is still conceivable; the window is
    // microseconds against mutations that run for minutes, and the
    // writer-lease re-verification every mutation performs just
    // before calling publish ([[ParquetStore]] `fence()`) closes the
    // practical remainder: both landing writers cannot each hold the
    // max lease.
    val newestNow = StoreFs.list(fs, mdir).map(_.getPath.getName)
      .filter(_.startsWith("gen-")).maxOption
    if (newestNow != parent) {
      fs.delete(tmp, false): Unit
      throw new StoreManifest.ConcurrentCommitException(
        s"$tableDir: publish expected parent generation " +
          s"${parent.getOrElse("(none)")} but newest is " +
          s"${newestNow.getOrElse("(none)")} — another writer " +
          "committed since this mutation's planning snapshot")
    }
    beforeRename()
    val gen = new Path(mdir,
      f"gen-${System.currentTimeMillis()}%019d-$uuid.list")
    if (!fs.rename(tmp, gen))
      throw new java.io.IOException(s"manifest publish failed: $gen")
    // post-rename conflict detection closes the pre-check→rename race:
    // two publishers that BOTH passed the pre-check before either
    // renamed have both landed a generation over the same parent — the
    // filesystem gave each a distinct file, so neither rename failed,
    // and whichever sorts last would silently supersede the other's
    // entries and tombstones. Re-list now: if ANY other generation
    // newer than the parent exists, THIS publish rolls its own
    // generation back and fails loudly — regardless of which name
    // sorts higher, because the other publisher may already have
    // returned success and its commit must stay the truth. Outcomes:
    // sequential-but-racing publishers → exactly one winner (the first
    // post-checker sees only itself); truly simultaneous ones → both
    // roll back and throw (spurious CAS failure — callers re-plan and
    // retry), never a silent lost update. Residuals (documented, not
    // closable on a plain filesystem — rename is the only atom):
    // inside the loser's rename→rollback window (microseconds), a
    // READER that lists then may briefly adopt the rolled-back
    // generation as truth (its files exist on disk, so the query
    // executes; it observed a commit that never became durable), and
    // a THIRD publisher that plans from it would chain onto a lineage
    // omitting the race winner's commit. The writer lease
    // ([[ParquetStore]] fencing, re-verified at every commit point)
    // is the actual mutual exclusion that makes racing publishers
    // impossible; this CAS + rollback is its belt-and-braces for the
    // misconfigured-second-writer case it exists to catch, and its
    // anomalies are strictly narrower than the silent lost update it
    // replaces.
    val conflicting = StoreFs.list(fs, mdir).map(_.getPath.getName)
      .filter(n => n.startsWith("gen-") && n != gen.getName &&
        parent.forall(_ < n))
    if (conflicting.nonEmpty) {
      fs.delete(gen, false): Unit
      throw new StoreManifest.ConcurrentCommitException(
        s"$tableDir: publish of ${gen.getName} lost a race over parent " +
          s"${parent.getOrElse("(none)")} to ${conflicting.sorted.last} " +
          "— rolled back; re-plan from the new newest generation")
    }
    // retain the newest KeepGens generations (best effort; readers
    // take the newest READABLE, so a failed delete costs bytes, not
    // truth). Age-based pruning beyond this is vacuum's job.
    val gens = StoreFs.list(fs, mdir)
      .filter(_.getPath.getName.startsWith("gen-"))
      .sortBy(_.getPath.getName)
    gens.dropRight(StoreManifest.KeepGens)
      .foreach(s => fs.delete(s.getPath, false): Unit)
  }

  /** Generation file names, oldest → newest (vacuum's pruning input). */
  def genNames(): Seq[String] =
    StoreFs.list(fs, mdir).map(_.getPath.getName)
      .filter(_.startsWith("gen-")).sorted

  /** Drop one generation file by name (vacuum). */
  def deleteGen(name: String): Unit =
    fs.delete(new Path(mdir, name), false): Unit

  /** One SPECIFIC retained generation's snapshot (time travel: its
    * data files live until vacuum's grace passes). None when the name
    * is gone or the body fails the self-checks.
    */
  def readGen(name: String): Option[Snapshot] =
    if (!name.startsWith("gen-")) None
    else parseGen(new Path(mdir, name))

  /** The newest READABLE generation's snapshot, or None when no
    * self-consistent generation exists — the caller then treats the
    * store as never-compacted (legacy listing mode). A torn write
    * can't be mis-read: the temp-name write + rename publishes whole
    * files only, and the self-count plus per-line field checks reject
    * a truncated or malformed body — which then falls back to the
    * PREVIOUS retained generation (a stale-but-consistent snapshot)
    * rather than to half a snapshot.
    */
  def read(): Option[Snapshot] = readState()._1

  /** [[read]] plus the current dirty markers, resolved from ONE
    * `_manifest` listing — the planning state every read and mutation
    * starts from (two separate calls would double the metadata LIST
    * bill on the hot path).
    */
  def readState(): (Option[Snapshot], Seq[String]) = {
    val names = StoreFs.list(fs, mdir)
    val dirty = names.map(_.getPath.getName).filter(_.startsWith("dirty-"))
    val gens = names
      .filter(_.getPath.getName.startsWith("gen-"))
      .sortBy(_.getPath.getName)(Ordering[String].reverse)
    (gens.iterator.flatMap(g => parseGen(g.getPath)).nextOption(), dirty)
  }

  /** Every retained readable generation, newest first (vacuum's
    * reference set: a tree referenced by ANY retained generation is
    * not an orphan).
    */
  def readAll(): Seq[Snapshot] = {
    if (!fs.exists(mdir)) return Seq.empty
    StoreFs.list(fs, mdir)
      .filter(_.getPath.getName.startsWith("gen-"))
      .sortBy(_.getPath.getName)(Ordering[String].reverse)
      .flatMap(g => parseGen(g.getPath))
  }

  private def parseGen(latest: Path): Option[Snapshot] = {
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
        val parentName = lines.drop(1).headOption
          .filter(_.startsWith("parent\t")).map(_.stripPrefix("parent\t"))
        val afterParent = if (parentName.isDefined) lines.drop(2)
          else lines.drop(1)
        val schemaJson = afterParent.headOption
          .filter(_.startsWith("schema\t")).map(_.stripPrefix("schema\t"))
        val afterSchema = if (schemaJson.isDefined) afterParent.drop(1)
          else afterParent
        val (deadLines, entryLines) =
          afterSchema.span(_.startsWith("dead\t"))
        if (!h.startsWith("count=") ||
            !h.stripPrefix("count=").toIntOption.contains(entryLines.size))
          None
        else {
          val schema = schemaJson.map(j =>
            org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[org.apache.spark.sql.types.StructType])
          val dead = deadLines.map { l =>
            l.stripPrefix("dead\t").split("\t") match {
              case Array(rel, millis) =>
                millis.toLongOption.map(Dead(rel, _))
              case _ => None
            }
          }
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
          if (entries.forall(_.isDefined) && dead.forall(_.isDefined))
            Some(Snapshot(latest.getName, parentName, entries.flatten,
              schema, dead.flatten))
          else None
        }
      }
    } catch {
      // any unreadable/corrupt generation (I/O, torn body, malformed
      // schema JSON — json4s throws its own parse exceptions) poisons
      // that GENERATION: the caller falls back to the next-older one
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Whether a readable manifest generation is present (specs/gates). */
  def present: Boolean = read().isDefined
}

object StoreManifest {
  /** Generations retained by [[StoreManifest.publish]]: newest is the
    * truth, older ones are corruption insurance and the snapshot-
    * isolation window's metadata (their data files live until vacuum's
    * grace passes).
    */
  val KeepGens: Int = 3

  /** One data file: path relative to the table dir (a leading
    * `_gen-…` segment names the rewrite tree it lives in), plus the
    * size and mtime a read plan needs to construct the `FileStatus`
    * without touching the filesystem.
    */
  final case class Entry(rel: String, size: Long, mtime: Long)

  /** One tombstone: a superseded file (still on disk) and the wall
    * clock of the mutation that killed it — vacuum deletes it once
    * `millis + grace` has passed.
    */
  final case class Dead(rel: String, millis: Long)

  /** One manifest generation: its own file name, the parent
    * generation it committed over (None = first ever, or written
    * before the parent line existed), the complete live-file list,
    * the merged data schema when the publishing operation knew it,
    * and the cumulative not-yet-vacuumed tombstones. The recorded
    * parent makes each generation's lineage auditable and is what
    * the expected-parent CAS in [[StoreManifest.publish]] verifies.
    */
  final case class Snapshot(gen: String, parent: Option[String],
      entries: Seq[Entry],
      schema: Option[org.apache.spark.sql.types.StructType],
      dead: Seq[Dead]) {
    def deadRels: Set[String] = dead.map(_.rel).toSet
  }

  /** A publish's expected-parent check failed: another writer
    * committed a generation after the mutation's planning snapshot.
    * Landing the publish anyway would make a stale file list the
    * newest truth (dropping the other writer's committed rows), so
    * the mutation fails whole — re-plan from the new newest
    * generation and retry.
    */
  final class ConcurrentCommitException(msg: String)
    extends IllegalStateException(msg)

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
