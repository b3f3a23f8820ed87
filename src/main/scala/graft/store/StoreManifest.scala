package graft.store

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** File-listing-free read planning for a [[ParquetStore]]'s
  * partitioned trees — the Iceberg/Delta manifest idea at this store's
  * scale: reads plan from the `_manifest` directory instead of walking
  * the tree. On an object store a recursive listing of a minute-grained
  * tree is thousands of LIST calls (rate-limited, latency-bound); the
  * manifest makes read planning one LIST plus a handful of cached GETs.
  * (Reference storage layer: duo/src/partition/query.rs lists per
  * prefix; its FIXME'd cost at scale is what this removes.)
  *
  * TWO-LEVEL layout (round 19 — the Iceberg manifest-list shape,
  * replacing round 18's single-body generations): entry lists live in
  * immutable per-partition MANIFEST FILES (`_manifest/mf/mf-*`: one
  * `date=…` partition's entries — the partition key of every rel
  * under it; the subdirectory keeps the `_manifest` listing
  * O(generations) at any partition count), and a generation file
  * references manifests — by name, entry count and exact byte size,
  * so planning GETs them with no listing — instead of carrying
  * entries:
  *
  *  - a CHECKPOINT (`gen-*.list`, header `mlist=N`) lists the live
  *    manifest files — one line per manifest with its partition key
  *    and entry count — plus the absolute schema/tombstone state;
  *  - a DELTA (`gen-*.delta`) patches the manifest SET: `madd`/`mdel`
  *    lines plus tombstone changes and the required parent pointer.
  *
  * Why two levels: with entries inline, every plan folded the FULL
  * entry list (~320 ms of assembly at 10⁶ files) and every checkpoint
  * rollover rewrote an O(table) body (~6 MB gz at 10⁶, ~60 MB at
  * 10⁷). Now [[readStateFor]] assembles only the partitions a query's
  * time window admits — plan wall ∝ admitted partitions, flat as the
  * table grows — and a rollover rewrites manifests only for
  * partitions touched since the last checkpoint (untouched partitions
  * REUSE their manifest file by name, the Iceberg discipline), so
  * rollover bytes ∝ touched partitions. Commit cadence unchanged:
  * an append's delta writes one small manifest holding JUST the new
  * files (manifests per partition accumulate between checkpoints;
  * assembly resolves duplicate rels newest-manifest-wins, and the
  * rollover merges each partition back to one file); a drop rewrites
  * only the affected partitions' manifests. Entries with no `date=…`
  * leading segment (spec fixtures, `_staging` rels in tombstones)
  * group under the catch-all partition key `""`, which every admit
  * function must pass.
  *
  * Format-compat contract: FORWARD-only, like round 18's delta-log
  * bump — a pre-round-19 binary sees `mlist=`/`madd`/`mdel` bodies as
  * unreadable generations and degrades to legacy listing mode; a
  * `protocol` marker file under `_manifest` names the format for
  * operators debugging a mixed-version rollout. THIS binary reads
  * every older on-disk form forever: plain or gzip `count=`
  * checkpoints with inline entries, file-level `add`/`del` deltas,
  * info-less bodies. A chain must be form-homogeneous (file-level
  * patches cannot soundly apply to a manifest set, and vice versa);
  * the fold rejects mixed chains whole, and writers never produce
  * them — a commit atop a legacy-form parent folds it and writes a
  * two-level CHECKPOINT (the upgrade path).
  *
  * Snapshot-isolation contract (round-16, unchanged): the manifest
  * generation IS the commit point for every layout mutation. Rewrites
  * land in immutable `_gen-*` trees and become visible only when a new
  * generation referencing them publishes (single temp-write + rename —
  * the SAME rename atom whichever form the body takes; manifest files
  * are written BEFORE the generation that references them, so a
  * reader can never see a half-written manifest through a committed
  * generation). Files a mutation supersedes are never deleted inline —
  * they are recorded as tombstones IN the new generation and reclaimed
  * later by [[ParquetStore.vacuum]] once a grace window has passed.
  * [[publish]] retains the newest [[StoreManifest.KeepGens]]
  * generations PLUS every older file their delta chains fold through,
  * PLUS every manifest file a retained generation references;
  * unreferenced manifest files are pruned with the generations that
  * referenced them. Torn bodies are rejected whole at every level
  * (self-counts + gzip CRC): a torn generation falls back to the
  * previous retained one, and a torn manifest file poisons exactly
  * the generations that reference it.
  *
  * Direct minute-grained [[ParquetStore.write]]s do not republish;
  * they drop a `dirty-*` marker instead (readers union a legacy walk
  * until the next compaction folds the extras). The LSM-shaped ingest
  * ([[ParquetStore.writeStaged]]) never touches the manifest at all.
  *
  * The underscore prefix hides `_manifest` from Spark's partition
  * discovery, like `_staging`.
  */
final class StoreManifest(fs: FileSystem, tableDir: String) {

  import StoreManifest.{CheckpointEvery, Dead, Entry, KeepGens, MfRef,
    Snapshot, dateKeyOf, partKeyOf, subPartKeyOf}

  /** Hot-date split threshold (see [[StoreManifest.HotSplitDefault]]);
    * instance-level so specs and probes can engage the split on small
    * fixtures without a 10⁵-file build.
    */
  private[graft] var hotSplitFiles: Int = StoreManifest.HotSplitDefault

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

  /** [[walkLegacy]] restricted to the partitions `admit` passes: the
    * walk recurses only into top-level `date=…` dirs the window
    * admits (plus non-partition dirs and root files, keyed `""`), so
    * a windowed read or per-date maintenance tick on a DIRTY store
    * pays listings ∝ admitted partitions, not the whole tree — the
    * same discipline the manifest side's pruned assembly has.
    */
  def walkLegacyFor(admit: String => Boolean): Seq[Entry] = {
    val root = new Path(tableDir)
    if (!fs.exists(root)) return Seq.empty
    StoreFs.list(fs, root).flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Nil
      else if (st.isDirectory) {
        val pk = if (name.startsWith("date=")) name else ""
        if (admit(pk)) walkEntries(st.getPath) else Nil
      } else if (name.endsWith(".parquet") && admit("")) {
        val full = st.getPath.toUri.getPath
        val rel = full.stripPrefix(root.toUri.getPath).stripPrefix("/")
        Seq(Entry(rel, st.getLen, st.getModificationTime))
      } else Nil
    }
  }

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

  // ---- raw generation bodies (parse layer) ----

  /** One parsed generation FILE, before chain folding. A checkpoint
    * carries the absolute state — inline `entries` (pre-round-19
    * bodies) OR `manifests` refs (two-level), with `twoLevel` naming
    * the form so the fold can reject mixed chains; a delta carries one
    * commit's patch plus its required parent pointer, file-level
    * (`adds`/`drops`, legacy) or manifest-level (`mAdds`/`mDels`).
    * Both carry the ABSOLUTE schema state (a publisher that no longer
    * knows the exact schema writes none, and readers must drop to
    * footer inference — expire's drifted-column contract).
    */
  private sealed trait RawGen
  private final case class FullGen(parent: Option[String],
      entries: Seq[Entry], manifests: Seq[MfRef], twoLevel: Boolean,
      schema: Option[org.apache.spark.sql.types.StructType],
      dead: Seq[Dead], info: Option[String]) extends RawGen
  private final case class DeltaGen(parent: String,
      schema: Option[org.apache.spark.sql.types.StructType],
      adds: Seq[Entry], drops: Seq[String],
      mAdds: Seq[MfRef], mDels: Seq[String],
      deadPlus: Seq[Dead], deadMinus: Seq[String],
      info: Option[String]) extends RawGen

  /** Clear-on-cap memo for derived views of IMMUTABLE files (written
    * once via temp+rename, never modified): a value keyed by
    * (name, size[, mtime]) stays valid for the file's lifetime, so a
    * warm planner re-GETs nothing. Bounded two ways: by KEY count (a
    * cadence-committing engine publishes every flush; months of
    * cadences must not pin every generation ever retained) and by
    * cumulative cached WEIGHT — a legacy inline checkpoint of a
    * 10⁶-file table holds ~150 MB of Entry objects, so a count-only
    * cap would admit gigabytes. The weight bound scales with the
    * largest single item (one legitimately-huge parse must stay
    * cacheable without being evicted by its own size); `largest`
    * resets with the cache so a table compacted DOWN a tier
    * re-learns its working size. Only SUCCESSFUL computes are
    * cached: a None can be a transient I/O failure (an object-store
    * throttle), and caching it under an immutable key would make one
    * hiccup permanent until process restart — torn files therefore
    * re-read per plan, which is the right trade (they are rare and
    * small, and self-heal the moment the fault clears).
    */
  private final class CappedMemo[K, V](sizeCap: Int,
      weigh: V => Long) {
    private val m = scala.collection.concurrent.TrieMap.empty[K, V]
    private val entries = new java.util.concurrent.atomic.AtomicLong
    private val largest = new java.util.concurrent.atomic.AtomicLong
    def getOrCompute(key: K)(compute: => Option[V]): Option[V] =
      m.get(key) match {
        case hit @ Some(_) => hit
        case None =>
          val cap = math.max(StoreManifest.MemoEntryCap,
            2L * largest.get)
          if (m.size > sizeCap || entries.get > cap) {
            m.clear(); entries.set(0); largest.set(0)
          }
          val v = compute
          v.foreach { x =>
            val w = weigh(x)
            entries.addAndGet(w): Unit
            largest.getAndAccumulate(w, math.max(_, _)): Unit
            m.put(key, x): Unit
          }
          v
      }
  }

  private val parseMemo =
    new CappedMemo[(String, Long, Long), RawGen](
      StoreManifest.ParseMemoCap, {
        case f: FullGen =>
          f.entries.size.toLong + f.manifests.size.toLong
        case d: DeltaGen => d.adds.size.toLong + d.mAdds.size.toLong
      })

  private def parseRaw(st: FileStatus): Option[RawGen] =
    parseMemo.getOrCompute(
      (st.getPath.getName, st.getLen, st.getModificationTime))(
      parseRawUncached(st.getPath))

  /** Read one small metadata file whole, gzip-sniffed (magic 1f 8b):
    * checkpoints and large manifest files compress ~13× (shared path
    * prefixes); legacy plain bodies and small deltas/manifests stay
    * uncompressed — both forms must read forever. A TRUNCATED gzip
    * body throws (missing CRC trailer), the same whole-file rejection
    * a torn plain self-count gets.
    */
  private def readBody(p: Path): String = {
    val in = fs.open(p)
    val raw = try in.readAllBytes() finally in.close()
    bodyOf(raw)
  }

  /** Decode one metadata body from its raw bytes (the gzip-sniff
    * shared by generation and manifest parses — one place to keep the
    * torn-body/compat semantics).
    */
  private def bodyOf(raw: Array[Byte]): String =
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
        (raw(1) & 0xff) == 0x8b) {
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(raw), 64 * 1024)
      try new String(gz.readAllBytes(), StandardCharsets.UTF_8)
      finally gz.close()
    } else new String(raw, StandardCharsets.UTF_8)

  private def parseRawUncached(p: Path): Option[RawGen] = {
    try {
      val lines = readBody(p).split("\n", -1).toSeq.dropRight(1)
      lines.headOption.flatMap { h =>
        if (h.startsWith("count=")) parseFull(h, lines.drop(1))
        else if (h.startsWith("mlist=")) parseMlist(h, lines.drop(1))
        else if (h.startsWith("delta=")) parseDelta(h, lines.drop(1))
        else None
      }
    } catch {
      // any unreadable/corrupt generation (I/O, torn body, malformed
      // schema JSON — json4s throws its own parse exceptions) poisons
      // that GENERATION: the caller falls back to the next-older one
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Shared optional-header prefix of every body form: optional
    * `parent`, optional `schema`, optional `info`, in that order.
    * Returns (parent, schemaJson, info, remaining lines).
    */
  private def parseHeader(rest: Seq[String])
      : (Option[String], Option[String], Option[String], Seq[String]) = {
    val parentName = rest.headOption
      .filter(_.startsWith("parent\t")).map(_.stripPrefix("parent\t"))
    val afterParent = if (parentName.isDefined) rest.drop(1) else rest
    val schemaJson = afterParent.headOption
      .filter(_.startsWith("schema\t")).map(_.stripPrefix("schema\t"))
    val afterSchema = if (schemaJson.isDefined) afterParent.drop(1)
      else afterParent
    val info = afterSchema.headOption
      .filter(_.startsWith("info\t")).map(_.stripPrefix("info\t"))
    val afterInfo = if (info.isDefined) afterSchema.drop(1)
      else afterSchema
    (parentName, schemaJson, info, afterInfo)
  }

  /** Optional `protocol\t<name>` line after the headers — the Delta
    * protocol-action idea: a generation whose semantics need reader
    * capabilities beyond the base format names them, and a reader
    * that lacks the capability rejects the generation WHOLE (falls
    * back to an older generation or listing mode — stale but correct,
    * never silent wrong reads). Pre-protocol binaries get the same
    * loud degrade for free: their body parsers reject unknown lines
    * (count mismatch / malformed), and the expected-parent CAS makes
    * any mutation they then plan from the stale fallback fail loudly.
    * Emitted ONLY when needed, so stores that never split carry
    * byte-identical bodies.
    */
  private def parseProtocol(rest: Seq[String]): Option[Seq[String]] =
    rest.headOption.filter(_.startsWith("protocol\t")) match {
      case Some(l) =>
        if (StoreManifest.SupportedProtocols(
            l.stripPrefix("protocol\t"))) Some(rest.drop(1))
        else None // unknown capability: do not interpret the body
      case None => Some(rest)
    }

  /** The legacy full-list body: `count=N` (inline entry lines only —
    * they come last, so a torn suffix always breaks the count),
    * optional headers, `dead` lines, entry lines. Read-only since
    * round 19 (writers emit `mlist=` checkpoints), kept forever for
    * pre-round-19 stores.
    */
  private def parseFull(h: String, rest: Seq[String]): Option[RawGen] = {
    val (parentName, schemaJson, info, afterInfo) = parseHeader(rest)
    val (deadLines, entryLines) = afterInfo.span(_.startsWith("dead\t"))
    if (!h.stripPrefix("count=").toIntOption.contains(entryLines.size))
      None
    else {
      val schema = schemaJson.map(parseSchema)
      val dead = deadLines.map(l => parseDead(l.stripPrefix("dead\t")))
      val entries = entryLines.map(parseEntry)
      if (entries.forall(_.isDefined) && dead.forall(_.isDefined))
        Some(FullGen(parentName, entries.flatten, Nil, twoLevel = false,
          schema, dead.flatten, info))
      else None
    }
  }

  /** The two-level checkpoint body: `mlist=N` (manifest-ref lines
    * only — last, so a torn suffix breaks the count), optional
    * headers, `dead` lines, `m` lines.
    */
  private def parseMlist(h: String, rest: Seq[String]): Option[RawGen] = {
    val (parentName, schemaJson, info, afterInfo0) = parseHeader(rest)
    val afterInfo = parseProtocol(afterInfo0).getOrElse(return None)
    val (deadLines, mLines) = afterInfo.span(_.startsWith("dead\t"))
    if (!h.stripPrefix("mlist=").toIntOption.contains(mLines.size))
      None
    else try {
      val schema = schemaJson.map(parseSchema)
      val dead = deadLines.map(l => parseDead(l.stripPrefix("dead\t")))
      val refs = mLines.map(parseMfRef(_, "m\t"))
      if (refs.forall(_.isDefined) && dead.forall(_.isDefined))
        Some(FullGen(parentName, Nil, refs.flatten, twoLevel = true,
          schema, dead.flatten, info))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One commit's patch: `delta=N` counts EVERY following line (any
    * torn suffix breaks it — deltas can be adds-free, so an entry-only
    * count would miss a truncation through the tombstone lines),
    * required `parent`, optional `schema` (ABSOLUTE state), optional
    * `info`, then `del`/`dead-`/`dead+`/`add` (legacy file-level) or
    * `mdel`/`madd` (two-level) lines.
    */
  private def parseDelta(h: String, rest: Seq[String]): Option[RawGen] = {
    if (!h.stripPrefix("delta=").toIntOption.contains(rest.size))
      return None
    val (parentName, schemaJson, info, afterInfo0) = parseHeader(rest)
    val afterInfo = parseProtocol(afterInfo0).getOrElse(return None)
    if (parentName.isEmpty) return None // a delta without a parent is torn
    try {
      val schema = schemaJson.map(parseSchema)
      val drops = scala.collection.mutable.ArrayBuffer.empty[String]
      val deadMinus = scala.collection.mutable.ArrayBuffer.empty[String]
      val deadPlus = scala.collection.mutable.ArrayBuffer.empty[Option[Dead]]
      val adds = scala.collection.mutable.ArrayBuffer.empty[Option[Entry]]
      val mDels = scala.collection.mutable.ArrayBuffer.empty[String]
      val mAdds = scala.collection.mutable.ArrayBuffer.empty[Option[MfRef]]
      var malformed = false
      afterInfo.foreach {
        case l if l.startsWith("del\t") => drops += l.stripPrefix("del\t")
        case l if l.startsWith("dead-\t") =>
          deadMinus += l.stripPrefix("dead-\t")
        case l if l.startsWith("dead+\t") =>
          deadPlus += parseDead(l.stripPrefix("dead+\t"))
        case l if l.startsWith("add\t") =>
          adds += parseEntry(l.stripPrefix("add\t"))
        case l if l.startsWith("mdel\t") =>
          mDels += l.stripPrefix("mdel\t")
        case l if l.startsWith("madd\t") =>
          mAdds += parseMfRef(l, "madd\t")
        case _ => malformed = true
      }
      if (malformed || deadPlus.exists(_.isEmpty) ||
          adds.exists(_.isEmpty) || mAdds.exists(_.isEmpty)) None
      else Some(DeltaGen(parentName.get, schema, adds.toSeq.flatten,
        drops.toSeq, mAdds.toSeq.flatten, mDels.toSeq,
        deadPlus.toSeq.flatten, deadMinus.toSeq, info))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def parseSchema(json: String)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  private def parseDead(l: String): Option[Dead] = l.split("\t") match {
    case Array(rel, millis) => millis.toLongOption.map(Dead(rel, _))
    case _ => None
  }

  private def parseEntry(l: String): Option[Entry] = l.split("\t") match {
    case Array(rel, size, mtime) =>
      (size.toLongOption, mtime.toLongOption) match {
        case (Some(s), Some(m)) => Some(Entry(rel, s, m))
        case _ => None
      }
    case _ => None
  }

  /** `<prefix><name>\t<partKey>\t<n>\t<size>` — partKey may be the
    * empty catch-all, so the split must keep empty fields. The ref
    * carries the manifest file's byte size so planning can GET it by
    * name with no listing or stat (and reject a torn copy by length
    * before parsing).
    */
  private def parseMfRef(l: String, prefix: String): Option[MfRef] =
    l.stripPrefix(prefix).split("\t", -1) match {
      case Array(name, part, n, size) if name.startsWith("mf-") =>
        (n.toLongOption, size.toLongOption) match {
          case (Some(nn), Some(sz)) => Some(MfRef(name, part, nn, sz))
          case _ => None
        }
      case _ => None
    }

  // ---- partition manifest files (mf layer) ----

  /** Manifest files live in their own `_manifest/mf/` SUBDIRECTORY so
    * the `_manifest` listing every plan and commit performs stays
    * O(generations) — with manifests inline, a 10⁴-partition table
    * made every LIST a 10⁴-entry scan and the "flat" windowed plan
    * grew with the table (measured 46→402 ms at 10⁶→10⁷ files).
    * Plans never list this directory at all: refs carry name + size,
    * so admitted manifests are GET-by-name; only checkpoint-commit
    * retention and vacuum list it.
    */
  private def mfdir = new Path(mdir, "mf")

  /** Immutable-file manifest parse memo keyed by (name, size) — the
    * ref IS the key, so a warm window plan re-GETs nothing and a
    * pruned read concatenates cached per-partition parses.
    */
  private val mfMemo =
    new CappedMemo[(String, Long), (String, Seq[Entry])](
      StoreManifest.MfMemoCap, _._2.size.toLong)

  private def parseMf(ref: MfRef): Option[(String, Seq[Entry])] =
    mfMemo.getOrCompute((ref.name, ref.size))(parseMfUncached(ref))

  /** Manifest body: `mf=N` (N counts every following line), one
    * `part` line, then entry lines — self-counted and typed like a
    * generation body. The referencing generation recorded the exact
    * byte size, so a mismatched length rejects before parsing; either
    * tear-check makes a torn manifest read as None and poison exactly
    * the generations referencing it.
    */
  private def parseMfUncached(ref: MfRef): Option[(String, Seq[Entry])] = {
    try {
      val p = new Path(mfdir, ref.name)
      val in = fs.open(p)
      val raw = try in.readAllBytes() finally in.close()
      if (raw.length.toLong != ref.size) return None
      val lines = bodyOf(raw).split("\n", -1).toSeq.dropRight(1)
      val rest = lines.drop(1)
      if (!lines.headOption.exists(h => h.startsWith("mf=") &&
          h.stripPrefix("mf=").toIntOption.contains(rest.size)))
        return None
      val part = rest.headOption.filter(_.startsWith("part\t"))
        .map(_.stripPrefix("part\t")).getOrElse(return None)
      val entries = rest.drop(1).map(parseEntry)
      if (entries.forall(_.isDefined)) Some((part, entries.flatten))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Write one partition's manifest file. No rename needed: a
    * manifest is unreachable until a generation referencing it
    * commits (which happens strictly after this returns), so a crash
    * mid-write leaves an unreferenced torn file for vacuum, never a
    * readable half-manifest. Gzip above a threshold — large bodies
    * are ~90% shared path prefixes, small ones stay greppable. The
    * written byte count rides in the returned ref (and from there in
    * the generation body), so readers GET with no stat.
    */
  private def writeMf(partKey: String, entries: Seq[Entry]): MfRef = {
    fs.mkdirs(mfdir): Unit
    val name = f"mf-${System.currentTimeMillis()}%019d-" +
      java.util.UUID.randomUUID().toString
    val sorted = entries.sortBy(_.rel)
    val counted = new StoreManifest.CountingOutputStream(
      fs.create(new Path(mfdir, name), true))
    val sink: java.io.OutputStream =
      if (sorted.size > StoreManifest.MfGzipAbove)
        new java.util.zip.GZIPOutputStream(counted, 64 * 1024) {
          `def`.setLevel(java.util.zip.Deflater.BEST_SPEED)
        }
      else counted
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(sink, StandardCharsets.UTF_8),
      64 * 1024)
    try {
      w.write(s"mf=${sorted.size + 1}"); w.write('\n')
      w.write(s"part\t$partKey"); w.write('\n')
      sorted.foreach { e =>
        w.write(s"${e.rel}\t${e.size}\t${e.mtime}"); w.write('\n')
      }
    } finally w.close()
    MfRef(name, partKey, sorted.size.toLong, counted.count)
  }

  /** Write one DATE partition's final entry set: a single manifest
    * normally; above [[hotSplitFiles]] entries, one manifest per hour
    * sub-key (entries without an `hour=` segment keep the date key) —
    * the hot-date split, engaged only where a partition's manifests
    * are being (re)written anyway, so it costs no extra rewrite.
    */
  private def writeMfs(part: String, entries: Seq[Entry],
      forceSplit: Boolean = false): Seq[MfRef] =
    if (part.isEmpty || (!forceSplit && entries.size < hotSplitFiles))
      Seq(writeMf(part, entries))
    else entries.groupBy(e => subPartKeyOf(e.rel)).toSeq.sortBy(_._1)
      .map { case (sub, es) => writeMf(sub, es) }

  // ---- chain folding (snapshot layer) ----

  /** One `_manifest` listing split into the two populations every
    * read and commit needs: generation files and dirty markers. The
    * manifest files live under `mf/` and are never listed on this
    * path — refs carry name + size, so the listing stays
    * O(generations) whatever the partition count.
    */
  private def listState(): (Map[String, FileStatus], Seq[String]) = {
    val all = StoreFs.list(fs, mdir)
    val gens = all.filter(_.getPath.getName.startsWith("gen-"))
      .map(s => s.getPath.getName -> s).toMap
    val dirty = all.map(_.getPath.getName).filter(_.startsWith("dirty-"))
    (gens, dirty)
  }

  private def genStatuses(): Map[String, FileStatus] = listState()._1

  /** One generation's chain-folded state at the MANIFEST level: the
    * live manifest refs (two-level chains) or the inline entry list
    * (legacy chains) — exactly one side populated, plus the
    * chain-absolute schema/tombstones. Cheap for two-level chains
    * (O(partitions), no entry assembly) — what commits plan from.
    */
  private final case class GenState(gen: String, parent: Option[String],
      inline: Seq[Entry], mfs: Seq[MfRef], twoLevel: Boolean,
      schema: Option[org.apache.spark.sql.types.StructType],
      dead: Seq[Dead], depth: Int, info: Option[String]) {
    def approxSize: Long = inline.size.toLong + mfs.map(_.n).sum
  }

  /** Head-keyed fold memo, (name, size, mtime) like every other memo:
    * chain files are immutable, so a head's fold is valid as long as
    * the head file itself is. Two-level states are tiny; the weight
    * cap only matters for legacy inline chains.
    */
  private val foldMemo = new CappedMemo[(String, Long, Long), GenState](
    StoreManifest.ParseMemoCap,
    s => s.inline.size.toLong + s.mfs.size.toLong)

  private def fold(name: String,
      statuses: Map[String, FileStatus]): Option[GenState] =
    statuses.get(name) match {
      case None => None
      case Some(st) =>
        foldMemo.getOrCompute(
          (name, st.getLen, st.getModificationTime))(
          foldUncached(name, statuses))
    }

  /** Fold one generation's chain: a checkpoint IS its state; a delta
    * patches its parent's fold — manifest-set patches for two-level
    * chains, entry patches for legacy ones, and a MIXED chain is
    * rejected whole (a file-level patch cannot soundly apply to a
    * manifest set). None when this generation — or ANY link its chain
    * needs — is missing, torn, mixed or cyclic: half a chain must
    * read as no chain. Iterative one-pass application (collect the
    * chain, patch one keyed map): a per-link rebuild would make
    * folding O(size × depth) for no semantic gain.
    */
  private def foldUncached(name: String,
      statuses: Map[String, FileStatus]): Option[GenState] = {
    val chain =
      scala.collection.mutable.ArrayBuffer.empty[(String, RawGen)]
    var cur = name
    var full: Option[FullGen] = None
    while (full.isEmpty) {
      if (chain.size > StoreManifest.MaxChain) return None // cyclic
      statuses.get(cur).flatMap(parseRaw) match {
        case None => return None // missing/torn link poisons the head
        case Some(f: FullGen) => full = Some(f); chain += ((cur, f))
        case Some(d: DeltaGen) => chain += ((cur, d)); cur = d.parent
      }
    }
    val fg = full.get
    val entryMap = scala.collection.mutable.LinkedHashMap
      .from(fg.entries.map(e => e.rel -> e))
    val mfMap = scala.collection.mutable.LinkedHashMap
      .from(fg.manifests.map(r => r.name -> r))
    val deadMap = scala.collection.mutable.LinkedHashMap
      .from(fg.dead.map(d => d.rel -> d))
    var schema = fg.schema
    var mixed = false
    chain.dropRight(1).reverseIterator.foreach {
      case (_, d: DeltaGen) =>
        if ((d.adds.nonEmpty || d.drops.nonEmpty) && fg.twoLevel)
          mixed = true
        if ((d.mAdds.nonEmpty || d.mDels.nonEmpty) && !fg.twoLevel)
          mixed = true
        d.drops.foreach(entryMap.remove(_): Unit)
        d.adds.foreach(e => entryMap(e.rel) = e)
        d.mDels.foreach(mfMap.remove(_): Unit)
        d.mAdds.foreach(r => mfMap(r.name) = r)
        d.deadMinus.foreach(deadMap.remove(_): Unit)
        d.deadPlus.foreach(x => deadMap(x.rel) = x)
        schema = d.schema // ABSOLUTE per commit, like a checkpoint's
      case _ => // unreachable: only the chain tail is a FullGen
    }
    if (mixed) return None
    val (parent, headInfo) = chain.head._2 match {
      case d: DeltaGen => (Some(d.parent), d.info)
      case f: FullGen => (f.parent, f.info)
    }
    Some(GenState(name, parent, entryMap.values.toSeq,
      mfMap.values.toSeq, fg.twoLevel, schema, deadMap.values.toSeq,
      depth = chain.size - 1, info = headInfo))
  }

  /** Assemble a folded state into its absolute entry-level
    * [[Snapshot]], reading only the manifests `admit` passes (by
    * partition key; the catch-all `""` must always pass). Duplicate
    * rels across one partition's accumulated manifests resolve
    * newest-manifest-wins — the same overwrite semantics a legacy
    * chain's entry patches had. None when any ADMITTED manifest is
    * missing or torn: half a snapshot must read as no snapshot (an
    * unreadable manifest OUTSIDE the admitted window deliberately
    * does not poison the window's answer).
    */
  private def assemble(st: GenState,
      admit: String => Boolean): Option[Snapshot] = {
    val inlineAdm =
      if (st.inline.isEmpty) st.inline
      else st.inline.filter(e => admit(partKeyOf(e.rel)))
    val refsAdm = st.mfs.filter(r => admit(r.partKey))
    val map = scala.collection.mutable.LinkedHashMap
      .from(inlineAdm.map(e => e.rel -> e))
    refsAdm.foreach { r =>
      parseMf(r) match {
        case None => return None // torn/missing admitted manifest
        case Some((_, es)) => es.foreach(e => map(e.rel) = e)
      }
    }
    Some(Snapshot(st.gen, st.parent,
      map.values.toSeq.sortBy(_.rel), st.schema, st.dead,
      depth = st.depth, info = st.info))
  }

  /** Full-assembly memo, head-keyed: the planning read before a
    * mutation and the mutation's own parent fold share one assembly
    * instead of paying the O(files) concat+sort twice. Keyed on the
    * head generation file alone — manifest files it references are
    * immutable and outlive the head's retention, so the memo is valid
    * for the head file's lifetime.
    */
  private val snapMemo = new CappedMemo[(String, Long, Long), Snapshot](
    16, _.entries.size.toLong) // full snapshots are the heavy items

  private def assembleFull(name: String,
      statuses: Map[String, FileStatus]): Option[Snapshot] =
    statuses.get(name) match {
      case None => None
      case Some(st) =>
        snapMemo.getOrCompute(
          (name, st.getLen, st.getModificationTime))(
          fold(name, statuses).flatMap(assemble(_, _ => true)))
    }

  /** The file names `name`'s fold reads, itself included (delta chain
    * back to its checkpoint) — what retention and vacuum must keep for
    * `name` to stay readable. Walks raw parents without folding; stops
    * at a checkpoint, a missing link, or the cycle guard.
    */
  private def chainNames(name: String,
      statuses: Map[String, FileStatus]): Seq[String] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur: Option[String] = Some(name)
    while (cur.isDefined && acc.size <= StoreManifest.MaxChain) {
      val n = cur.get
      acc += n
      cur = statuses.get(n).flatMap(parseRaw) match {
        case Some(d: DeltaGen) => Some(d.parent)
        case _ => None
      }
    }
    acc.toSeq
  }

  /** Every generation file name needed to fold ANY of the given heads
    * (vacuum's and retention's keep-set).
    */
  private[graft] def neededFor(heads: Seq[String]): Set[String] = {
    val statuses = genStatuses()
    heads.flatMap(chainNames(_, statuses)).toSet
  }

  /** The manifest files DIRECTLY referenced by the given generation
    * files' raw bodies (checkpoint `m` lines and delta `madd` lines) —
    * a superset of what any fold rooted in those files can read, so
    * keeping exactly these keeps every retained head assemblable.
    */
  private def mfsReferencedBy(gens: Iterable[FileStatus]): Set[String] =
    gens.flatMap(s => parseRaw(s).toSeq.flatMap {
      case f: FullGen => f.manifests.map(_.name)
      case d: DeltaGen => d.mAdds.map(_.name)
    }).toSet

  // ---- publish (commit layer) ----

  /** Publish a new generation carrying the ABSOLUTE intended state:
    * the complete live-file list, the merged data schema when the
    * publisher knows it, and the cumulative tombstone list. The
    * manifest diffs that state against the parent snapshot and
    * commits the diff through [[publishPatch]]'s machinery — a
    * manifest-level DELTA when the diff is small and the chain short,
    * a CHECKPOINT otherwise — either way the temp-write + single-file
    * rename is the atomic commit point. Prior generations are
    * retained (newest [[StoreManifest.KeepGens]] heads plus their
    * chains and referenced manifests) so a corrupt latest degrades to
    * the previous consistent snapshot instead of a tree walk.
    */
  def publish(entries: Seq[Entry],
      schema: Option[org.apache.spark.sql.types.StructType],
      dead: Seq[Dead], parent: Option[String],
      info: Option[String] = None): Unit = {
    val normSchema = schema.map(StoreManifest.allNullable)
    val (gens, _) = listState()
    val parentSnap = parent.flatMap(p => assembleFull(p, gens))
    parentSnap match {
      case Some(ps) =>
        // entry-level diff against the parent snapshot, full-Entry
        // comparison: a rel whose size/mtime changed (a re-walked
        // legacy file) re-publishes as drop+add so folds carry the
        // fresh FileStatus. Presized java maps — the diff runs once
        // per commit over the full lists and an immutable .toMap of
        // 10⁶ tuples was the measured bulk of a 1M-file publish.
        def byRel(es: Seq[Entry]): java.util.HashMap[String, Entry] = {
          val m = new java.util.HashMap[String, Entry](es.size * 2)
          es.foreach(e => m.put(e.rel, e))
          m
        }
        val pByRel = byRel(ps.entries)
        val nByRel = byRel(entries)
        val adds = entries.filter(e => pByRel.get(e.rel) != e)
        val drops = ps.entries.collect {
          case e if nByRel.get(e.rel) != e => e.rel }
        val pDead = ps.dead.map(d => d.rel -> d).toMap
        val nDead = dead.map(d => d.rel -> d).toMap
        val deadPlus = dead.filter(d => !pDead.get(d.rel).contains(d))
        val deadMinus = ps.dead.collect {
          case d if !nDead.get(d.rel).contains(d) => d.rel }
        commitTwoLevel(fold(parent.get, gens), parent, adds, drops,
          deadPlus, deadMinus, Some(dead), normSchema, info,
          newSize = entries.size.toLong)
      case None =>
        // first publish, or the parent no longer folds/assembles: the
        // absolute state is in hand, write a fresh checkpoint (the
        // CAS below still verifies `parent` is the newest name)
        commitTwoLevel(None, parent, adds = entries, drops = Nil,
          deadPlus = Nil, deadMinus = Nil, absDead = Some(dead),
          schema = normSchema, info = info,
          newSize = entries.size.toLong)
    }
  }

  /** Patch-shaped publish — O(delta) CPU and bytes per commit, the
    * form the store's own mutations use: they KNOW their deltas (the
    * date they rewrote, the files they retired), so re-deriving the
    * patch by diffing two full entry lists is pure waste on the
    * flush/maintenance cadence. Adds-only partitions get a new
    * manifest holding JUST the adds (accumulation — merged back to
    * one file per partition at the next checkpoint); partitions with
    * drops rewrite their manifests (cost ∝ touched partition, never
    * the table). Rolls a checkpoint on cadence ([[CheckpointEvery]]),
    * outsized patches, or a legacy-form parent (the upgrade path).
    * Same CAS + rename atom + rollback + retention as [[publish]].
    * Throws IllegalStateException when the parent no longer folds or
    * a touched partition's manifest is unreadable (the caller's
    * planning snapshot is gone — re-plan, like a CAS failure).
    */
  def publishPatch(adds: Seq[Entry], drops: Seq[String],
      deadPlus: Seq[Dead], deadMinus: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType],
      parent: String, info: Option[String] = None): Unit = {
    val normSchema = schema.map(StoreManifest.allNullable)
    val (gens, _) = listState()
    val ps = fold(parent, gens).getOrElse(throw new
      IllegalStateException(s"$tableDir: publishPatch parent " +
        s"$parent no longer folds — re-plan and retry"))
    // approximate resulting size for the delta-vs-checkpoint
    // heuristic (duplicate rels across accumulated manifests skew it,
    // but the choice is cosmetic — both forms fold identically)
    val approxNewSize = ps.approxSize + adds.size - drops.size
    commitTwoLevel(Some(ps), Some(parent), adds, drops, deadPlus,
      deadMinus, absDead = None, schema = normSchema, info = info,
      newSize = approxNewSize)
  }

  /** Metadata-only granularity heal: re-key each hot UNSPLIT date's
    * manifests by hour — a date whose giant single manifest predates
    * the split threshold (or was written by an older binary, or under
    * a larger `SPARK_GRAFT_MF_SPLIT`) adopts the hour layout through
    * ONE manifest-set commit with ZERO data movement; dates already
    * split, under the threshold, or merely accumulated (those merge
    * and threshold-split at the next rollover anyway) are untouched.
    * A candidate must actually RE-KEY: a hot manifest whose entries
    * all fall back to the date key (no usable `hour=` segment —
    * foreign layouts) is skipped, so the heal converges instead of
    * rewriting the same bytes every tick, and a mixed date converges
    * after one pass (its hour-less residual manifest re-parses as
    * all-date-keyed). The parse this check pays is memoized and is
    * the same one the commit itself would pay. Plans from fold-level
    * state (O(partitions), no entry assembly) off the newest head.
    * Returns the dates re-keyed (empty = nothing hot, no commit).
    * Same CAS + rename atom as every publish; the caller fences.
    */
  private[graft] def resplitHot(): Seq[String] = {
    val ps = newestFold().getOrElse(return Nil)
    if (!ps.twoLevel) return Nil
    val parent = ps.gen
    val hot = ps.mfs.groupBy(r => StoreManifest.dateKeyOf(r.partKey))
      .collect { case (part, refs) if part.nonEmpty &&
          refs.exists(r => r.partKey == part &&
            r.n >= hotSplitFiles &&
            parseMf(r).exists(_._2.exists(e =>
              StoreManifest.subPartKeyOf(e.rel) != part))) =>
        part
      }.toSeq.sorted
    if (hot.nonEmpty)
      commitTwoLevel(Some(ps), Some(parent), adds = Nil, drops = Nil,
        deadPlus = Nil, deadMinus = Nil, absDead = None,
        schema = ps.schema,
        info = Some(s"""{"op":"resplit","dates":${hot.size}}"""),
        newSize = ps.approxSize, resplit = hot.toSet)
    hot
  }

  /** The shared two-level commit: decide delta vs checkpoint, write
    * the touched partitions' manifest files, then commit the
    * generation body through the CAS + rename atom. Any failure after
    * manifests were written deletes them before rethrowing (they are
    * unreferenced, but eager cleanup beats waiting for vacuum).
    *
    * `absDead` carries the absolute resulting tombstone list when the
    * caller knows it ([[publish]]); otherwise the checkpoint form
    * computes it from the parent's list ± the patch.
    */
  private def commitTwoLevel(parentState: Option[GenState],
      parentName: Option[String],
      adds: Seq[Entry], drops: Seq[String],
      deadPlus: Seq[Dead], deadMinus: Seq[String],
      absDead: Option[Seq[Dead]],
      schema: Option[org.apache.spark.sql.types.StructType],
      info: Option[String], newSize: Long,
      resplit: Set[String] = Set.empty): Unit = {
    val patchLines = adds.size.toLong + drops.size + deadPlus.size +
      deadMinus.size
    // delta only atop a two-level parent (a legacy parent converts via
    // checkpoint), within the cadence, for a patch smaller than the
    // resulting table — the same size heuristic the single-level form
    // used, so commit-form decisions (and the specs pinning them) are
    // unchanged
    val isDelta = parentState.exists(ps => ps.twoLevel &&
      ps.depth + 1 < CheckpointEvery &&
      patchLines < math.max(1L, newSize))
    val addsByPart = adds.groupBy(e => partKeyOf(e.rel))
    val dropsByPart = drops.groupBy(partKeyOf)
      .view.mapValues(_.toSet).toMap
    val newMfs = scala.collection.mutable.ArrayBuffer.empty[MfRef]
    def readPartition(refs: Seq[MfRef])
        : scala.collection.mutable.LinkedHashMap[String, Entry] = {
      val cur = scala.collection.mutable.LinkedHashMap.empty[String, Entry]
      refs.foreach { r =>
        val parsed = parseMf(r).getOrElse(
          throw new IllegalStateException(s"$tableDir: partition " +
            s"manifest ${r.name} unreadable — re-plan and retry"))
        parsed._2.foreach(e => cur(e.rel) = e)
      }
      cur
    }
    try {
      val bodyLines: Iterator[String] = if (isDelta) {
        val ps = parentState.get
        val mfsByDate = ps.mfs.groupBy(r => dateKeyOf(r.partKey))
        val mDels = scala.collection.mutable.ArrayBuffer.empty[String]
        val mAdds = scala.collection.mutable.ArrayBuffer.empty[MfRef]
        (addsByPart.keySet ++ dropsByPart.keySet ++ resplit).toSeq.sorted
          .foreach { part =>
            val pAdds = addsByPart.getOrElse(part, Nil)
            val pDrops = dropsByPart.getOrElse(part, Set.empty)
            val refs = mfsByDate.getOrElse(part, Nil)
            if (pDrops.isEmpty && !resplit(part)) {
              // pure append: small manifests with just the adds — the
              // O(delta) cadence path. A split date's appends follow
              // its form (hour sub-keys) so hour-window plans can
              // prune them too; an unsplit date appends one manifest —
              // unless the append alone crosses the hot threshold, in
              // which case it splits right here (a giant first append
              // must not park a never-resplit manifest).
              if (pAdds.nonEmpty) {
                val rs = writeMfs(part, pAdds,
                  forceSplit = refs.exists(_.partKey != part))
                newMfs ++= rs; mAdds ++= rs
              }
            } else {
              // partition rewrite: retire the manifests the patch can
              // touch and re-emit their survivors (plus adds) fresh —
              // where a date crossing the hot threshold splits. A
              // sub-keyed manifest holds ONLY its own hour's rels
              // (writeMfs/append grouping invariant — sub-keys are a
              // pure function of the rel), so on a split date only the
              // TOUCHED hours' manifests rewrite: per-hour maintenance
              // of a hot date is O(touched hours), not O(date). A
              // date-keyed manifest can hold any of the date's rels
              // and always rewrites.
              val touchedSubs = (pAdds.view.map(e => subPartKeyOf(e.rel))
                ++ pDrops.view.map(subPartKeyOf)).toSet
              // a resplit part rewrites ALL its manifests (the point
              // is re-keying them)
              val (hit0, kept0) = refs.partition(r => resplit(part) ||
                r.partKey == part || touchedSubs(r.partKey))
              // a hit DATE-keyed manifest may carry stale duplicates
              // of rels whose fresh copies live in kept hour
              // manifests (re-adds without drops are legal: publish()
              // diffs a changed entry as a bare add) — re-emitting
              // its survivors in a NEWER manifest would invert
              // assemble's newest-wins, so the rewrite widens to the
              // whole partition then (the merge dedups in fold order;
              // later manifests win, matching the documented
              // resolution). Pure split dates — the steady state —
              // keep the O(touched hours) surgical path.
              val (hit, kept) =
                if (kept0.nonEmpty && hit0.exists(_.partKey == part))
                  (refs, Seq.empty[MfRef])
                else (hit0, kept0)
              val cur = readPartition(hit)
              pDrops.foreach(cur.remove(_): Unit)
              pAdds.foreach(e => cur(e.rel) = e)
              mDels ++= hit.map(_.name)
              if (cur.nonEmpty) {
                // kept non-empty ⇔ untouched hour manifests survive
                // (the partition above puts every date-keyed ref in
                // `hit`) — the rewritten subset must stay sub-keyed
                // then, whatever its size, so the invariant holds
                val rs = writeMfs(part, cur.values.toSeq,
                  forceSplit = kept.nonEmpty)
                newMfs ++= rs; mAdds ++= rs
              }
            }
          }
        val lines = s"parent\t${parentName.get}" +:
          (schema.toSeq.map(s => s"schema\t${s.json}") ++
            infoLineOf(info) ++
            (if (mAdds.exists(_.partKey.contains('/')))
              Seq(s"protocol\t${StoreManifest.HourSplitProtocol}")
            else Nil) ++
            deadMinus.sorted.map(r => s"dead-\t$r") ++
            deadPlus.map(d => s"dead+\t${d.rel}\t${d.millis}")
              .sorted ++
            mDels.sorted.map(n => s"mdel\t$n") ++
            mAdds.map(r =>
              s"madd\t${r.name}\t${r.partKey}\t${r.n}\t${r.size}")
              .sorted)
        (s"delta=${lines.size}" +: lines).iterator
      } else {
        // checkpoint: final per-partition manifest set. Untouched
        // single-manifest partitions REUSE their file by name; touched
        // or accumulated (multi-manifest) partitions merge to one
        // fresh file — rollover bytes ∝ partitions touched since the
        // last checkpoint, never the table.
        val finalRefs = scala.collection.mutable.ArrayBuffer.empty[MfRef]
        val touched = addsByPart.keySet ++ dropsByPart.keySet ++ resplit
        parentState match {
          case Some(ps) if ps.twoLevel =>
            val byPart = ps.mfs.groupBy(r => dateKeyOf(r.partKey))
            (byPart.keySet ++ touched).toSeq.sorted.foreach { part =>
              val refs = byPart.getOrElse(part, Nil)
              // canonical = one manifest per (sub-)key: a single
              // date-keyed file, or a split date whose hour manifests
              // are distinct. Reused BY NAME; anything accumulated
              // (same key twice: parent + appends) merges fresh. A
              // date-keyed ref MIXED with hour-keyed ones is NOT
              // canonical even when the keys are distinct: the two
              // can share rels (a threshold-crossing append re-adds a
              // changed entry the date manifest still carries), and a
              // reused checkpoint resolves duplicates by mf-NAME
              // order — wall-clock timestamps a same-millisecond tie
              // or clock step can invert, resurrecting the stale
              // entry the delta fold order resolved correctly. Merge
              // such partitions fresh (the merge dedups in fold
              // order); pure hour-split sets can't share rels
              // (sub-keys are a pure function of the rel).
              val canonical =
                refs.map(_.partKey).distinct.size == refs.size &&
                  (refs.size <= 1 || refs.forall(_.partKey != part))
              if (!touched(part) && refs.nonEmpty && canonical)
                finalRefs ++= refs
              else {
                val cur = readPartition(refs)
                dropsByPart.getOrElse(part, Set.empty)
                  .foreach(cur.remove(_): Unit)
                addsByPart.getOrElse(part, Nil)
                  .foreach(e => cur(e.rel) = e)
                if (cur.nonEmpty) {
                  val rs = writeMfs(part, cur.values.toSeq)
                  newMfs ++= rs; finalRefs ++= rs
                }
              }
            }
          case Some(ps) => // legacy inline parent: convert whole
            val cur = scala.collection.mutable.LinkedHashMap
              .from(ps.inline.map(e => e.rel -> e))
            drops.foreach(cur.remove(_): Unit)
            adds.foreach(e => cur(e.rel) = e)
            cur.values.toSeq.groupBy(e => partKeyOf(e.rel))
              .toSeq.sortBy(_._1).foreach { case (part, es) =>
                val rs = writeMfs(part, es)
                newMfs ++= rs; finalRefs ++= rs
              }
          case None => // first publish (or absolute re-publish over
                       // an unreadable parent): all partitions fresh
            adds.groupBy(e => partKeyOf(e.rel)).toSeq.sortBy(_._1)
              .foreach { case (part, es) =>
                val rs = writeMfs(part, es)
                newMfs ++= rs; finalRefs ++= rs
              }
        }
        val deadFinal: Seq[Dead] = absDead.getOrElse {
          val m = scala.collection.mutable.LinkedHashMap
            .from(parentState.map(_.dead).getOrElse(Nil)
              .map(d => d.rel -> d))
          deadMinus.foreach(m.remove(_): Unit)
          deadPlus.foreach(d => m(d.rel) = d)
          m.values.toSeq
        }
        val mLines = finalRefs.sortBy(_.name)
          .map(r => s"m\t${r.name}\t${r.partKey}\t${r.n}\t${r.size}")
        Iterator(s"mlist=${mLines.size}") ++
          parentName.toSeq.map(p => s"parent\t$p") ++
          schema.toSeq.map(s => s"schema\t${s.json}") ++
          infoLineOf(info) ++
          (if (finalRefs.exists(_.partKey.contains('/')))
            Iterator(s"protocol\t${StoreManifest.HourSplitProtocol}")
          else Iterator.empty) ++
          deadFinal.map(d => s"dead\t${d.rel}\t${d.millis}").sorted ++
          mLines
      }
      commitBody(bodyLines, if (isDelta) ".delta" else ".list",
        parentName)
    } catch {
      case e: Throwable =>
        // the generation never committed (CAS rejection, rolled-back
        // race, I/O): the manifests written for it are unreferenced —
        // delete eagerly rather than leaving them for vacuum
        newMfs.foreach(r =>
          fs.delete(new Path(mfdir, r.name), false): Unit)
        throw e
    }
  }

  /** The shared commit tail: stream the body into a temp file (gzip
    * for checkpoints), expected-parent CAS, the rename atom,
    * post-rename conflict rollback, retention (generations AND the
    * manifest files only pruned generations referenced).
    */
  private def commitBody(bodyLines: Iterator[String], ext: String,
      parent: Option[String]): Unit = {
    fs.mkdirs(mdir): Unit
    writeProtocolMarker()
    val uuid = java.util.UUID.randomUUID().toString
    val tmp = new Path(mdir, s".tmp-$uuid")
    // checkpoints gzip (shared path/digit prefixes compress ~13×, and
    // the CRC trailer makes a torn body loudly unreadable); deltas
    // stay plain text: they are hundreds of bytes, and a greppable
    // commit log is worth more than the ~300 saved. BEST_SPEED: the
    // extra ratio of the default level is not worth tripling the
    // compress wall on every cadence rollover.
    val raw = fs.create(tmp, true)
    val sink: java.io.OutputStream =
      if (ext == ".list")
        new java.util.zip.GZIPOutputStream(raw, 64 * 1024) {
          `def`.setLevel(java.util.zip.Deflater.BEST_SPEED)
        }
      else raw
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(sink, StandardCharsets.UTF_8),
      64 * 1024)
    try bodyLines.foreach { l => w.write(l); w.write('\n') }
    finally w.close() // closes gzip (CRC trailer) then the file stream
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
      f"gen-${System.currentTimeMillis()}%019d-$uuid$ext")
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
    // generation as truth, and a THIRD publisher planning from it
    // would chain onto a lineage omitting the race winner's commit.
    // The writer lease ([[ParquetStore]] fencing, re-verified at every
    // commit point) is the actual mutual exclusion that makes racing
    // publishers impossible; this CAS + rollback is its
    // belt-and-braces for the misconfigured-second-writer case it
    // exists to catch.
    // ONE post-rename listing serves the conflict check, generation
    // retention and manifest retention below (separate listings made
    // the delta commit's wall grow for no reason — measured 25→248 ms
    // at 10³→10⁶ files before consolidation). THE COMMIT IS DURABLE
    // FROM THE RENAME: a transient failure of this listing must not
    // escape as a publish failure — the caller's cleanup would treat
    // the landed commit as never-committed and delete the manifests
    // its generation references, permanently poisoning the newest
    // head. An empty list skips the belt-and-braces conflict check
    // (the writer lease is the actual mutual exclusion) and makes
    // this commit's retention a no-op — bytes until the next commit
    // retries, never truth.
    val postList = try StoreFs.list(fs, mdir)
      catch { case scala.util.control.NonFatal(_) => Seq.empty }
    val conflicting = postList.map(_.getPath.getName)
      .filter(n => n.startsWith("gen-") && n != gen.getName &&
        parent.forall(_ < n))
    if (conflicting.nonEmpty) {
      // rollback; if this delete itself fails, the loser generation
      // stays on disk but its manifests are deleted by the caller's
      // cleanup — readers then reject it whole and fall back to the
      // race winner, which IS the correct truth either way
      fs.delete(gen, false): Unit
      throw new StoreManifest.ConcurrentCommitException(
        s"$tableDir: publish of ${gen.getName} lost a race over parent " +
          s"${parent.getOrElse("(none)")} to ${conflicting.sorted.last} " +
          "— rolled back; re-plan from the new newest generation")
    }
    // THE COMMIT IS DURABLE FROM HERE. Everything below is
    // best-effort housekeeping and must not be able to fail the
    // publish: an exception escaping after the rename would make the
    // caller's cleanup treat a LANDED commit as never-committed and
    // delete the manifests its generation references — permanently
    // poisoning the newest head. A throttled LIST/DELETE costs
    // retained bytes until the next commit retries, never truth.
    try {
      // retain the newest KeepGens generation HEADS plus every older
      // file their delta chains fold through, then every manifest
      // file a surviving generation references (readers take the
      // newest FOLDABLE head, so a failed delete costs bytes, not
      // truth). Age-based pruning beyond this is vacuum's job.
      val statuses = postList
        .filter(_.getPath.getName.startsWith("gen-"))
        .map(s => s.getPath.getName -> s).toMap
      val heads = statuses.keys.toSeq.sorted.takeRight(KeepGens)
      val keep = heads.flatMap(chainNames(_, statuses)).toSet
      statuses.keys.filterNot(keep).foreach(n =>
        fs.delete(new Path(mdir, n), false): Unit)
      // manifest retention — on CHECKPOINT commits only: any mf a
      // KEPT generation's raw body names must survive (it is what
      // makes that head assemblable); the rest belonged to pruned
      // generations (or crashed commits) and go with them. Deltas
      // skip this — mf garbage only accrues from mdels and
      // generation pruning, both bounded between checkpoints, and
      // skipping keeps the delta commit's filesystem work
      // O(generations), never O(partitions). Single-writer fencing
      // means no other publisher has written-but-not-yet-committed
      // manifests to protect.
      if (ext == ".list") {
        val neededMfs = mfsReferencedBy(
          keep.toSeq.sorted.flatMap(statuses.get))
        StoreFs.list(fs, mfdir).map(_.getPath.getName)
          .filter(n => n.startsWith("mf-") && !neededMfs(n))
          .foreach(n => fs.delete(new Path(mfdir, n), false): Unit)
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Set once the marker is known present: the exists-probe must not
    * cost every commit a metadata round trip on a long-lived writer.
    */
  @volatile private var protocolKnown = false

  /** One-time advisory marker naming the on-disk protocol, so an
    * operator (or an older binary's logs) can see WHY a pre-round-19
    * reader degrades to listing mode instead of silently serving
    * stale truth. Advisory only — the real contract is the header
    * self-describing each body.
    */
  private def writeProtocolMarker(): Unit = if (!protocolKnown) {
    val proto = new Path(mdir, "protocol")
    if (fs.exists(proto)) protocolKnown = true
    else {
      try {
        val o = fs.create(proto, false)
        try o.write(("duospark manifest protocol: two-level (round 19)\n" +
          "generations: gen-*.list (mlist manifest-list), " +
          "gen-*.delta (madd/mdel manifest patches)\n" +
          "partition manifests: mf-* (one date partition's entries)\n" +
          "readers older than this protocol cannot fold these " +
          "generations and degrade to legacy listing mode.\n")
          .getBytes(StandardCharsets.UTF_8))
        finally o.close()
        protocolKnown = true
      } catch { case scala.util.control.NonFatal(_) => () }
      // advisory either way: a racing creator's failure is fine, the
      // next commit re-probes
    }
  }

  /** The operation-audit line, newline-scrubbed: the body is
    * line-oriented and self-counted, so a caller's stray newline must
    * not be able to tear every generation it publishes.
    */
  private def infoLineOf(info: Option[String]): Seq[String] =
    info.toSeq.map(i =>
      s"info\t${i.replace('\n', ' ').replace('\r', ' ')}")

  /** Generation file names, oldest → newest (vacuum's pruning input
    * and the time-travel coordinate list — checkpoints and deltas
    * both, since each names a complete snapshot via its fold).
    */
  def genNames(): Seq[String] =
    StoreFs.list(fs, mdir).map(_.getPath.getName)
      .filter(_.startsWith("gen-")).sorted

  /** Drop one generation file by name (vacuum). */
  def deleteGen(name: String): Unit =
    fs.delete(new Path(mdir, name), false): Unit

  /** Delete manifest files no retained generation references and
    * older than the grace window — crashed commits' debris (the
    * commit-time retention already prunes manifests with the
    * generations that referenced them; the grace guard here is
    * belt-and-braces for a torn in-flight commit). Returns the count.
    */
  private[graft] def vacuumOrphanManifests(graceMs: Long,
      now: Long = System.currentTimeMillis()): Int = {
    val (gens, _) = listState()
    val needed = mfsReferencedBy(gens.values)
    val orphans = StoreFs.list(fs, mfdir).map(_.getPath.getName)
      .filter { n =>
        n.startsWith("mf-") && !needed(n) &&
          n.stripPrefix("mf-").takeWhile(_.isDigit)
            .toLongOption.forall(_ + graceMs <= now)
      }
    orphans.foreach(n => fs.delete(new Path(mfdir, n), false): Unit)
    orphans.size
  }

  /** One SPECIFIC retained generation's snapshot (time travel: its
    * data files live until vacuum's grace passes). None when the name
    * is gone, the body fails the self-checks, its delta chain lost a
    * link, or a referenced partition manifest is torn.
    */
  def readGen(name: String): Option[Snapshot] =
    if (!name.startsWith("gen-")) None
    else assembleFull(name, genStatuses())

  /** One generation's OWN operation-audit string WITHOUT folding its
    * chain: the info line is per-commit raw metadata, so a memoized
    * single-file parse answers it — listing every retained
    * generation's audit (the `?info=true` route) must not pay
    * KeepGens × O(table) folds.
    */
  def genInfo(name: String): Option[String] =
    if (!name.startsWith("gen-")) None
    else genStatuses().get(name).flatMap(parseRaw).flatMap(infoOf)

  /** Every retained generation's own audit string, resolved from ONE
    * `_manifest` listing — the `?info=true` route renders all retained
    * generations per request, and a per-name [[genInfo]] loop would
    * pay O(gens) directory listings (noticeable on object stores).
    */
  def genInfos(): Map[String, Option[String]] =
    genStatuses().map { case (n, st) => n -> parseRaw(st).flatMap(infoOf) }

  private def infoOf(r: RawGen): Option[String] = r match {
    case f: FullGen => f.info
    case d: DeltaGen => d.info
  }

  /** The newest READABLE generation's snapshot, or None when no
    * generation folds whole — the caller then treats the store as
    * never-compacted (legacy listing mode). A torn write can't be
    * mis-read: the temp-name write + rename publishes whole files
    * only, and the self-count plus per-line field checks reject a
    * truncated or malformed body — which then falls back to the
    * PREVIOUS retained generation (a stale-but-consistent snapshot)
    * rather than to half a snapshot; a delta whose chain lost a link,
    * and a generation whose partition manifest is torn, are rejected
    * the same all-or-nothing way.
    */
  def read(): Option[Snapshot] = readState()._1

  /** [[read]] plus the current dirty markers, resolved from ONE
    * `_manifest` listing — the planning state every read and mutation
    * starts from. Folding and assembling the newest head costs no
    * further filesystem calls once the immutable-file memos are warm.
    */
  def readState(): (Option[Snapshot], Seq[String]) = {
    val (gens, dirty) = listState()
    val heads = gens.keys.toSeq.sorted(Ordering[String].reverse)
    (heads.iterator.flatMap(assembleFull(_, gens)).nextOption(), dirty)
  }

  /** [[readState]] restricted to the partitions `admit` passes (by
    * partition key — `date=…`, a hot-split date's `date=…/hour=…`
    * sub-key, or the catch-all `""`, which admit must always pass;
    * an admit that groups at date level must accept every key whose
    * [[StoreManifest.dateKeyOf]] matches): the snapshot's entries cover ONLY admitted
    * partitions, and only their manifest files are read — the plan
    * wall of a windowed query scales with the partitions the window
    * admits, flat as the table grows. The pruned snapshot is a
    * PLANNING view: publishing it as absolute truth would drop every
    * non-admitted partition, so mutations that republish must use the
    * full [[readState]] (or patch-shaped commits).
    */
  def readStateFor(admit: String => Boolean)
      : (Option[Snapshot], Seq[String]) = {
    val (gens, dirty) = listState()
    val heads = gens.keys.toSeq.sorted(Ordering[String].reverse)
    (heads.iterator
      .flatMap(h => fold(h, gens).flatMap(assemble(_, admit)))
      .nextOption(), dirty)
  }

  /** Generation files this binary cannot INTERPRET that are not mere
    * crash debris: an unknown body-form header, a `protocol`
    * capability outside [[StoreManifest.SupportedProtocols]] (the
    * shape a FUTURE binary's commits take), or a header region this
    * pass could not read whole (zero-byte / header-torn artifacts —
    * a non-atomic object-store copy can produce them — and transient
    * I/O faults, which must fail CLOSED: a throttle mis-classifying a
    * future generation as interpretable would run the destructive
    * sweeps in exactly the rollback scenario the gate exists for).
    * Vacuum treats any of these as "a newer binary owns this store's
    * tail" and stands its destructive sweeps down; each name carries
    * its classification reason so the stand-down is observable and an
    * operator can acknowledge-and-reclaim provably-dead debris
    * ([[ParquetStore.vacuum]]'s `reclaimUnknown`). A
    * torn-but-known-form generation (bad count, body truncated past
    * the header region) stays prunable debris and does NOT trip this;
    * a name pruned between the listing and the read is a raced
    * cleanup, not a hazard.
    *
    * The scan is bounded to the HEADER REGION — the form header plus
    * the optional parent/schema/info/protocol lines, which writers
    * always emit before any dead/entry/manifest line — and reads
    * line-streamed until the first complete non-header line, however
    * wide the header grows (a drifted-schema `schema\t` line can run
    * to megabytes; a fixed read cap would truncate the `protocol`
    * line away and silently fail the gate open). A `protocol\t` match
    * must carry exactly one value token: a KNOWN-form body whose
    * first entry names a root-level rel literally `protocol`
    * (`protocol\t<size>\t<mtime>`) is an entry line ending the header
    * region, not a capability.
    */
  private[graft] def futureFormatGens(): Seq[StoreManifest.UnknownGen] = {
    val (gens, _) = listState()
    gens.toSeq.sortBy(_._1).flatMap { case (n, st) =>
      try classifyHeader(n, st.getPath, st.getLen)
      catch {
        case _: java.io.FileNotFoundException => None // raced prune
        case scala.util.control.NonFatal(e) =>
          // fail CLOSED: an unreadable header stands the sweeps down
          // for THIS pass; the next tick re-reads (never memoized).
          // NOT reclaimable — a transient I/O fault must not make a
          // healthy generation acknowledgeable for deletion. (A
          // PERSISTENTLY unreadable artifact at this layer — e.g. a
          // bit-rotted file behind a stale checksum — is the one
          // stand-down with no in-API acknowledge path by design:
          // the store cannot distinguish it from a fault that will
          // clear, so removing it is deliberate out-of-band operator
          // surgery on the named file, never an API call.)
          Some(StoreManifest.UnknownGen(n,
            s"header unreadable this pass: ${e.getClass.getSimpleName}"))
      }
    }
  }

  /** One generation's header-region classification: None =
    * interpretable (known form, no unknown capability — includes torn
    * known-form debris whose tear lies PAST the header region);
    * Some(reason) = this binary cannot vouch for it.
    */
  private def classifyHeader(n: String, p: Path,
      expectedLen: Long): Option[StoreManifest.UnknownGen] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.BufferedInputStream(in, 64 * 1024)
      buf.mark(2)
      val b0 = buf.read(); val b1 = buf.read()
      buf.reset()
      val isGzip = b0 == 0x1f && b1 == 0x8b
      val data: java.io.InputStream =
        if (isGzip)
          new java.io.BufferedInputStream(
            new java.util.zip.GZIPInputStream(buf, 64 * 1024), 64 * 1024)
        else buf
      try scanHeader(n, data)
      catch {
        // confined to the DECODE layer: the gzip magic matched and
        // the inflater then hit a tear/corruption inside the header
        // region (plain-stream EOFs fall through to the caller's
        // fail-closed non-reclaimable arm; a tear PAST the first
        // non-header line is never reached — the scan stops there).
        // Even here the tear is a fact about THE BYTES only if the
        // stream delivered the file's whole recorded length: an
        // object-store transport that truncates under connection
        // resets surfaces the same EOFException from the inflater, so
        // the raw length is re-verified before the artifact becomes
        // acknowledgeable — a short raw read classifies as the
        // transient non-reclaimable shape instead.
        case e @ (_: java.io.EOFException |
            _: java.util.zip.ZipException) if isGzip =>
          if (rawLengthConsistent(p, expectedLen))
            Some(StoreManifest.UnknownGen(n,
              s"torn gzip inside the header region " +
                s"(${e.getClass.getSimpleName})", reclaimable = true))
          else
            Some(StoreManifest.UnknownGen(n,
              "gzip header unreadable this pass (raw stream shorter " +
                "than the recorded length — transport fault, retried " +
                "next tick)"))
      }
    } finally in.close()
  }

  /** Whether a fresh raw read of `p` delivers exactly `expectedLen`
    * bytes — the transport-truncation probe behind the torn-gzip
    * reclaimability decision. Any failure reads as inconsistent
    * (fail closed).
    */
  private def rawLengthConsistent(p: Path, expectedLen: Long): Boolean =
    try {
      val in2 = fs.open(p)
      try {
        var total = 0L
        val b = new Array[Byte](64 * 1024)
        var r = in2.read(b)
        while (r > 0) { total += r; r = in2.read(b) }
        total == expectedLen
      } finally in2.close()
    } catch { case scala.util.control.NonFatal(_) => false }

  /** The header-region line scan of [[classifyHeader]] (split out so
    * the gzip-decode catch above wraps exactly the decode reads).
    */
  private def scanHeader(n: String,
      data: java.io.InputStream): Option[StoreManifest.UnknownGen] = {
    {
      val headerPrefixes =
        Seq("parent\t", "schema\t", "info\t", "protocol\t")
      val sb = new java.lang.StringBuilder
      var lineNo = 0
      var legacyForm = false
      var read = 0L
      while (true) {
        val c = data.read()
        read += 1
        // NOT reclaimable: ClassifyMaxBytes is a READER-local bound,
        // not a format invariant — a future binary can legitimately
        // rename-publish a wider header, and the acknowledge path
        // must never be able to delete it
        if (read > StoreManifest.ClassifyMaxBytes)
          return Some(StoreManifest.UnknownGen(n,
            s"header region exceeds ${StoreManifest.ClassifyMaxBytes} B"))
        if (c < 0) {
          // EOF: a clean end after complete header lines is a whole
          // (header-only) body; anything short of that is torn inside
          // the header region — uninterpretable, stand down (and
          // RECLAIMABLE: whole-file rename publishing means only dead
          // debris can look like this)
          return if (lineNo == 0 || sb.length > 0)
            Some(StoreManifest.UnknownGen(n,
              if (lineNo == 0 && sb.length == 0) "empty generation file"
              else "torn inside the header region", reclaimable = true))
          else None
        }
        if (c == '\n') {
          val line = sb.toString; sb.setLength(0)
          if (lineNo == 0) {
            legacyForm = line.startsWith("count=")
            if (!(legacyForm || line.startsWith("mlist=") ||
                line.startsWith("delta=")))
              return Some(StoreManifest.UnknownGen(n,
                s"unknown body form '${line.take(32)}'"))
          } else if (line.startsWith("protocol\t")) {
            // LEGACY (count=) bodies have no protocol concept at all:
            // their parser reads such a line as a (malformed or
            // rel-literally-named-`protocol`) ENTRY — interpretable
            // form either way, never a capability. In the two-level
            // forms `parseProtocol` rejects ANY unrecognized value
            // whole — multi-token included — so the classifier must
            // flag exactly what the reader refuses to interpret, or
            // the gate fails open on a future multi-token capability.
            if (legacyForm) return None
            val cap = line.stripPrefix("protocol\t")
            if (!StoreManifest.SupportedProtocols(cap))
              return Some(StoreManifest.UnknownGen(n,
                s"future protocol capability '${cap.take(32)}'"))
          } else if (!headerPrefixes.exists(line.startsWith)) {
            // first complete non-header line: the header region is
            // whole and named no unknown capability — interpretable
            // (body-level tears are parse-layer debris, not a hazard)
            return None
          }
          lineNo += 1
        } else sb.append(c.toChar)
      }
      None // unreachable
    }
  }

  /** Every retained readable generation, newest first (vacuum's
    * reference set: a tree referenced by ANY retained generation is
    * not an orphan).
    */
  def readAll(): Seq[Snapshot] = {
    val (gens, _) = listState()
    gens.keys.toSeq.sorted(Ordering[String].reverse)
      .flatMap(assembleFull(_, gens))
  }

  /** Whether a readable manifest generation is present (specs/gates). */
  def present: Boolean = read().isDefined

  /** The newest foldable generation's manifest refs as (name,
    * partKey) — spec/probe introspection for hot-split shape and
    * checkpoint reuse-by-name assertions. Nil for legacy (inline)
    * states.
    */
  private[graft] def mfRefs(): Seq[(String, String)] =
    newestFold().map(_.mfs.map(r => (r.name, r.partKey))).getOrElse(Nil)

  /** The newest FOLDABLE generation's manifest-level state — the one
    * head-selection policy (newest first, skip unreadable heads)
    * shared by every fold-level consumer.
    */
  private def newestFold(): Option[GenState] = {
    val (gens, _) = listState()
    gens.keys.toSeq.sorted(Ordering[String].reverse).iterator
      .flatMap(h => fold(h, gens)).nextOption()
  }
}

object StoreManifest {
  /** Generation HEADS retained by [[StoreManifest.publish]] (plus the
    * chain files each head's fold needs and the manifest files they
    * reference): newest is the truth, older ones are corruption
    * insurance and the snapshot-isolation window's metadata (their
    * data files live until vacuum's grace passes).
    */
  val KeepGens: Int = 3

  /** Checkpoint cadence: a publish whose parent chain has already
    * grown this long folds the chain into a full `.list` checkpoint
    * instead of appending another delta — bounding both the fold
    * depth a read pays and the per-partition manifest accumulation
    * (the rollover merges each touched partition back to one file).
    * Ten is Delta Lake's own default ratio of commits per checkpoint
    * neighborhood at this metadata scale.
    */
  val CheckpointEvery: Int = 10

  /** Fold-depth guard: no legal chain exceeds [[CheckpointEvery]], so
    * anything past this is a corrupt/cyclic parent graph and the fold
    * rejects it rather than spinning.
    */
  private[store] val MaxChain: Int = 64

  /** Generation parse/fold memo bound: comfortably above the live
    * working set (KeepGens heads + one chain ≤ ~13 files) so
    * steady-state reads never evict, while a months-long cadence
    * can't pin every generation ever published.
    */
  private[store] val ParseMemoCap: Int = 64

  /** Manifest-file memo bound: the live working set is one manifest
    * per partition the active queries' windows admit plus the
    * accumulation tail — hundreds, not thousands; eviction just
    * re-GETs an immutable file.
    */
  private[store] val MfMemoCap: Int = 4096

  /** Cumulative cached-ENTRY bound shared by the memos' overflow
    * checks: ~4M entries ≈ 600 MB of cached metadata at most — enough
    * for the live working set of a million-file table, small enough
    * that time-traveling across many retained generations cycles the
    * cache instead of exhausting the driver heap.
    */
  private[store] val MemoEntryCap: Long = 4L * 1000L * 1000L

  /** Manifest bodies above this entry count gzip on write (shared
    * path prefixes compress ~13×); smaller ones stay plain — a
    * greppable flush-sized manifest is worth more than the bytes.
    */
  private[store] val MfGzipAbove: Int = 256

  /** Files-per-date threshold above which a freshly-written date
    * partition's manifest splits into HOUR-keyed manifests
    * (`date=…/hour=…`), so a window plan on a pathologically hot date
    * reads ~1/24 of its metadata instead of the whole date. Sized
    * where the single-manifest parse wall becomes the plan's dominant
    * term (~10⁵ entries ≈ 60 ms; SCALE.md round-19 residual) — the
    * 1,000-files/date shape observability tables actually have never
    * crosses it, so normal tables keep one manifest per date. The
    * split engages only when a partition's manifest is (re)written —
    * merge at checkpoint, rewrite, convert or first publish — never
    * by re-keying untouched manifests. `SPARK_GRAFT_MF_SPLIT`
    * overrides for probes.
    */
  private[store] val HotSplitDefault: Int =
    sys.env.get("SPARK_GRAFT_MF_SPLIT").flatMap(_.toIntOption)
      .getOrElse(100 * 1000)

  /** Reader-capability name a generation with hour sub-keyed
    * manifests declares (see `parseProtocol`); the set is every
    * capability THIS binary can interpret.
    */
  private[store] val HourSplitProtocol: String = "hour-split"
  private[store] val SupportedProtocols: Set[String] =
    Set(HourSplitProtocol)

  /** One generation this binary cannot vouch for (vacuum's stand-down
    * set): the file name, WHY it classified — the observability half
    * of the destructive-sweep gate — and whether the classification
    * PROVES it dead debris (`reclaimable`): zero-byte, torn inside
    * the header region (plain-text incomplete line at true EOF, or a
    * gzip decode failure after the magic matched) — shapes a
    * whole-file rename publish cannot produce. Only reclaimable
    * entries may be acknowledged through `vacuum(reclaimUnknown)`;
    * an unknown-form / future-protocol / oversized-header generation
    * is (or may be) a NEWER binary's live commit, and a
    * transient-I/O classification proves nothing — none of those is
    * acknowledgeable for deletion.
    */
  final case class UnknownGen(name: String, reason: String,
      reclaimable: Boolean = false)

  /** Header-region read bound for the future-format classifier: far
    * above any real header (the widest drifted-schema line measured is
    * hundreds of KB) while still bounding a corrupt no-newline blob's
    * scan. Exceeding it is uninterpretable — stand down, never assume.
    */
  private[store] val ClassifyMaxBytes: Long = 64L * 1024 * 1024

  /** rel → rel without its leading `_gen-…` rewrite-tree segment: the
    * logical path both key derivations below parse, factored out so
    * they cannot diverge (the surgical-rewrite argument depends on
    * [[partKeyOf]] and [[subPartKeyOf]] agreeing on the date).
    */
  private def stripTree(rel: String): String =
    if (rel.startsWith("_gen-")) rel.substring(rel.indexOf('/') + 1)
    else rel

  /** The finer storage key a hot date's manifests carry: the leading
    * `date=…/hour=…` segments when both exist, else [[partKeyOf]]'s
    * key. A pure function of the rel, so one rel can never live under
    * two sub-keys. The hour value is NORMALIZED to two digits
    * (`hour=3` → `hour=03` — Spark's partitionBy on a numeric hour
    * column writes unpadded) so the admit functions' string compare
    * is chronological; a non-numeric hour falls back to the date key
    * (no refinement, never a wrong one).
    */
  private[graft] def subPartKeyOf(rel: String): String = {
    val l = stripTree(rel)
    val i = l.indexOf('/')
    if (i > 0 && l.startsWith("date=")) {
      val j = l.indexOf('/', i + 1)
      val hour =
        if (j > 0 && l.substring(i + 1, j).startsWith("hour="))
          l.substring(i + 6, j).toIntOption.filter(h => h >= 0 && h < 24)
        else None
      hour match {
        case Some(h) => f"${l.substring(0, i)}/hour=$h%02d"
        case None => l.substring(0, i)
      }
    } else ""
  }

  /** A manifest partKey's DATE-level group: the leading segment of an
    * hour sub-key, identity for date-only keys and the catch-all.
    * Commit-side grouping and per-date admit functions operate at
    * this level so a split date's manifests keep behaving as one
    * partition.
    */
  private[graft] def dateKeyOf(partKey: String): String = {
    val i = partKey.indexOf('/')
    if (i > 0) partKey.substring(0, i) else partKey
  }

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

  /** One partition-manifest reference as a generation body carries
    * it: the immutable file name under `_manifest/mf/`, the partition
    * key its entries share (`date=…`; `date=…/hour=…` when a hot date
    * split, [[subPartKeyOf]]; or `""` for the catch-all), its
    * entry count (pruning and size heuristics — duplicates across a
    * partition's accumulated manifests make it an upper bound), and
    * its exact byte size (planning GETs by name with no listing or
    * stat, and rejects a torn copy by length).
    */
  private[graft] final case class MfRef(name: String, partKey: String,
      n: Long, size: Long)

  /** Byte counter for manifest writes: the ref records the exact
    * on-disk size without a post-write stat round trip.
    */
  private[store] final class CountingOutputStream(
      out: java.io.OutputStream) extends java.io.OutputStream {
    var count: Long = 0L
    override def write(b: Int): Unit = { out.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); count += len
    }
    override def flush(): Unit = out.flush()
    override def close(): Unit = out.close()
  }

  /** The partition key a rel groups under: its leading `date=…` path
    * segment (a rewrite-tree `_gen-…` prefix is stripped first — a
    * tree is WHERE bytes live, not what partition they belong to), or `""`
    * for anything else (root-level files, `_staging` rels). The admit
    * functions [[StoreManifest.readStateFor]] takes receive exactly
    * these keys and must always pass `""`.
    */
  private[graft] def partKeyOf(rel: String): String = {
    val l = stripTree(rel)
    val i = l.indexOf('/')
    if (i > 0) {
      val seg = l.substring(0, i)
      if (seg.startsWith("date=")) seg else ""
    } else ""
  }

  /** One manifest generation's FOLDED, ASSEMBLED state: its own file
    * name, the parent generation it committed over (None = first
    * ever), the live-file list (complete, or window-pruned when it
    * came from [[StoreManifest.readStateFor]]), the merged data
    * schema when the publishing operation knew it, the cumulative
    * not-yet-vacuumed tombstones, and the delta-chain depth since the
    * last checkpoint (0 = this generation IS a checkpoint). The
    * recorded parent makes each generation's lineage auditable and is
    * what the expected-parent CAS verifies. `info` is this
    * generation's OWN operation-audit string (the Delta commitInfo
    * idea), not folded through the chain: each commit describes
    * itself.
    */
  final case class Snapshot(gen: String, parent: Option[String],
      entries: Seq[Entry],
      schema: Option[org.apache.spark.sql.types.StructType],
      dead: Seq[Dead], depth: Int = 0,
      info: Option[String] = None) {
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
