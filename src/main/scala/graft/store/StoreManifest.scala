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
  * Commit format (round 18 — the Delta-log discipline): a generation
  * file is either a CHECKPOINT (`gen-*.list`: the complete live-file
  * list — the pre-round-18 body, now gzip-compressed on write; reads
  * sniff the gzip magic, so existing plain-text stores read
  * unchanged) or a DELTA (`gen-*.delta`: only this commit's adds,
  * drops, tombstone changes and parent pointer). [[publish]] keeps its
  * absolute-state signature — callers still hand it the full intended
  * table state — and the manifest itself diffs that against the parent
  * snapshot to decide the form: a delta when the diff is smaller than
  * the table and the chain since the last checkpoint is shorter than
  * [[StoreManifest.CheckpointEvery]]; a checkpoint otherwise (first
  * publish, whole-table rewrites, cadence rollover). Reading folds
  * checkpoint + delta suffix. Per-commit manifest bytes therefore
  * scale with the MUTATION, not the table — the measured O(files)
  * publish cost at 10⁶ files (SCALE.md "Manifest publish cost") drops
  * to O(delta) for the flush/compactDate/expire cadence that dominates
  * at 100 TB — while planning stays one LIST + cached GETs (each
  * generation file is immutable, so parses are memoized by
  * name/size/mtime and a warm planner re-GETs nothing).
  *
  * Format-compat contract: the delta-log form (and the optional
  * `info` audit line) is FORWARD-only — a pre-round-18 binary cannot
  * read `.delta` generations or info-bearing bodies (its self-count
  * rejects them whole and it degrades to listing mode). Single-
  * engine-version deployments are assumed, the same contract as
  * Delta's writer-version features; the NEW code reads every older
  * on-disk form forever (plain checkpoints, info-less bodies).
  *
  * Snapshot-isolation contract (round-16, unchanged): the manifest
  * generation IS the commit point for every layout mutation. Rewrites
  * land in immutable `_gen-*` trees and become visible only when a new
  * generation referencing them publishes (single temp-write + rename —
  * the SAME rename atom whichever form the body takes); files a
  * mutation supersedes are never deleted inline — they are recorded as
  * tombstones IN the new generation (atomically visible with the
  * entries that replace them) and reclaimed later by
  * [[ParquetStore.vacuum]] once a grace window has passed. A reader
  * that planned from generation G therefore holds `FileStatus`es for
  * files that remain on disk until G's successors are at least the
  * grace window old — a query can overlap a compaction in another
  * session (the Iceberg/Delta discipline). [[publish]] retains the
  * newest [[StoreManifest.KeepGens]] generations PLUS every older file
  * their delta chains fold through (corruption insurance: [[read]]
  * falls back newest→oldest to the first generation that folds whole);
  * vacuum prunes retained generations past the grace window,
  * chain-aware the same way.
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

  import StoreManifest.{CheckpointEvery, Dead, Entry, KeepGens, Snapshot}

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

  // ---- raw generation bodies (parse layer) ----

  /** One parsed generation FILE, before chain folding: a checkpoint
    * carries the absolute state, a delta carries one commit's patch
    * plus its required parent pointer. Both carry the ABSOLUTE schema
    * state (a publisher that no longer knows the exact schema writes
    * none, and readers must drop to footer inference — expire's
    * drifted-column contract).
    */
  private sealed trait RawGen
  private final case class FullGen(parent: Option[String],
      entries: Seq[Entry],
      schema: Option[org.apache.spark.sql.types.StructType],
      dead: Seq[Dead], info: Option[String]) extends RawGen
  private final case class DeltaGen(parent: String,
      schema: Option[org.apache.spark.sql.types.StructType],
      adds: Seq[Entry], drops: Seq[String],
      deadPlus: Seq[Dead], deadMinus: Seq[String],
      info: Option[String]) extends RawGen

  /** Immutable-file parse memo: generation files are written once via
    * temp+rename and never modified, so a parse keyed by
    * (name, size, mtime) stays valid for the file's lifetime — a warm
    * planner's readState re-GETs nothing, and the delta chain costs
    * one LIST however often the table is planned. The size/mtime key
    * (not name alone) keeps spec-style in-place corruption visible.
    */
  private val parseMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Long, Long), Option[RawGen]]
  private val parseMemoEntries = new java.util.concurrent.atomic.AtomicLong
  private val parseMemoLargest = new java.util.concurrent.atomic.AtomicLong

  private def parseRaw(st: FileStatus): Option[RawGen] = {
    // bound the memo two ways: by FILE count (a cadence-committing
    // engine publishes every flush; months of cadences must not pin
    // every checkpoint ever retained) and by cumulative cached ENTRY
    // count — at the 100 TB tier one checkpoint's parse holds ~10⁶
    // Entry objects (~150 MB), so a count-only cap would admit
    // gigabytes. The entry bound scales with the largest single item:
    // one checkpoint of a huge table legitimately exceeds the static
    // cap on its own, and clearing the irreducible working head (the
    // chain's one checkpoint + its tiny deltas) on every parse would
    // re-gunzip the multi-MB body per plan — so a reset fires only
    // once a SECOND item of that magnitude accumulates. The working
    // set re-read after a reset is the current chain + retained heads
    // (≤ KeepGens + CheckpointEvery files).
    // (transiently up to cap + one item before the NEXT call's check
    // fires — the cap bounds steady state, not a single insert).
    // largest resets with the cache so a table compacted DOWN a tier
    // re-learns its working size instead of keeping the historical
    // high-water cap forever.
    val entryCap = math.max(StoreManifest.MemoEntryCap,
      2L * parseMemoLargest.get)
    if (parseMemo.size > StoreManifest.ParseMemoCap ||
        parseMemoEntries.get > entryCap) {
      parseMemo.clear()
      parseMemoEntries.set(0)
      parseMemoLargest.set(0)
    }
    parseMemo.getOrElseUpdate(
      (st.getPath.getName, st.getLen, st.getModificationTime), {
        val parsed = parseRawUncached(st.getPath)
        val n = parsed match {
          case Some(f: FullGen) => f.entries.size.toLong
          case Some(d: DeltaGen) => d.adds.size.toLong
          case None => 0L
        }
        parseMemoEntries.addAndGet(n): Unit
        parseMemoLargest.getAndAccumulate(n, math.max(_, _)): Unit
        parsed
      })
  }

  private def parseRawUncached(p: Path): Option[RawGen] = {
    try {
      val in = fs.open(p)
      val raw = try in.readAllBytes() finally in.close()
      // gzip-sniff (magic 1f 8b): checkpoints compress ~13× (shared
      // path prefixes), legacy plain bodies and the small deltas stay
      // uncompressed — both forms must read forever. A TRUNCATED gzip
      // body throws (missing CRC trailer) into the catch below, the
      // same whole-generation rejection a torn plain count gets.
      // readAllBytes grows its own buffer — no presize arithmetic to
      // overflow, and one fewer O(body) copy per uncached parse.
      val body =
        if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
            (raw(1) & 0xff) == 0x8b) {
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw), 64 * 1024)
          try new String(gz.readAllBytes(), StandardCharsets.UTF_8)
          finally gz.close()
        } else new String(raw, StandardCharsets.UTF_8)
      val lines = body.split("\n", -1).toSeq.dropRight(1)
      lines.headOption.flatMap { h =>
        if (h.startsWith("count=")) parseFull(h, lines.drop(1))
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

  /** The full-list body: `count=N` (entry lines only — they come
    * last, so a torn suffix always breaks the count), optional
    * `parent`, optional `schema`, optional `info` (the operation that
    * published this generation — audit metadata, opaque here), `dead`
    * lines, entry lines. Pre-round-18 bodies simply lack the optional
    * lines.
    */
  private def parseFull(h: String, rest: Seq[String]): Option[RawGen] = {
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
    val (deadLines, entryLines) = afterInfo.span(_.startsWith("dead\t"))
    if (!h.stripPrefix("count=").toIntOption.contains(entryLines.size))
      None
    else {
      val schema = schemaJson.map(parseSchema)
      val dead = deadLines.map(l => parseDead(l.stripPrefix("dead\t")))
      val entries = entryLines.map(parseEntry)
      if (entries.forall(_.isDefined) && dead.forall(_.isDefined))
        Some(FullGen(parentName, entries.flatten, schema, dead.flatten,
          info))
      else None
    }
  }

  /** One commit's patch: `delta=N` counts EVERY following line (any
    * torn suffix breaks it — deltas can be adds-free, so an entry-only
    * count would miss a truncation through the tombstone lines),
    * required `parent`, optional `schema` (ABSOLUTE state), optional
    * `info` (operation audit), then `del` / `dead-` / `dead+` /
    * `add` lines.
    */
  private def parseDelta(h: String, rest: Seq[String]): Option[RawGen] = {
    if (!h.stripPrefix("delta=").toIntOption.contains(rest.size))
      return None
    val parentName = rest.headOption
      .filter(_.startsWith("parent\t")).map(_.stripPrefix("parent\t"))
    if (parentName.isEmpty) return None // a delta without a parent is torn
    val afterParent = rest.drop(1)
    val schemaJson = afterParent.headOption
      .filter(_.startsWith("schema\t")).map(_.stripPrefix("schema\t"))
    val afterSchema = if (schemaJson.isDefined) afterParent.drop(1)
      else afterParent
    val info = afterSchema.headOption
      .filter(_.startsWith("info\t")).map(_.stripPrefix("info\t"))
    val afterInfo = if (info.isDefined) afterSchema.drop(1)
      else afterSchema
    try {
      val schema = schemaJson.map(parseSchema)
      val drops = scala.collection.mutable.ArrayBuffer.empty[String]
      val deadMinus = scala.collection.mutable.ArrayBuffer.empty[String]
      val deadPlus = scala.collection.mutable.ArrayBuffer.empty[Option[Dead]]
      val adds = scala.collection.mutable.ArrayBuffer.empty[Option[Entry]]
      var malformed = false
      afterInfo.foreach {
        case l if l.startsWith("del\t") => drops += l.stripPrefix("del\t")
        case l if l.startsWith("dead-\t") =>
          deadMinus += l.stripPrefix("dead-\t")
        case l if l.startsWith("dead+\t") =>
          deadPlus += parseDead(l.stripPrefix("dead+\t"))
        case l if l.startsWith("add\t") =>
          adds += parseEntry(l.stripPrefix("add\t"))
        case _ => malformed = true
      }
      if (malformed || deadPlus.exists(_.isEmpty) || adds.exists(_.isEmpty))
        None
      else Some(DeltaGen(parentName.get, schema, adds.toSeq.flatten,
        drops.toSeq, deadPlus.toSeq.flatten, deadMinus.toSeq, info))
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

  // ---- chain folding (snapshot layer) ----

  private def genStatuses(): Map[String, FileStatus] =
    StoreFs.list(fs, mdir).filter(_.getPath.getName.startsWith("gen-"))
      .map(s => s.getPath.getName -> s).toMap

  /** Fold one generation's chain into its absolute snapshot: a
    * checkpoint IS its snapshot; a delta patches its parent's fold.
    * None when this generation — or ANY link its chain needs — is
    * missing, torn or cyclic: half a chain must read as no chain, the
    * same all-or-nothing contract a torn full list has. `statuses`
    * comes from the ONE listing the calling read performed, so folding
    * costs zero extra filesystem calls when the parse memo is warm.
    * Iterative one-pass application (collect the chain, patch one
    * keyed map, sort ONCE): a per-link rebuild of a 10⁵-entry list
    * would make planning O(files × depth) in memory — measured 10×
    * the checkpoint-read cost at depth 9 — for no semantic gain.
    */
  /** Folded-snapshot memo, HEAD-keyed by (name, size, mtime): chain
    * files are immutable (temp-write + rename, never modified), so a
    * head's fold is valid as long as the head file itself is — the
    * planning read before a mutation and the mutation's own
    * parent-fold then share one fold instead of paying the O(files)
    * assembly twice (measured 1.2 s each at 10⁶ entries). Tightly
    * capped: each cached snapshot holds a full entry list.
    */
  private val foldMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Long, Long), Option[Snapshot]]
  private val foldMemoEntries = new java.util.concurrent.atomic.AtomicLong
  private val foldMemoLargest = new java.util.concurrent.atomic.AtomicLong

  private def fold(name: String,
      statuses: Map[String, FileStatus]): Option[Snapshot] =
    statuses.get(name) match {
      case None => None
      case Some(st) =>
        // double cap like parseMemo's: each cached fold holds a FULL
        // entry list, so 16 heads of a million-file table would be
        // ~2.4 GB under a count-only bound. Scaled by the largest
        // single fold for the same reason as parseMemo's — the one
        // working head must stay cached however large the table.
        val entryCap = math.max(StoreManifest.MemoEntryCap,
          2L * foldMemoLargest.get)
        if (foldMemo.size > 16 || foldMemoEntries.get > entryCap) {
          foldMemo.clear()
          foldMemoEntries.set(0)
          foldMemoLargest.set(0)
        }
        foldMemo.getOrElseUpdate(
          (name, st.getLen, st.getModificationTime), {
            val snap = foldUncached(name, statuses)
            snap.foreach { s =>
              foldMemoEntries.addAndGet(s.entries.size.toLong): Unit
              foldMemoLargest.getAndAccumulate(
                s.entries.size.toLong, math.max(_, _)): Unit
            }
            snap
          })
    }

  private def foldUncached(name: String,
      statuses: Map[String, FileStatus]): Option[Snapshot] = {
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
    val deadMap = scala.collection.mutable.LinkedHashMap
      .from(fg.dead.map(d => d.rel -> d))
    var schema = fg.schema
    chain.dropRight(1).reverseIterator.foreach {
      case (_, d: DeltaGen) =>
        d.drops.foreach(entryMap.remove(_): Unit)
        d.adds.foreach(e => entryMap(e.rel) = e)
        d.deadMinus.foreach(deadMap.remove(_): Unit)
        d.deadPlus.foreach(x => deadMap(x.rel) = x)
        schema = d.schema // ABSOLUTE per commit, like a checkpoint's
      case _ => // unreachable: only the chain tail is a FullGen
    }
    val (parent, headInfo) = chain.head._2 match {
      case d: DeltaGen => (Some(d.parent), d.info)
      case f: FullGen => (f.parent, f.info)
    }
    Some(Snapshot(name, parent,
      entryMap.values.toSeq.sortBy(_.rel), schema,
      deadMap.values.toSeq, depth = chain.size - 1, info = headInfo))
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

  /** Every file name needed to fold ANY of the given heads (vacuum's
    * and retention's keep-set).
    */
  private[graft] def neededFor(heads: Seq[String]): Set[String] = {
    val statuses = genStatuses()
    heads.flatMap(chainNames(_, statuses)).toSet
  }

  // ---- publish (commit layer) ----

  /** Publish a new generation carrying the ABSOLUTE intended state:
    * the complete live-file list, the merged data schema when the
    * publisher knows it, and the cumulative tombstone list (files
    * superseded but not yet vacuumed). The manifest diffs that state
    * against the parent snapshot and writes a DELTA file when the diff
    * is small and the chain short, a full CHECKPOINT otherwise —
    * either way the temp-write + single-file rename is the atomic
    * commit point, and the self-count plus per-line field checks
    * reject a torn body on read. Prior generations are retained
    * (newest [[StoreManifest.KeepGens]] heads plus their chains) so a
    * corrupt latest degrades to the previous consistent snapshot
    * instead of a tree walk.
    */
  def publish(entries: Seq[Entry],
      schema: Option[org.apache.spark.sql.types.StructType],
      dead: Seq[Dead], parent: Option[String],
      info: Option[String] = None): Unit = {
    // rel first so sorted lines sort by path; size + mtime ride along
    // so reads can hand Spark complete FileStatuses and plan with ZERO
    // filesystem calls (see [[ManifestFileIndex]]). The merged data
    // schema (when the publisher knows it — compact just wrote every
    // file from one DataFrame) rides as a single JSON line, so reads
    // skip per-file footer inference entirely.
    val normSchema = schema.map(StoreManifest.allNullable)
    val parentSnap = parent.flatMap(p => fold(p, genStatuses()))
    val (body, ext) = parentSnap match {
      case Some(ps) if ps.depth + 1 < CheckpointEvery =>
        // presized java maps: the diff runs once per commit over the
        // FULL entry lists, and an immutable .toMap of 10⁶ tuples was
        // the measured bulk of a 1M-file delta publish
        def byRel(es: Seq[Entry]): java.util.HashMap[String, Entry] = {
          val m = new java.util.HashMap[String, Entry](es.size * 2)
          es.foreach(e => m.put(e.rel, e))
          m
        }
        val pByRel = byRel(ps.entries)
        val nByRel = byRel(entries)
        // full-Entry comparison: a rel whose size/mtime changed (a
        // re-walked legacy file) re-publishes as drop+add so folds
        // carry the fresh FileStatus
        val adds = entries.filter(e => pByRel.get(e.rel) != e)
        val drops = ps.entries.collect {
          case e if nByRel.get(e.rel) != e => e.rel }
        val pDead = ps.dead.map(d => d.rel -> d).toMap
        val nDead = dead.map(d => d.rel -> d).toMap
        val deadPlus = dead.filter(d => !pDead.get(d.rel).contains(d))
        val deadMinus = ps.dead.collect {
          case d if !nDead.get(d.rel).contains(d) => d.rel }
        val patchLines = adds.size + drops.size +
          deadPlus.size + deadMinus.size
        if (patchLines >= math.max(1, entries.size)) (None, ".list")
        else {
          val schemaLine = normSchema.toSeq.map(s => s"schema\t${s.json}")
          val infoLine = infoLineOf(info)
          val lines = s"parent\t${parent.get}" +: (schemaLine ++
            infoLine ++
            drops.sorted.map(r => s"del\t$r") ++
            deadMinus.sorted.map(r => s"dead-\t$r") ++
            deadPlus.map(d => s"dead+\t${d.rel}\t${d.millis}")
              .sorted ++
            adds.map(e => s"add\t${e.rel}\t${e.size}\t${e.mtime}")
              .sorted)
          (Some((s"delta=${lines.size}" +: lines).iterator), ".delta")
        }
      case _ => (None, ".list") // first publish, deep chain, or the
                                // parent no longer folds → checkpoint
    }
    val bodyLines = body.getOrElse {
      // the line SEQ must exist for the sort, but nothing bigger: the
      // write below streams it, so no 77 MB concatenated body string /
      // byte array / compression buffer ever materializes (three
      // O(files) driver allocations at the 10⁶-file tier)
      val lines = entries.map(e => s"${e.rel}\t${e.size}\t${e.mtime}")
      val parentLine = parent.toSeq.map(p => s"parent\t$p")
      val schemaLine = normSchema.toSeq.map(s => s"schema\t${s.json}")
      val deadLines = dead.map(d => s"dead\t${d.rel}\t${d.millis}")
      Iterator(s"count=${lines.size}") ++ parentLine ++ schemaLine ++
        infoLineOf(info) ++ deadLines.sorted ++ lines.sorted
    }
    commitBody(bodyLines, ext, parent)
  }

  /** The shared commit tail both publish forms go through: stream the
    * body into a temp file (gzip for checkpoints), expected-parent
    * CAS, the rename atom, post-rename conflict rollback, retention.
    */
  private def commitBody(bodyLines: Iterator[String], ext: String,
      parent: Option[String]): Unit = {
    fs.mkdirs(mdir): Unit
    val uuid = java.util.UUID.randomUUID().toString
    val tmp = new Path(mdir, s".tmp-$uuid")
    // checkpoints gzip (the O(files) body is ~90% shared path/digit
    // prefixes — measured ~13× smaller, and the CRC trailer makes a
    // torn body loudly unreadable); deltas stay plain text: they are
    // hundreds of bytes, and a greppable commit log is worth more
    // than the ~300 saved. BEST_SPEED: at 10⁶ entries the default
    // level's extra ratio is not worth tripling the compress wall on
    // every cadence rollover. Lines stream straight through the
    // (optionally gzip) writer into the temp file.
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
    // retain the newest KeepGens generation HEADS plus every older
    // file their delta chains fold through (best effort; readers take
    // the newest FOLDABLE head, so a failed delete costs bytes, not
    // truth). Age-based pruning beyond this is vacuum's job.
    val statuses = genStatuses()
    val heads = statuses.keys.toSeq.sorted.takeRight(KeepGens)
    val keep = heads.flatMap(chainNames(_, statuses)).toSet
    statuses.keys.filterNot(keep).foreach(n =>
      fs.delete(new Path(mdir, n), false): Unit)
  }

  /** Patch-shaped publish — O(delta) CPU per commit, the form the
    * store's own mutations use: they KNOW their deltas (the date they
    * rewrote, the files they retired, the tombstones they reclaimed),
    * so re-deriving the patch by diffing two full entry lists — the
    * absolute-signature [[publish]]'s measured bulk at 10⁶ files — is
    * pure waste on the flush/maintenance cadence. Writes a `.delta`
    * directly from the caller's patch when the chain is short; folds
    * the parent and writes the absolute checkpoint on cadence
    * rollover, or when the patch rivals the table's size (same
    * size heuristic as the absolute form, parent size approximated
    * from the raw chain's counts — the choice is cosmetic, both forms
    * fold identically). `schema` carries the same ABSOLUTE semantics
    * as a delta body's schema line (None = readers fall back to
    * footer inference — expire's drifted-column contract). Same CAS +
    * rename atom + rollback + retention as [[publish]]. Requires a
    * parent by construction: a first publish has no delta to speak
    * of. Throws IllegalStateException when the parent no longer folds
    * at rollover time (the caller's planning snapshot is gone —
    * re-plan, like a CAS failure).
    */
  def publishPatch(adds: Seq[Entry], drops: Seq[String],
      deadPlus: Seq[Dead], deadMinus: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType],
      parent: String, info: Option[String] = None): Unit = {
    val normSchema = schema.map(StoreManifest.allNullable)
    val statuses = genStatuses()
    // raw-chain walk (memoized parses, no entry fold): depth for the
    // rollover decision and an approximate parent size for the
    // delta-vs-checkpoint heuristic
    val chain = chainNames(parent, statuses)
    val chainRaws = chain.flatMap(n => statuses.get(n).flatMap(parseRaw))
    val chainWhole = chainRaws.size == chain.size &&
      chainRaws.lastOption.exists(_.isInstanceOf[FullGen])
    val depth = chain.size - 1
    // what a checkpoint would cost ≈ the RESULTING table's size (the
    // same yardstick the absolute form uses); approximated from the
    // raw chain's counts — adds that overwrite and drops of absent
    // rels skew it, but the choice is cosmetic: both forms fold
    // identically
    val approxNewSize = chainRaws.map {
      case f: FullGen => f.entries.size.toLong
      case d: DeltaGen => (d.adds.size - d.drops.size).toLong
    }.sum + adds.size - drops.size
    val patchLines = adds.size + drops.size +
      deadPlus.size + deadMinus.size
    if (chainWhole && depth + 1 < CheckpointEvery &&
        patchLines < math.max(1L, approxNewSize)) {
      val lines = s"parent\t$parent" +:
        (normSchema.toSeq.map(s => s"schema\t${s.json}") ++
          infoLineOf(info) ++
          drops.sorted.map(r => s"del\t$r") ++
          deadMinus.sorted.map(r => s"dead-\t$r") ++
          deadPlus.map(d => s"dead+\t${d.rel}\t${d.millis}").sorted ++
          adds.map(e => s"add\t${e.rel}\t${e.size}\t${e.mtime}").sorted)
      commitBody((s"delta=${lines.size}" +: lines).iterator, ".delta",
        Some(parent))
    } else {
      // rollover (or outsized patch / broken chain): fold the parent
      // once — the amortized O(table) the cadence pays every
      // CheckpointEvery commits — apply the patch, checkpoint
      val ps = fold(parent, statuses).getOrElse(throw new
        IllegalStateException(s"$tableDir: publishPatch parent " +
          s"$parent no longer folds — re-plan and retry"))
      val entryMap = scala.collection.mutable.LinkedHashMap
        .from(ps.entries.map(e => e.rel -> e))
      drops.foreach(entryMap.remove(_): Unit)
      adds.foreach(e => entryMap(e.rel) = e)
      val deadMap = scala.collection.mutable.LinkedHashMap
        .from(ps.dead.map(d => d.rel -> d))
      deadMinus.foreach(deadMap.remove(_): Unit)
      deadPlus.foreach(d => deadMap(d.rel) = d)
      val lines = entryMap.valuesIterator
        .map(e => s"${e.rel}\t${e.size}\t${e.mtime}").toSeq
      val deadLines = deadMap.valuesIterator
        .map(d => s"dead\t${d.rel}\t${d.millis}").toSeq
      commitBody(
        Iterator(s"count=${lines.size}", s"parent\t$parent") ++
          normSchema.toSeq.map(s => s"schema\t${s.json}") ++
          infoLineOf(info) ++ deadLines.sorted ++ lines.sorted,
        ".list", Some(parent))
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

  /** One SPECIFIC retained generation's snapshot (time travel: its
    * data files live until vacuum's grace passes). None when the name
    * is gone, the body fails the self-checks, or its delta chain lost
    * a link.
    */
  def readGen(name: String): Option[Snapshot] =
    if (!name.startsWith("gen-")) None
    else fold(name, genStatuses())

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
    * rather than to half a snapshot; a delta whose chain lost a link
    * is rejected the same all-or-nothing way.
    */
  def read(): Option[Snapshot] = readState()._1

  /** [[read]] plus the current dirty markers, resolved from ONE
    * `_manifest` listing — the planning state every read and mutation
    * starts from (two separate calls would double the metadata LIST
    * bill on the hot path). Folding the newest head's delta chain
    * costs no further filesystem calls once the immutable-file parse
    * memo is warm.
    */
  def readState(): (Option[Snapshot], Seq[String]) = {
    val names = StoreFs.list(fs, mdir)
    val dirty = names.map(_.getPath.getName).filter(_.startsWith("dirty-"))
    val statuses = names.filter(_.getPath.getName.startsWith("gen-"))
      .map(s => s.getPath.getName -> s).toMap
    val heads = statuses.keys.toSeq.sorted(Ordering[String].reverse)
    (heads.iterator.flatMap(fold(_, statuses)).nextOption(), dirty)
  }

  /** Every retained readable generation, newest first (vacuum's
    * reference set: a tree referenced by ANY retained generation is
    * not an orphan).
    */
  def readAll(): Seq[Snapshot] = {
    val statuses = genStatuses()
    statuses.keys.toSeq.sorted(Ordering[String].reverse)
      .flatMap(fold(_, statuses))
  }

  /** Whether a readable manifest generation is present (specs/gates). */
  def present: Boolean = read().isDefined
}

object StoreManifest {
  /** Generation HEADS retained by [[StoreManifest.publish]] (plus the
    * chain files each head's fold needs): newest is the truth, older
    * ones are corruption insurance and the snapshot-isolation window's
    * metadata (their data files live until vacuum's grace passes).
    */
  val KeepGens: Int = 3

  /** Checkpoint cadence: a publish whose parent chain has already
    * grown this long folds the chain into a full `.list` checkpoint
    * instead of appending another delta — bounding both the fold
    * depth a read pays and the file count retention must keep.
    * Ten is Delta Lake's own default ratio of commits per checkpoint
    * neighborhood at this metadata scale: deltas stay a few hundred
    * bytes for flush-sized commits, so a chain of ten costs less to
    * read than one extra full list costs to write per commit.
    */
  val CheckpointEvery: Int = 10

  /** Fold-depth guard: no legal chain exceeds [[CheckpointEvery]], so
    * anything past this is a corrupt/cyclic parent graph and the fold
    * rejects it rather than spinning.
    */
  private[store] val MaxChain: Int = 64

  /** Parse-memo bound: comfortably above the live working set
    * (KeepGens heads + one chain ≤ ~13 files) so steady-state reads
    * never evict, while a months-long cadence can't pin every
    * checkpoint ever published.
    */
  private[store] val ParseMemoCap: Int = 64

  /** Cumulative cached-ENTRY bound shared by both memos' overflow
    * checks: ~4M entries ≈ 600 MB of cached metadata at most, i.e. a
    * few checkpoints of a million-file table — enough for the live
    * working set (one chain's checkpoint + KeepGens folds), small
    * enough that time-traveling across many retained generations of a
    * huge table cycles the cache instead of exhausting the driver
    * heap.
    */
  private[store] val MemoEntryCap: Long = 4L * 1000L * 1000L

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

  /** One manifest generation's FOLDED state: its own file name, the
    * parent generation it committed over (None = first ever), the
    * complete live-file list, the merged data schema when the
    * publishing operation knew it, the cumulative not-yet-vacuumed
    * tombstones, and the delta-chain depth since the last checkpoint
    * (0 = this file IS a checkpoint — what the publish cadence
    * rolls over on). The recorded parent makes each generation's
    * lineage auditable and is what the expected-parent CAS in
    * [[StoreManifest.publish]] verifies. `info` is this generation's
    * OWN operation-audit string (the Delta commitInfo idea —
    * `{"op":"compact",…}`), not folded through the chain: each
    * commit describes itself.
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
