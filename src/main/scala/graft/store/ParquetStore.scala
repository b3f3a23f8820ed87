package graft.store

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Cold storage: time-partitioned parquet per table
  * (reference: duo/src/partition/writer.rs:22-63, reader
  * duo/src/partition/query.rs:28-78).
  *
  * Spark-first deviations (SURVEY §2.1 S2/S3, §4):
  *  - rows are partitioned by their OWN event time
  *    (`date=…/hour=…/minute=…` hive layout via partitionBy), not by the
  *    flush wall-clock minute — so partition pruning is correct even for
  *    late data, which the reference's layout gets wrong.
  *  - reads go through one root path with partition-column predicates;
  *    Catalyst prunes directories (replacing the manual prefix listing,
  *    kept as [[readPrefixes]] for the non-hive layout).
  *  - a parquet bloom filter on trace_id is written, matching the
  *    reference's bloom pruning for trace lookups
  *    (duo/src/partition/writer.rs:45-49).
  *
  * Storage portability (S5, duo/src/config.rs:69-132): every metadata
  * operation — existence probes, staging moves, the swap/recover
  * discipline, prefix listings — runs on `org.apache.hadoop.fs
  * .FileSystem` resolved from the ROOT's scheme ([[StoreFs]]), so the
  * same store code serves a local path, an HDFS URI, or an
  * `s3a://bucket/...` root. Compaction's promote swap never relies on
  * atomic directory rename: it runs as marker-driven idempotent phases
  * ([[swapM1]]) that [[recover]] resumes, so an object-store rename
  * torn mid-tree (per-object copy+delete) costs a retry, never rows —
  * pinned by the torn-rename FileSystem spec.
  *
  * At scale: minute-grained dirs are only sensible for recent data; the
  * same layout compacts upward (minute→hour→day files) without changing
  * readers because pruning is on column predicates, not path strings.
  */
final class ParquetStore(spark: SparkSession, root: String, table: String,
    timeCol: String,
    bloomNdv: Long = ParquetStore.DefaultBloomNdv) {

  private def dir = s"$root/$table"

  /** One FileSystem handle per store, resolved from the root's scheme
    * (Hadoop caches instances per scheme+authority, so this is the
    * same object Spark's own parquet source uses for the data files).
    */
  private val fs: FileSystem = StoreFs.fs(new Path(s"$root/$table"))

  private def ls(p: Path): Seq[FileStatus] = StoreFs.list(fs, p)

  /** Listing-free read planning for the partitioned tree (see
    * [[StoreManifest]]): invalidated before every mutation, rebuilt by
    * the layout-owning operations (compact/compactDate/expire), reads
    * fall back to listing whenever absent.
    */
  private val manifest = new StoreManifest(fs, dir)

  /** Whether reads currently plan from the manifest (specs/gates). */
  def manifestPresent: Boolean = manifest.present

  /** The manifest's relative data-file paths (specs). */
  private[graft] def manifestFiles: Option[Seq[String]] =
    manifest.read().map(_.entries.map(_.rel))

  /** The manifest's recorded merged data schema (specs). */
  private[graft] def manifestSchema
      : Option[org.apache.spark.sql.types.StructType] =
    manifest.read().flatMap(_.schema)

  /** Recursive delete (no-op when absent). */
  private def rm(p: Path): Unit = { fs.delete(p, true): Unit }

  /** Append a batch, deriving partition columns from the row's µs
    * epoch time column. A flush whose rows span D time partitions
    * across T tasks writes up to D×T files — batches with a WIDE
    * event-time spread should land through [[writeStaged]] instead
    * (flat append now, [[compact]] owns the layout); this direct
    * partitioned write is for the common observability case where a
    * flush touches the current few minutes.
    */
  def write(batch: DataFrame): Unit = {
    // invalidate-then-mutate: a crash mid-append leaves NO manifest
    // (readers fall back to listing), never one missing the new files.
    // Direct appends do not rebuild — a full-walk per minute-flush
    // would defeat the append; the next compact() re-publishes.
    manifest.invalidate()
    batch
      .withColumn("__ts", timestamp_micros(col(timeCol)))
      .withColumn("date", date_format(col("__ts"), "yyyy-MM-dd"))
      .withColumn("hour", date_format(col("__ts"), "HH"))
      .withColumn("minute", date_format(col("__ts"), "mm"))
      .drop("__ts")
      // co-locate each partition dir's rows in one task before the
      // dynamic-partition write: without this every task writes every
      // dir it touches, so a T-task flush spanning D minutes lands up
      // to T×D files (measured: a 60-minute-spread flush from a
      // 32-partition batch wrote ~1,900 one-KB files and every later
      // read paid the listing). The exchange is bounded by the flush
      // batch — the store's write unit — and yields exactly one file
      // per touched partition dir.
      .repartition(col("date"), col("hour"), col("minute"))
      .write
      .mode("append")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .option("parquet.bloom.filter.expected.ndv#trace_id",
        bloomNdv.toString)
      .partitionBy("date", "hour", "minute")
      .parquet(dir)
  }

  def exists: Boolean = fs.exists(new Path(dir))

  private def stagingDir = s"$dir/_staging"

  /** Fast append for flushes whose EVENT-TIME spread would explode the
    * hive layout into thousands of tiny partition files — a streamed
    * ingest's cadenced flushes or a historical backfill (the w11
    * measurement: 2 flushes of a 7-year-spread span feed through
    * [[write]] = ~3,500 files and a 41 s sink). The batch lands as
    * plain unpartitioned files under `_staging` — an
    * underscore-prefixed subtree, so the partitioned reader's
    * discovery never sees it — with NO shuffle and no layout cost;
    * [[read]] unions staged rows in (with the same time predicate —
    * row-level pruning still applies, only directory pruning is
    * deferred), and [[compact]] drains staging into the partitioned
    * layout. This is the LSM-shaped ingest split every real columnar
    * store uses: land fast now, organize in the background.
    */
  def writeStaged(batch: DataFrame): Unit =
    batch.write.mode("append")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .option("parquet.bloom.filter.expected.ndv#trace_id",
        bloomNdv.toString)
      .parquet(stagingDir)

  /** The snapshot tree a running [[compact]] folds in: staged files are
    * MOVED here (atomic per-file renames) when a compaction starts, so
    * flushes landing in `_staging` afterwards are cleanly "late" — they
    * survive the swap instead of being deleted with the old tree (the
    * lost-flush window the lazy snapshot had). Underscore-prefixed like
    * `_staging`, so partitioned discovery never sees it.
    */
  private def compactingDir = s"$dir/_staging_compacting"

  /** Move every parquet file under `from` into `to` (per-file renames;
    * both under the same table root, so rename never crosses
    * filesystems — on a local/HDFS root it never copies, on an object
    * store it is the per-file copy+delete the LSM drain amortizes).
    */
  private def moveFiles(from: Path, to: Path): Unit = {
    val files = ls(from)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (files.nonEmpty) fs.mkdirs(to): Unit
    files.foreach { f =>
      val name = f.getPath.getName
      var dest = new Path(to, name)
      // a dest with the SAME name and size is this very file,
      // re-encountered when an interrupted move is resumed (part names
      // carry a job UUID, so two distinct files cannot share one) —
      // drop the source instead of duplicating its rows
      if (fs.exists(dest) && fs.getFileStatus(dest).getLen == f.getLen) {
        fs.delete(f.getPath, false): Unit
      } else {
        // any OTHER collision is pathological — but a silent overwrite
        // would drop rows
        var i = 0
        while (fs.exists(dest)) { i += 1; dest = new Path(to, s"dup$i-$name") }
        if (!fs.rename(f.getPath, dest))
          throw new java.io.IOException(
            s"moveFiles: ${f.getPath} -> $dest failed")
      }
    }
    // Remove only what this move owns: writer metadata (_SUCCESS,
    // checksum files) and then the dir IF nothing else remains. A
    // `_temporary` tree from a concurrent writeStaged commit — or any
    // entry we don't recognize — means the dir is still someone else's;
    // deleting it out from under them would eat their in-flight flush.
    // (Compaction is serialized by contract, but the contract is now
    // enforced by leaving foreign entries alone instead of narrated.)
    ls(from)
      .filter(s => s.isFile && (s.getPath.getName == "_SUCCESS" ||
        s.getPath.getName.endsWith(".crc")))
      .foreach(s => fs.delete(s.getPath, false): Unit)
    // recursive delete is safe once the LISTING is empty: a checksumming
    // FileSystem hides its shadow .crc files from listStatus, and an
    // in-flight writer's `_temporary` tree IS listed — so an empty
    // listing means only our own checksum shadows can remain
    if (ls(from).isEmpty) rm(from)
  }

  /** Roll back an interrupted snapshot: files moved to
    * `_staging_compacting` by a compact() that never promoted belong in
    * `_staging` again (their rewrite was discarded with the staged
    * tree).
    */
  private def foldCompactingBack(): Unit = {
    val c = new Path(compactingDir)
    if (fs.exists(c)) moveFiles(c, new Path(stagingDir))
  }

  /** Recursively merge-move `src` into `dst`, with an IDEMPOTENT
    * resume contract: re-running after any interruption converges on
    * "src fully inside dst". The fast path is one directory rename
    * (atomic on local/HDFS); on a filesystem whose directory rename is
    * per-object copy+delete (object stores), a rename can return false
    * having moved PART of the tree — the merge path then walks what
    * remains: a child name already present in `dst` is the SAME child
    * re-encountered (file part-names carry job UUIDs; equal size ⇒
    * equal file ⇒ drop the source), a directory recurses, anything
    * genuinely conflicting fails loudly rather than dropping rows.
    */
  private def mergeMove(src: Path, dst: Path): Unit = {
    if (!fs.exists(src)) return
    if (!fs.exists(dst)) {
      val parent = dst.getParent
      if (parent != null && !fs.exists(parent)) fs.mkdirs(parent): Unit
      if (fs.rename(src, dst)) return
      // a false return may still have moved part of the tree — merge
      // whatever remains per child
      if (!fs.exists(src)) return
      if (!fs.exists(dst)) fs.mkdirs(dst): Unit
    }
    ls(src).foreach { st =>
      val to = new Path(dst, st.getPath.getName)
      if (st.isDirectory) mergeMove(st.getPath, to)
      else if (!fs.exists(to)) {
        if (!fs.rename(st.getPath, to))
          throw new java.io.IOException(
            s"mergeMove: ${st.getPath} -> $to failed")
      } else if (fs.getFileStatus(to).getLen == st.getLen) {
        fs.delete(st.getPath, false): Unit // the same file, already moved
      } else throw new java.io.IOException(
        s"mergeMove: $to exists with a different size than ${st.getPath}")
    }
    if (ls(src).isEmpty) rm(src)
  }

  // ---- torn-promote phase machine ----
  //
  // The swap that promotes a completed rewrite uses directory renames,
  // and on an object store a directory rename is per-object copy+delete
  // — an interruption leaves the tree SPLIT across source and
  // destination. Without extra state, a reader's recover() that finds
  // a (partial) live dir would treat the staged/old trees as stale and
  // delete rows that had already moved aside: data loss. Two root-level
  // marker files make every phase idempotent and attributable:
  //
  //   m1 ("aside in progress"): created only after the staged rewrite
  //     is COMPLETE (`_STAGED_OK`). From here the live/old trees hold
  //     nothing the rewrite lacks except late [[writeStaged]] flushes —
  //     phase 1 adopts those into the rewrite's staging and drops both
  //     trees, however a torn rename split them.
  //   m2 ("promote in progress"): created after phase 1; phase 2
  //     [[mergeMove]]s the staged tree into the live path (idempotent,
  //     tear-tolerant) and clears the markers.
  //
  // recover() resumes from whichever marker it finds, so a crash or
  // torn rename at ANY point leaves a store that reads complete.
  private def swapM1 = new Path(root, s".swap1-$table")
  private def swapM2 = new Path(root, s".swap2-$table")

  /** Phase 1: the rewrite under `stagedDir` is complete — adopt late
    * flushes from both (possibly split) old-data trees, drop them,
    * then hand off to phase 2. Idempotent.
    */
  private def finishSwapFrom1(crashAfterStep: Int = Int.MaxValue): Unit = {
    manifest.invalidate() // live tree is about to change shape
    moveFiles(new Path(stagingDir), new Path(s"$stagedDir/_staging"))
    moveFiles(new Path(s"$oldDir/_staging"), new Path(s"$stagedDir/_staging"))
    rm(new Path(dir))
    rm(new Path(oldDir))
    fs.createNewFile(swapM2): Unit
    fs.delete(swapM1, false): Unit
    if (crashAfterStep <= 3) return
    finishSwapFrom2()
  }

  /** Phase 2: old data is gone; move the staged tree (or whatever of
    * it a previous attempt left behind) into the live path. Idempotent.
    */
  private def finishSwapFrom2(): Unit = {
    manifest.invalidate()
    val live = new Path(dir)
    mergeMove(new Path(stagedDir), live)
    fs.delete(new Path(live, "_STAGED_OK"), false): Unit
    // legacy tolerance: a late flush parked under an old tree by a
    // pre-marker layout (or a crash test) is still adopted
    val lateStaging = new Path(oldDir, "_staging")
    if (fs.exists(lateStaging)) moveFiles(lateStaging, new Path(stagingDir))
    rm(new Path(oldDir))
    fs.delete(swapM2, false): Unit
    fs.delete(swapM1, false): Unit
  }

  /** The main partitioned tree / the staging tree as DataFrames, None
    * when that side holds no data yet. Schema inference doubles as the
    * distributed "any files?" probe — a driver-side walk would not
    * scale to a real store's file count.
    */
  private def tryRead(path: String): Option[DataFrame] = {
    if (!fs.exists(new Path(path))) return None
    try Some(spark.read.option("mergeSchema", "true").parquet(path))
    catch {
      // "Unable to infer schema ... It must be specified manually" —
      // the path exists but holds no parquet footers (a main tree
      // whose only child is the fresh staging dir)
      case _: org.apache.spark.sql.AnalysisException => None
    }
  }

  /** The partitioned tree as a DataFrame, planned from the manifest
    * when one is present — via [[ManifestFileIndex]], so partition
    * columns, pruning, and schema behave exactly as in the directory
    * read but NOT ONE filesystem listing happens (at an object-store
    * 100 TB that listing is thousands of rate-limited LIST calls) —
    * and from directory discovery otherwise.
    */
  private def tryReadMain(): Option[DataFrame] =
    manifest.read() match {
      case Some(snap) =>
        ManifestFileIndex.relation(spark, dir, snap.entries, snap.schema)
      case None => tryRead(dir)
    }

  /** Read with optional µs time-range pruning pushed onto the partition
    * columns; mergeSchema covers dynamic log-schema drift across files
    * (the reference's open FIXME at duo/src/partition/query.rs:72-75).
    * Partition columns are dropped after pruning so the result matches
    * the logical table schema.
    */
  def read(startUs: Option[Long], endUs: Option[Long]): Option[DataFrame] = {
    recover()
    if (!exists) return None
    val rowPred: Option[org.apache.spark.sql.Column] = (startUs, endUs) match {
      case (Some(s), Some(e)) => Some(col(timeCol).between(s, e))
      case (Some(s), None) => Some(col(timeCol) >= s)
      case (None, Some(e)) => Some(col(timeCol) <= e)
      case _ => None
    }
    val main = tryReadMain().map { base =>
      // Partition predicate at the FINEST grain the tree exposes
      // (minute → hour → date, probed from the inferred partition
      // columns so hour/day-compacted trees still prune at their own
      // grain) + exact row predicate on the time column; both push
      // down (partition pruning + parquet row-group stats). The
      // predicate is conservative (boundary partitions kept whole) and
      // the row filter is exact, so tightening the grain changes the
      // FILES READ, never the rows returned: a one-hour window over a
      // year-deep minute store plans ~60 files instead of a whole
      // day's 1,440.
      val hasHour = base.columns.contains("hour")
      val hasMinute = hasHour && base.columns.contains("minute")
      // bound values via the SAME date_format derivation the write path
      // uses (session-timezone; foldable, so partition pruning still
      // constant-folds them) — pure-UTC arithmetic here would silently
      // prune rows on non-UTC sessions, where a row's partition day
      // differs from its UTC day
      def dayStr(us: Long) =
        date_format(timestamp_micros(lit(us)), "yyyy-MM-dd")
      def hourStr(us: Long) =
        date_format(timestamp_micros(lit(us)), "HH").cast("int")
      def minStr(us: Long) =
        date_format(timestamp_micros(lit(us)), "mm").cast("int")
      def prune(us: Long, lower: Boolean): org.apache.spark.sql.Column = {
        val d = dayStr(us); val h = hourStr(us); val m = minStr(us)
        val sameDay =
          if (lower) col("date") > d else col("date") < d
        if (hasMinute) sameDay || (col("date") === d &&
          (if (lower) col("hour") > h ||
              (col("hour") === h && col("minute") >= m)
           else col("hour") < h ||
              (col("hour") === h && col("minute") <= m)))
        else if (hasHour) sameDay || (col("date") === d &&
          (if (lower) col("hour") >= h else col("hour") <= h))
        else if (lower) col("date") >= d
        else col("date") <= d
      }
      val pruned = (startUs, endUs) match {
        case (Some(s), Some(e)) =>
          base.where(prune(s, lower = true) && prune(e, lower = false) &&
            col(timeCol).between(s, e))
        case (Some(s), None) =>
          base.where(prune(s, lower = true) && col(timeCol) >= s)
        case (None, Some(e)) =>
          base.where(prune(e, lower = false) && col(timeCol) <= e)
        case _ => base
      }
      pruned.drop("date", "hour", "minute")
    }
    // staged flushes: no directory pruning yet (that is compaction's
    // job), but the row-level time predicate still pushes down onto
    // the staged files' row-group stats. A mid-compaction snapshot
    // (`_staging_compacting`) is part of the table too — its rows are
    // not in the main tree until the swap promotes the rewrite.
    val staged = Seq(stagingDir, compactingDir).flatMap(tryRead)
      .map(df => rowPred.fold(df)(df.where))
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    (main, staged) match {
      case (Some(m), Some(st)) => Some(m.unionByName(st,
        allowMissingColumns = true))
      case (m, st) => m.orElse(st)
    }
  }

  private def stagedDir = s"$root/.compact-$table"
  private def oldDir = s"$root/.old-$table"
  private def stagedMarker = new Path(stagedDir, "_STAGED_OK")

  /** Roll an interrupted [[compact]] swap forward or back so a reader
    * always finds a complete table:
    *  - live dir present → any leftover staged/old trees are stale; drop.
    *  - live missing but a FULLY staged tree exists (marker written after
    *    the staging write completed) → promote it, drop the old tree.
    *  - live missing, no complete staged tree → restore the old tree.
    * Runs before every read and compact; three file-existence checks in
    * the common case.
    */
  def recover(): Unit = {
    // torn-promote resume first: a marker means a swap was mid-flight —
    // the marker, not the live dir's existence, says whose rows the
    // (possibly split) trees hold. Without this, a live dir partially
    // emptied by a torn rename would read as "current" and the legacy
    // logic below would delete the trees holding the moved rows.
    if (fs.exists(swapM2)) finishSwapFrom2()
    else if (fs.exists(swapM1)) {
      if (fs.exists(stagedMarker)) finishSwapFrom1()
      else fs.delete(swapM1, false): Unit // no complete rewrite → legacy
    }
    val live = new Path(dir)
    val old = new Path(oldDir)
    val staged = new Path(stagedDir)
    // late flushes: live+old coexisting means a compact() promoted but
    // crashed before adopting the flushes that landed in `_staging`
    // during the rewrite (the folded snapshot sits in old's
    // `_staging_compacting`, which dies with the old tree) — move the
    // late files into the live staging tree before dropping old
    def adoptLateStaging(): Unit = {
      val lateStaging = new Path(old, "_staging")
      if (fs.exists(lateStaging))
        moveFiles(lateStaging, new Path(stagingDir))
    }
    if (fs.exists(live)) {
      if (fs.exists(staged)) rm(staged)
      if (fs.exists(old)) { adoptLateStaging(); rm(old) }
      // a snapshot whose compact() never swapped rolls back to staging
      foldCompactingBack()
    } else if (fs.exists(stagedMarker)) {
      manifest.invalidate()
      mergeMove(staged, live)
      fs.delete(new Path(live, "_STAGED_OK"), false): Unit
      if (fs.exists(old)) { adoptLateStaging(); rm(old) }
    } else if (fs.exists(old)) {
      manifest.invalidate()
      rm(staged)
      mergeMove(old, live)
      foldCompactingBack()
    }
    recoverPartitions()
  }

  /** Re-pin the partition columns to their canonical zero-padded
    * string forms before a compaction rewrite. Hive partition-value
    * type INFERENCE parses `hour=08` as the integer 8, so a naive
    * read→write round-trip renames the dir to `hour=8` — silently
    * breaking the zero-padded layout [[TimePrefix]]'s path strings
    * (readPrefixes) depend on, and leaving a table whose pre- and
    * post-compaction dirs disagree. lpad(cast(x, string), 2, '0') is
    * a fixed point for both the inferred-int and original-string
    * forms; `date` round-trips through DateType as ISO unchanged.
    */
  private def normalizePartCols(df: DataFrame): DataFrame = df
    .withColumn("date", col("date").cast("string"))
    .withColumn("hour", lpad(col("hour").cast("string"), 2, "0"))
    .withColumn("minute", lpad(col("minute").cast("string"), 2, "0"))

  private def partStagedPrefix = s".compact-$table@"
  private def partOldPrefix = s".old-$table@"

  /** [[recover]]'s per-partition pass: roll any interrupted
    * [[compactDate]] swap forward or back — same three-way logic as
    * the whole-table swap, scoped to one `date=…` dir. O(#interrupted
    * swaps), not O(partitions): only leftover temp trees are listed.
    */
  private def partSwapM(n: Int, part: String) =
    new Path(root, s".swap$n-$table@$part")

  /** [[finishSwapFrom1]]'s per-partition twin (no staging adoption —
    * the table-level `_staging` tree never lives under a date dir).
    */
  private def finishPartSwapFrom1(part: String,
      crashAfterStep: Int = Int.MaxValue): Unit = {
    manifest.invalidate()
    rm(new Path(dir, part))
    rm(new Path(root, partOldPrefix + part))
    fs.createNewFile(partSwapM(2, part)): Unit
    fs.delete(partSwapM(1, part), false): Unit
    if (crashAfterStep <= 3) return
    finishPartSwapFrom2(part)
  }

  private def finishPartSwapFrom2(part: String): Unit = {
    manifest.invalidate()
    val live = new Path(dir, part)
    mergeMove(new Path(root, partStagedPrefix + part), live)
    fs.delete(new Path(live, "_STAGED_OK"), false): Unit
    rm(new Path(root, partOldPrefix + part))
    fs.delete(partSwapM(2, part), false): Unit
    fs.delete(partSwapM(1, part), false): Unit
  }

  private def recoverPartitions(): Unit = {
    val rootP = new Path(root)
    if (!fs.exists(rootP)) return
    val names = ls(rootP).map(_.getPath.getName)
    // torn-promote resume first, same reasoning as [[recover]]'s
    // table-level prologue: the marker says whose rows the split
    // trees hold, the live dir's existence does not
    val m2p = s".swap2-$table@"; val m1p = s".swap1-$table@"
    names.filter(_.startsWith(m2p)).map(_.substring(m2p.length))
      .foreach(finishPartSwapFrom2)
    names.filter(_.startsWith(m1p)).map(_.substring(m1p.length))
      .foreach { p =>
        if (!fs.exists(partSwapM(1, p))) () // finished via its m2 above
        else if (fs.exists(new Path(
            new Path(root, partStagedPrefix + p), "_STAGED_OK")))
          finishPartSwapFrom1(p)
        else fs.delete(partSwapM(1, p), false): Unit // no rewrite → legacy
      }
    val parts = names.collect {
      case n if n.startsWith(partStagedPrefix) =>
        n.substring(partStagedPrefix.length)
      case n if n.startsWith(partOldPrefix) =>
        n.substring(partOldPrefix.length)
    }.distinct
    for (p <- parts) {
      val live = new Path(dir, p)
      val staged = new Path(rootP, partStagedPrefix + p)
      val old = new Path(rootP, partOldPrefix + p)
      val marker = new Path(staged, "_STAGED_OK")
      if (fs.exists(live)) {
        if (fs.exists(staged)) rm(staged)
        if (fs.exists(old)) rm(old)
      } else if (fs.exists(marker)) {
        mergeMove(staged, live)
        fs.delete(new Path(live, "_STAGED_OK"), false): Unit
        if (fs.exists(old)) rm(old)
      } else if (fs.exists(old)) {
        rm(staged)
        mergeMove(old, live)
      }
    }
  }

  /** Compact ONE date partition — the incremental form compaction
    * actually takes at scale: a rolling background job over
    * partitions older than the hot ingest tail, never a whole-table
    * rewrite (at 100 TB the [[compact]] full rewrite is a migration
    * tool, not a cadence). Same crash-safe swap discipline, scoped to
    * the `date=…` dir: staged rewrite + marker, live-aside, promote,
    * drop — [[recover]] rolls an interrupted swap forward or back per
    * partition. Never touches other dates or the `_staging` tree
    * (draining staging is the whole-table pass's job).
    */
  def compactDate(date: String, filesPerPartition: Int = 1,
      zorderOn: Option[(org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)] = None,
      blockSize: Option[Long] = None,
      crashAfterStep: Int = Int.MaxValue): Unit = {
    recover()
    val part = s"date=$date"
    val live = new Path(dir, part)
    if (!fs.exists(live)) return
    val staged = new Path(root, partStagedPrefix + part)
    val old = new Path(root, partOldPrefix + part)
    // basePath keeps the hour/minute partition columns; the constant
    // date column is dropped before the write and re-inferred from
    // the promoted dir name
    val base = normalizePartCols(spark.read.option("mergeSchema", "true")
        .option("basePath", dir).parquet(live.toString))
      .repartition(filesPerPartition, col("hour"), col("minute"))
    val sorted = zorderOn.fold(base) { case (x, y) =>
      base.sortWithinPartitions(col("hour"), col("minute"),
        graft.operators.Pipelines.zorderKey(x, y))
    }
    val writer = sorted.drop("date").write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .option("parquet.bloom.filter.expected.ndv#trace_id",
        bloomNdv.toString)
    blockSize.fold(writer)(b => writer
        .option("parquet.block.size", b.toString))
      .partitionBy("hour", "minute")
      .parquet(staged.toString)
    fs.createNewFile(new Path(staged, "_STAGED_OK")): Unit
    if (crashAfterStep <= 1) return
    // per-partition torn-rename-safe promote (see [[swapM1]]): aside
    // rename is best-effort, phase 1 drops both (possibly split) trees.
    // Manifest: snapshot prior entries BEFORE invalidating — only this
    // date's subtree changes, so the rebuild re-walks it alone and
    // keeps every other date's entries verbatim (a full-tree walk per
    // per-date drain would re-pay the listing bill the manifest
    // retires; on a years-deep store that is the whole cost)
    val priorEntries = manifest.read()
    manifest.invalidate()
    fs.createNewFile(partSwapM(1, part)): Unit
    fs.rename(live, old): Unit
    if (crashAfterStep <= 2) return
    finishPartSwapFrom1(part, crashAfterStep)
    if (crashAfterStep > 3) priorEntries match {
      case Some(prior) => manifest.rebuildScoped(prior, part)
      case None => manifest.rebuild()
    }
  }

  /** Compact the small files the minute-grained ingest leaves behind:
    * rewrite every (date,hour,minute) partition into `filesPerPartition`
    * files. Readers are unaffected (same hive layout, same pruning);
    * at scale this runs periodically over partitions older than the hot
    * ingest tail.
    *
    * Crash-safe swap: stage the rewrite to a temp tree and mark it
    * complete, rename live aside, promote the staged tree, then drop the
    * old tree. A crash between any two steps leaves a state [[recover]]
    * rolls to a complete table — never a missing or half-visible one.
    * `crashAfterStep` (tests only) aborts after the numbered step:
    * 1 = staged+marker written, 2 = live renamed aside, 3 = staged
    * promoted.
    */
  /** @param zorderOn optional pair of 16-bit-domain dimension columns
    *   (values clamped to [0, 65535]) to Morton-order rows by WITHIN
    *   each rewritten partition. Both dims must vary over COMPARABLE
    *   bit-ranges inside one storage partition — an absolute
    *   epoch-second x varies in only ~6 low bits inside a minute
    *   partition, so every duration bit would out-rank it and the
    *   layout degenerates to a duration sort with loose start stats
    *   (measured in StreamingWindowSpec's skip test); use
    *   ms-in-minute × capped duration-ms. The motivating pair for the
    *   span table is (start-in-partition, capped duration-ms): trace search
    *   filters on BOTH a start range and a duration range (SURVEY
    *   F9/F10, duo/src/query.rs:141-152), and a time-partitioned
    *   layout alone leaves the duration predicate scanning every
    *   row group in the admitted partitions. Z-ordering the rewrite
    *   makes per-row-group min/max stats tight in both dimensions at
    *   once, so parquet row-group pruning serves either predicate —
    *   the [[graft.operators.Pipelines.zorderKey]] layout applied to
    *   the engine's own storage (rectangle guarantee proven at p18).
    */
  /** @param blockSize optional parquet row-group target size in bytes
    *   for the rewrite — the granularity knob for min/max-stats
    *   pruning (smaller groups = tighter per-group boxes = more
    *   skippable metadata; production tunes this against footer
    *   overhead). Specs/probes set it low so a small fixture still
    *   splits into enough row groups to MEASURE skipping.
    */
  /** @param granularity target DIRECTORY granularity of the rewritten
    *   tree: "minute" (the reference's ingest layout), "hour", or
    *   "day". The minute layout is an INGEST-TIME choice, not a read
    *   contract — pruning is on column predicates, and [[TimePrefix]]
    *   already collapses fully-covered hours/days — so old data can be
    *   organized coarser: a wide event-time spread at minute grain is
    *   thousands of near-empty leaf dirs whose creation dominates the
    *   drain cost (w11's 7-year span fixture: 34-48 s measured).
    *   Reads are granularity-invariant: [[read]] prunes on `date` +
    *   the row time predicate at every level, and [[readPrefixes]]
    *   falls back to coarser dirs with an equivalent row filter.
    *   Granularity applies to the WHOLE rewrite (hive discovery
    *   requires uniform depth), so it fits stores whose main tree is
    *   compaction-owned (the [[writeStaged]]/LSM shape); a store also
    *   taking direct minute-grained [[write]]s should stay "minute".
    */
  def compact(filesPerPartition: Int = 1,
      crashAfterStep: Int = Int.MaxValue,
      zorderOn: Option[(org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)] = None,
      blockSize: Option[Long] = None,
      granularity: String = "minute"): Unit = {
    val partCols = ParquetStore.partColsFor(granularity)
    recover()
    if (!exists) return
    // SNAPSHOT the staging tree by moving its current files into
    // `_staging_compacting` (atomic renames): the rewrite folds exactly
    // that snapshot, while flushes landing in `_staging` from here on
    // are LATE — outside the rewrite, preserved across the swap below
    // (and by [[recover]] if we crash). The lazy-read form this
    // replaces deleted any flush that landed between the rewrite's
    // file-index snapshot and the swap.
    val stagingP = new Path(stagingDir)
    if (fs.exists(stagingP)) moveFiles(stagingP, new Path(compactingDir))
    val mainPart = tryReadMain()
    val stagedPart = tryRead(compactingDir)
    val mainRows = mainPart.map(_.drop("date", "hour", "minute"))
    val all = (mainRows, stagedPart) match {
      case (Some(m), Some(st)) =>
        Some(m.unionByName(st, allowMissingColumns = true))
      case (m, st) => m.orElse(st)
    }
    if (all.isEmpty) return
    // partition columns re-derived from the row's own time at the
    // TARGET granularity (the store invariant: dir values are pure
    // functions of timeCol) — one derivation path whatever mix of
    // granularities the input trees carried
    val derived0 = all.get
      .withColumn("__ts", timestamp_micros(col(timeCol)))
      .withColumn("date", date_format(col("__ts"), "yyyy-MM-dd"))
    val derived1 =
      if (partCols.contains("hour"))
        derived0.withColumn("hour", date_format(col("__ts"), "HH"))
      else derived0
    val derived =
      (if (partCols.contains("minute"))
        derived1.withColumn("minute", date_format(col("__ts"), "mm"))
      else derived1).drop("__ts")
    val base = derived
      .repartition(filesPerPartition, partCols.map(col): _*)
    // partition columns lead the sort so the writer's own
    // required-ordering (it otherwise re-sorts each task by the
    // dynamic partition keys, unstably) is already satisfied and the
    // z-order survives into the files
    val writer = zorderOn.fold(base) { case (x, y) =>
      base.sortWithinPartitions(
        partCols.map(col) :+ graft.operators.Pipelines.zorderKey(x, y): _*)
    }
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .option("parquet.bloom.filter.expected.ndv#trace_id",
        bloomNdv.toString)
    blockSize.fold(writer)(b => writer
        .option("parquet.block.size", b.toString))
      .partitionBy(partCols: _*)
      .parquet(stagedDir)
    fs.createNewFile(stagedMarker): Unit
    if (crashAfterStep <= 1) return
    // PROMOTE through the torn-rename-safe phase machine (markers +
    // idempotent phases — see the block comment above [[swapM1]]): the
    // aside rename below is a best-effort fast path whose result does
    // not matter, because phase 1 treats live/old as one disposable
    // pool (rewrite complete; only late `_staging` flushes are kept),
    // however a non-atomic rename split them.
    fs.createNewFile(swapM1): Unit
    fs.rename(new Path(dir), new Path(oldDir)): Unit
    if (crashAfterStep <= 2) return
    finishSwapFrom1(crashAfterStep)
    // publish the manifest only when the swap fully completed (the
    // crashAfterStep early-returns model a crash: manifest stays
    // absent and readers list — correct, just unindexed). The rewrite
    // wrote every file from ONE DataFrame, so its schema IS the
    // merged data schema — recorded so reads skip footer inference
    if (crashAfterStep > 3) manifest.rebuild(Some(all.get.schema))
  }

  /** Staged-but-uncompacted file count — the LSM depth signal the
    * compaction policy triggers on. A driver-side listing of ONE flat
    * directory (staged flushes write few files each), not a tree walk.
    */
  def stagedFileCount: Int = {
    def count(p: String) = ls(new Path(p))
      .count(s => s.getPath.getName.endsWith(".parquet"))
    count(stagingDir) + count(compactingDir)
  }

  /** Oldest staged file's age in µs (None when staging is empty) — the
    * policy's second trigger: a trickle ingest never reaches the count
    * threshold but must still drain eventually.
    */
  def stagedOldestAgeUs(nowUs: Long = System.currentTimeMillis() * 1000L)
      : Option[Long] = {
    // both trees, matching stagedFileCount: files a crashed compaction
    // left in _staging_compacting are the OLDEST staged rows — exactly
    // what the age bound exists to drain
    val files = Seq(stagingDir, compactingDir)
      .flatMap(p => ls(new Path(p)))
      .filter(_.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) None
    else Some(nowUs - files.map(_.getModificationTime).min * 1000L)
  }

  /** Compaction as a POLICY, not a tool (the LSM background cadence):
    * drain the staging tree into the partitioned layout when it is
    * deep enough (`maxStagedFiles`) or old enough (`maxAgeUs`) — the
    * two triggers every LSM store's background compactor runs on
    * (depth amortizes write cost; age bounds how long directory
    * pruning is deferred for staged rows). Returns whether a drain
    * ran. Reads are identical before and after a drain (read() unions
    * staging in; the policy spec pins equality), so cadence points —
    * end of an ingest loop, a timer — never change what a reader
    * SEES. Operations on one store are serialized by the owning
    * engine (the reference's single-process model): recover()'s
    * roll-forward, which every read/compact runs first, assumes no
    * compaction is mid-flight on another thread. Crash-safe via
    * [[compact]]'s swap + snapshot discipline.
    */
  /** Small-file compaction PLANNING from pure metadata (the OPTIMIZE /
    * rewrite-planning half of Delta/Iceberg maintenance at this
    * store's scale): the `date=` partitions [[compactDate]] can
    * actually IMPROVE — more files than leaf (minute) dirs, i.e. some
    * minute holds several flush files, AND over `maxFilesPerDate`
    * files or averaging under `minAvgBytes` — most-fragmented first.
    * The leaf-dir guard makes heal→plan CONVERGE: compactDate rewrites
    * to `filesPerPartition` files per minute dir, so a date already at
    * one-file-per-minute is never re-flagged (a date whose problem is
    * too MANY minute dirs needs `compact(granularity = "hour")`, a
    * different, whole-tree decision). Dates already compacted to hour/
    * day grain are skipped for the same reason — compactDate requires
    * the minute layout. Costs one manifest GET when the store is
    * compaction-owned; a direct-write ingest invalidates the manifest,
    * so planning walks the tree until the first heal republishes.
    * ZERO data reads either way. The staged/LSM path is
    * [[maybeCompact]]'s depth/age policy instead.
    */
  def planCompactions(maxFilesPerDate: Int = 8,
      minAvgBytes: Long = 4L * 1024 * 1024): Seq[String] = {
    recover()
    if (!exists) return Seq.empty
    val entries = manifest.read().map(_.entries).getOrElse(manifest.walkNow())
    entries.groupBy(_.rel.takeWhile(_ != '/'))
      .collect { case (datePart, files) if datePart.startsWith("date=") && {
          val minuteGrain = files.forall(_.rel.count(_ == '/') == 3)
          val leafDirs = files
            .map(e => e.rel.take(e.rel.lastIndexOf('/'))).distinct.size
          minuteGrain && files.size > leafDirs &&
            (files.size > maxFilesPerDate ||
              files.map(_.size).sum / files.size < minAvgBytes)
        } => (datePart.stripPrefix("date="), files.size)
      }
      .toSeq.sortBy { case (d, n) => (-n, d) }.map(_._1)
  }

  def maybeCompact(maxStagedFiles: Int = 64,
      maxAgeUs: Option[Long] = None,
      nowUs: Long = System.currentTimeMillis() * 1000L,
      filesPerPartition: Int = 1,
      granularity: String = "minute"): Boolean = {
    val deep = stagedFileCount >= maxStagedFiles
    val stale = maxAgeUs.exists(lim =>
      stagedOldestAgeUs(nowUs).exists(_ >= lim))
    if (deep || stale) {
      compact(filesPerPartition, granularity = granularity); true
    } else false
  }

  /** Retention (beyond the reference, which grows forever — no expiry
    * anywhere in duo/src): drop data older than `cutoffUs`, at the
    * granularities a 100 TB store can afford to delete at:
    *
    *  - the PARTITIONED tree drops whole `date=` dirs strictly before
    *    the cutoff's UTC date — the drop-old-days shape every
    *    observability retention job runs; the cutoff's own date is
    *    kept whole (one listing + N recursive deletes, no data read);
    *  - the STAGING trees drop a file when its parquet footer says
    *    max(timeCol) < the cutoff's day floor — file-granular, footer
    *    stats only, still no data read. A file STRADDLING the boundary
    *    is kept whole (conservative: retention may retain up to one
    *    extra day/file; exact trimming is what the next [[compact]]
    *    gives, since its rewrite re-derives dirs from surviving rows).
    *
    * Both grains share the day-floor boundary, so reads after an
    * expiry equal a `timeCol >= dayFloor(cutoff)` filter whenever no
    * staged file straddles the floor (the straddler-kept case only
    * ever RETAINS extra rows, never loses any). Deletes are idempotent
    * — no swap or marker needed; a crash mid-expiry leaves fewer dirs
    * for the next run. Returns (dateDirsDropped, stagedFilesDropped).
    */
  def expire(cutoffUs: Long): (Int, Int) = {
    recover()
    if (!exists) return (0, 0)
    // the cutoff's calendar day in the SESSION timezone — the same
    // derivation the write path's date_format uses for the dir names;
    // a UTC LocalDate here would, on a west-of-UTC session, drop a
    // `date=` dir holding rows AFTER the cutoff instant
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone"))
    val cutoffDate = java.time.LocalDate.ofInstant(
      java.time.Instant.ofEpochSecond(Math.floorDiv(cutoffUs, 1000000L)),
      zone)
    val dayFloorUs = cutoffDate.atStartOfDay(zone)
      .toInstant.toEpochMilli * 1000L
    // ISO dates compare chronologically as strings
    val expiredDirs = ls(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date=") &&
        s.getPath.getName.stripPrefix("date=") < cutoffDate.toString)
    // snapshot-before-invalidate, and only when something will drop —
    // a no-op retention tick must not pay a manifest GET + parse
    val priorEntries =
      if (expiredDirs.isEmpty) None else manifest.read()
    if (expiredDirs.nonEmpty) manifest.invalidate()
    expiredDirs.foreach(s => rm(s.getPath))
    val droppedFiles = Seq(stagingDir, compactingDir)
      .flatMap(p => ls(new Path(p)))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .count { s =>
        // stats missing ⇒ unprovable ⇒ keep (loud is rowGroupRanges'
        // job; retention must only ever delete what it can prove dead)
        fileMaxStat(s.getPath).exists(_ < dayFloorUs) && {
          fs.delete(s.getPath, false): Unit; true
        }
      }
    // re-publish after the drops (staged files are outside the
    // manifest, so only directory drops strictly require this). The
    // survivor set is prior-minus-dropped-prefixes — published with
    // ZERO walking; a store that never published (prior None) pays the
    // full walk once, since expiry is layout-owning like compact
    if (expiredDirs.nonEmpty) priorEntries match {
      case Some(prior) =>
        val dropped = expiredDirs.map(_.getPath.getName)
        manifest.republish(prior.entries.filterNot(e =>
          dropped.exists(d => e.rel.startsWith(d + "/"))))
      case None => manifest.rebuild()
    }
    (expiredDirs.size, droppedFiles)
  }

  /** max(timeCol) across one parquet file's row groups, from footer
    * statistics alone (None when any group lacks usable stats).
    */
  private def fileMaxStat(p: Path): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      p, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val maxes = r.getFooter.getBlocks.asScala.toSeq.map { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == timeCol)
          .map(_.getStatistics)
          .filter(st => st != null && !st.isEmpty && st.hasNonNullValue)
          .map(_.genericGetMax.asInstanceOf[Number].longValue())
      }
      if (maxes.isEmpty || maxes.exists(_.isEmpty)) None
      else Some(maxes.flatten.max)
    } finally r.close()
  }

  /** Trace-search span read for the F9∧F10 predicate pair (start range
    * AND duration range, duo/src/query.rs:141-152) with the derived
    * END-RANGE conjunct: `duration = end − start` is an arithmetic
    * expression parquet statistics can never serve, but
    * start ∈ [s₁,s₂] ∧ dur ∈ [d₁,d₂] IMPLIES end ∈ [s₁+d₁, s₂+d₂] —
    * a redundant conjunct on a STORED column, so results are
    * unchanged while the scan gains a pushable row-group predicate.
    * This is what turns the z-ordered compaction ([[compact]]
    * zorderOn start×duration) into a read-time win: z-clustering
    * (start, dur) clusters end = start+dur too, so per-row-group
    * min/max boxes on (start, end) are tight in exactly the
    * dimensions the derived conjuncts probe — row groups outside the
    * duration band prune on footer stats alone. A time-only layout
    * stores each row group with near-partition-wide end ranges and
    * skips nothing (skip ratios measured in StreamingWindowSpec,
    * recorded in SCALE.md).
    */
  def readSpanRange(startLo: Long, startHi: Long, durLo: Long,
      durHi: Long, endCol: String = "end"): Option[DataFrame] =
    read(Some(startLo), Some(startHi)).map(_.filter(
      (col(endCol) - col(timeCol)).between(durLo, durHi) &&
        col(endCol).between(startLo + durLo, startHi + durHi)))

  /** Per-row-group [min, max] footer statistics for `cols` over the
    * PARTITIONED tree — the metadata a stats-aware reader prunes on
    * ([[readSpanRange]]'s skip measurement reads this). Staged flushes
    * are deliberately excluded: `_staging` is the un-organized tail
    * whose layout [[compact]] has not built yet, so its stats are not
    * part of any layout-pruning claim — measure skip ratios after the
    * drain, the state the claim is about.
    */
  def rowGroupRanges(
      cols: Seq[String]): Seq[(String, Map[String, (Long, Long)])] = {
    import scala.jdk.CollectionConverters._
    // hidden subtrees (the `_staging` flat appends, markers) are not
    // part of the partitioned table — same visibility rule the
    // parquet reader's discovery applies
    def walk(st: FileStatus): Seq[Path] = {
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Nil
      else if (st.isDirectory) ls(st.getPath).flatMap(walk)
      else if (name.endsWith(".parquet")) Seq(st.getPath) else Nil
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val top = new Path(dir)
    val files =
      if (!fs.exists(top)) Seq.empty else ls(top).flatMap(walk)
    files.flatMap { fp =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        fp, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        fp.toString -> cols.map { c =>
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == c)
            .getOrElse(sys.error(s"rowGroupRanges: no column $c in $fp"))
          val st: org.apache.parquet.column.statistics.Statistics[_] =
            cc.getStatistics
          // an all-null group (or stats disabled) has no min/max — a
          // stats-aware reader must treat it as unprunable, loudly.
          // The typed Statistics store primitives, so genericGetMin is
          // non-null even when the group holds only nulls; the real
          // signals are isEmpty (no stats) and hasNonNullValue
          if (st == null || st.isEmpty || !st.hasNonNullValue)
            sys.error(s"rowGroupRanges: no min/max stats for $c in $fp")
          c -> (st.genericGetMin.asInstanceOf[Number].longValue(),
            st.genericGetMax.asInstanceOf[Number].longValue())
        }.toMap
      } finally r.close()
    }
  }

  /** Reference-shaped read path: enumerate minimal partition prefixes
    * with [[TimePrefix]] and read only those directories (the
    * ListingTable-over-prefixes plan, duo/src/partition/query.rs:38-60).
    * Staged-but-not-yet-compacted flushes are unioned in (directory
    * pruning for them is compaction's job) — without this the two
    * read APIs would disagree on the table's contents between a
    * [[writeStaged]] land and the next drain. The staged rows are
    * filtered to EXACTLY the minute window the prefix set covers
    * ([floorMin(start), truncMin(end) + bump-if-seconds), mirroring
    * [[TimePrefix]]'s end-bump quirk) — prefix reads are
    * directory-granular by contract (callers apply row predicates
    * after, like the reference's ListingTable), so the staged side
    * must be minute-granular too or the union's contents would
    * depend on which side a row landed in.
    *
    * Listing discipline for object stores: prefix existence is probed
    * with ONE listing per distinct PARENT directory (not one HEAD per
    * prefix — a day window is 1,440 minute prefixes but only ~24
    * parents), and the coarse-fallback ancestor listings are memoized
    * per ancestor within the call, so a wide window over a day-grain
    * tree lists each date dir once. Cost is bounded by DIRECTORIES
    * TOUCHED, never by window width.
    */
  /** Schema contract when `schema` is None: a manifest-planned read
    * answers with the TABLE's merged schema (the manifest records it;
    * drifted columns absent from the window surface as nulls), while
    * the listing fallback infers over only the selected files — the
    * window-local schema. Callers that pin hashes pass `schema`
    * explicitly, which both paths honor identically.
    */
  def readPrefixes(startUs: Long, endUs: Long,
      schema: Option[StructType] = None): Option[DataFrame] = {
    recover() // same crash-roll-forward guarantee as read()
    val wanted = TimePrefix.generatePrefixes(startUs, endUs)
      .map(p => s"$dir/$p")
    // manifest fast path: one GET of the file list answers EVERY
    // prefix-existence probe and coarse-fallback file lookup below
    // with zero listings (the derived parent→children map covers the
    // whole tree); absent manifest falls back to per-parent listings
    val manifestSnap: Option[StoreManifest.Snapshot] = manifest.read()
    val entryByRel: Map[String, StoreManifest.Entry] =
      manifestSnap.map(_.entries.map(e => e.rel -> e).toMap)
        .getOrElse(Map.empty)
    val byParent: Option[Map[String, Set[String]]] =
      manifestSnap.map { snap =>
        val m = scala.collection.mutable.Map.empty[String, Set[String]]
        snap.entries.foreach { e =>
          var parent = dir
          e.rel.split("/").foreach { seg =>
            m.update(parent, m.getOrElse(parent, Set.empty) + seg)
            parent = s"$parent/$seg"
          }
        }
        m.toMap
      }
    // one listing per distinct parent dir answers every child's
    // existence probe (memoized; object-store LIST beats N× HEAD)
    val childNames = scala.collection.mutable.Map.empty[String, Set[String]]
    def children(parent: String): Set[String] = byParent match {
      case Some(m) => m.getOrElse(parent.stripSuffix("/"), Set.empty)
      case None => childNames.getOrElseUpdate(parent,
        ls(new Path(parent)).map(_.getPath.getName).toSet)
    }
    def prefixExists(p: String): Boolean = {
      val clean = p.stripSuffix("/")
      val slash = clean.lastIndexOf('/')
      children(clean.substring(0, slash))
        .contains(clean.substring(slash + 1))
    }
    val (paths, missing) = wanted.partition(prefixExists)
    val minUs = 60L * 1000000L
    val loUs = Math.floorDiv(startUs, minUs) * minUs
    val endSec = Math.floorDiv(endUs, 1000000L)
    val bump = Math.floorMod(endSec, 60L) > 0L
    val hiUs = (Math.floorDiv(endSec, 60L) + (if (bump) 1L else 0L)) * minUs
    // COARSE-granularity fallback: a tree [[compact]]ed to hour/day
    // grain holds a missing minute-prefix's rows as DIRECT files of an
    // ancestor dir. Those files cover a superset of the prefix's
    // window, so they are read with an explicit covered-minute row
    // filter [loUs, hiUs) — the same window the minute DIRECTORIES
    // cover (contiguous by construction), which keeps the two layouts
    // observationally identical under the directory-granular contract.
    // Direct files only (never a recursive dir read): in a
    // minute-grain tree the ancestor has only subdirs and the fallback
    // contributes nothing, so the minute layout's plan is untouched.
    // Ancestor existence + listing reuse the memoized `children` maps,
    // so N missing minutes under one coarse dir cost ONE listing.
    val dirFiles = scala.collection.mutable.Map.empty[String, Seq[String]]
    def parquetFilesIn(d: String): Seq[String] = byParent match {
      // manifest children are file AND subdir names; the .parquet
      // filter keeps exactly the direct files, like the listing path
      case Some(m) =>
        m.getOrElse(d.stripSuffix("/"), Set.empty).toSeq
          .filter(_.endsWith(".parquet")).sorted
          .map(n => s"${d.stripSuffix("/")}/$n")
      case None => dirFiles.getOrElseUpdate(d,
        ls(new Path(d))
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString))
    }
    val fallbackFiles = missing.flatMap { p =>
      val segs = p.stripPrefix(s"$dir/").stripSuffix("/").split("/")
      // coarser ancestors, nearest first (minute → hour, date; hour →
      // date) — never above the date level; the FIRST existing one is
      // the coarse dir that holds this window's rows, if any
      (1 until segs.length)
        .map(k => s"$dir/${segs.dropRight(k).mkString("/")}")
        .find(prefixExists)
        .toSeq
        .flatMap(parquetFilesIn)
    }.distinct
    // with a manifest, expand each existing prefix DIR to its exact
    // file list (prefixes can sit at any level: TimePrefix collapses
    // covered hours/days, so expansion is by path prefix, not direct
    // children) and plan through [[ManifestFileIndex]] — the whole
    // read plans with ZERO filesystem listings; the listing path hands
    // Spark the prefix dirs and pays one list per input
    val main = manifestSnap match {
      case Some(snap) =>
        // prefix → file expansion by binary search over the sorted rel
        // list: O(P log N + hits), not O(P·N) — a day window over a
        // million-file manifest is 1,440 probes, not 1.4B startsWith
        val sortedRels = snap.entries.map(_.rel).sorted.toIndexedSeq
        def relsUnder(prefix: String): Seq[String] = {
          val q = prefix + "/"
          var lo = 0; var hi = sortedRels.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (sortedRels(mid) < q) lo = mid + 1 else hi = mid
          }
          Iterator.range(lo, sortedRels.length).map(sortedRels)
            .takeWhile(_.startsWith(q)).toSeq
        }
        val expanded = paths.flatMap { p =>
          relsUnder(p.stripPrefix(s"$dir/").stripSuffix("/"))
        } ++ fallbackFiles.map(_.stripPrefix(s"$dir/"))
        val selected = expanded.distinct.flatMap(entryByRel.get)
        // caller-pinned schema wins; else the manifest's recorded one;
        // else footer inference over exactly the selected files
        ManifestFileIndex.relation(spark, dir, selected,
            schema.orElse(snap.schema)).map { df0 =>
          val df = df0.drop("date", "hour", "minute")
          if (fallbackFiles.isEmpty) df
          else df.where(col(timeCol) >= loUs && col(timeCol) < hiUs)
        }
      case None =>
        val mainInputs = paths ++ fallbackFiles
        if (mainInputs.isEmpty) None else {
          val reader = spark.read.option("mergeSchema", "true")
            .option("basePath", dir)
          val withSchema = schema.map(reader.schema).getOrElse(reader)
          val df = withSchema.parquet(mainInputs: _*)
            .drop("date", "hour", "minute")
          Some(if (fallbackFiles.isEmpty) df
            else df.where(col(timeCol) >= loUs && col(timeCol) < hiUs))
        }
    }
    // both staging trees, like read(): rows a running compaction has
    // snapshotted into _staging_compacting are part of the table until
    // the swap promotes the rewrite
    val staged = Seq(stagingDir, compactingDir).flatMap(tryRead)
      .map(_.where(col(timeCol) >= loUs && col(timeCol) < hiUs))
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    (main, staged) match {
      case (Some(m), Some(st)) =>
        Some(m.unionByName(st, allowMissingColumns = true))
      case (m, st) => m.orElse(st)
    }
  }
}

object ParquetStore {
  /** Expected distinct trace_ids per written FILE for the trace_id
    * bloom filter. Parquet sizes the bloom bitset from this hint and
    * DEFAULTS to 1,000,000 — measured on the engine's own stores: a
    * 26-row minute-flush file carried 1,042 bytes of column data and
    * ~1.05 MB of bloom bitset, i.e. the filter was 1000× the data
    * for every small flush file (and pure overhead to read). 2^16
    * keeps lookup pruning effective for flush-sized files at ~1/13 the
    * bitset; a deployment whose compacted files hold ≥1M distinct
    * traces raises the store's `bloomNdv` to match its file sizing —
    * the knob exists precisely because the right value is a property
    * of the flush/compaction size policy, not a universal constant.
    */
  val DefaultBloomNdv: Long = 1L << 16

  /** Partition columns for a compaction target granularity. */
  private[store] def partColsFor(granularity: String): Seq[String] =
    granularity match {
      case "minute" => Seq("date", "hour", "minute")
      case "hour" => Seq("date", "hour")
      case "day" => Seq("date")
      case g => throw new IllegalArgumentException(
        s"granularity must be minute|hour|day, got '$g'")
    }
}
