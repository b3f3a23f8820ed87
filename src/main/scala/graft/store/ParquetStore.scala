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
  *  - reads go through partition-column predicates; Catalyst prunes
  *    directories (replacing the manual prefix listing, kept as
  *    [[readPrefixes]] for the reference-shaped plan).
  *  - a parquet bloom filter on trace_id is written, matching the
  *    reference's bloom pruning for trace lookups
  *    (duo/src/partition/writer.rs:45-49).
  *
  * Storage portability (S5, duo/src/config.rs:69-132): every metadata
  * operation — existence probes, listings, marker files, manifest
  * publishes — runs on `org.apache.hadoop.fs.FileSystem` resolved from
  * the ROOT's scheme ([[StoreFs]]), so the same store code serves a
  * local path, an HDFS URI, or an `s3a://bucket/...` root.
  *
  * Snapshot isolation (round-16; the reference has no analog — it
  * never rewrites files, duo/src/partition/writer.rs:55-59): layout
  * mutations never modify or delete a file a reader could have
  * planned. Rewrites land in immutable `_gen-<millis>-<uuid>` trees
  * under the table dir (underscore-hidden from legacy discovery);
  * the [[StoreManifest]] generation publish — one temp-write + rename
  * — is the single atomic commit point, carrying both the new live
  * file list and the tombstones of the files it supersedes. Superseded
  * files stay on disk until [[vacuum]] reclaims them after a grace
  * window, so a query planned from the previous generation (or
  * listing) in ANOTHER session executes green across a concurrent
  * [[compact]]/[[compactDate]]/[[expire]] — the Iceberg/Delta
  * discipline. There is no multi-directory swap left to tear: the only
  * rename any mutation performs is the single manifest file's, and a
  * torn generation is rejected whole by its self-count (readers fall
  * back to the previous retained generation).
  *
  * Writer fencing: the store is single-WRITER by contract; the
  * contract is enforced by an epoch lease under `_lock` — each store
  * instance claims `lease-<epoch>-<uuid>` (monotone epoch) before its
  * first mutation and re-verifies it still holds the lexicographic max
  * before every subsequent one, so a second writer on the same root
  * fences the first loudly ([[ParquetStore.WriterFencedException]])
  * instead of interleaving mutations into silent corruption. The lease
  * is verified TWICE per committing mutation — at mutation start and
  * again at the commit point, immediately before the manifest publish
  * — because a rewrite can run for minutes: a writer fenced mid-rewrite
  * must fail at its commit, not land a stale generation as the newest
  * truth. Belt-and-braces under the commit itself,
  * [[StoreManifest.publish]] is an expected-parent CAS: every commit
  * names the generation its planning snapshot read, and the publish
  * throws [[StoreManifest.ConcurrentCommitException]] when any other
  * generation is newest — so even a mutation that somehow passed both
  * lease checks cannot overwrite another writer's commit. Readers
  * never fence.
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

  /** Listing-free read planning + the mutation commit point (see
    * [[StoreManifest]]): reads plan from the newest readable
    * generation whenever one exists and fall back to listing the
    * legacy tree otherwise.
    */
  private val manifest = new StoreManifest(fs, dir)

  /** Process-wide mutation epoch for this table root, shared by every
    * in-process instance over the same (root, table): bumped after any
    * mutation that can change what a read plans (writes, commits,
    * compactions, expiry, vacuum). Pure memory — readers that memoize
    * a read PLAN (e.g. [[graft.DuoEngine]]'s cold-read memo) key on it
    * so any in-process writer — same instance or not — invalidates
    * them without an I/O round trip. Cross-process mutations are
    * outside this signal by design: tables are single-writer (fenced),
    * and cross-process readers construct fresh instances/plans.
    */
  private val epoch = ParquetStore.epochs.getOrElseUpdate(
    dir, new java.util.concurrent.atomic.AtomicLong)
  private[graft] def mutationEpoch: Long = epoch.get()
  private def bumpEpoch(): Unit = epoch.incrementAndGet(): Unit

  /** Whether reads currently plan from the manifest (specs/gates). */
  def manifestPresent: Boolean = manifest.present

  /** The manifest's relative data-file paths (specs). */
  private[graft] def manifestFiles: Option[Seq[String]] =
    manifest.read().map(_.entries.map(_.rel))

  /** The manifest's recorded merged data schema (specs). */
  private[graft] def manifestSchema
      : Option[org.apache.spark.sql.types.StructType] =
    manifest.read().flatMap(_.schema)

  /** The manifest's tombstoned-but-not-yet-vacuumed rels (specs). */
  private[graft] def manifestDead: Option[Seq[String]] =
    manifest.read().map(_.dead.map(_.rel))

  /** The newest generation's (manifest name, partition key) refs
    * (specs/probes: hot-split shape and reuse-by-name assertions).
    */
  private[graft] def manifestRefs: Seq[(String, String)] =
    manifest.mfRefs()

  /** Hot-date split threshold seam (specs/probes — see
    * [[StoreManifest.HotSplitDefault]]).
    */
  private[graft] def hotSplitFiles_=(n: Int): Unit =
    manifest.hotSplitFiles = n
  private[graft] def hotSplitFiles: Int = manifest.hotSplitFiles

  /** Retained manifest generations, oldest → newest — the snapshots
    * [[readGeneration]] can time-travel to. Retention is
    * [[StoreManifest.KeepGens]] generations, pruned past the grace by
    * [[vacuum]]; the newest IS the current table.
    */
  def generations(): Seq[String] = manifest.genNames()

  /** One retained generation's operation-audit string (the Delta
    * commitInfo idea): which operation published it and its shape,
    * e.g. `{"op":"compact","granularity":"day","wrote":3,
    * "retired":7}`. None for pruned generations, torn generation
    * FILES, and pre-audit ones (the line is optional in the format).
    * The audit is per-commit metadata read from the head file alone —
    * a head whose delta CHAIN lost a link still reports its own line
    * even though [[readGeneration]] rejects it; audit and readability
    * are separate claims.
    */
  def generationInfo(gen: String): Option[String] =
    manifest.genInfo(gen)

  /** All retained generations' audit strings from one listing (the
    * batch form the `?info=true` route uses — per-name lookups would
    * pay one listing each).
    */
  def generationInfos(): Map[String, Option[String]] =
    manifest.genInfos()

  /** Whether one generation currently FOLDS whole (named, uncorrupt,
    * full chain) — the readability probe [[CdcFeed]] brackets its
    * diffs with. Distinct from "has rows": an empty table's
    * generation is readable.
    */
  def generationReadable(gen: String): Boolean =
    manifest.readGen(gen).isDefined

  /** The newest retained READABLE generation committed at or before
    * `tsMillis` — generation names embed their commit wall-clock
    * millis, so a TIMESTAMP is a complete AS-OF coordinate (and,
    * resolved against several stores, a CONSISTENT one: each pins its
    * newest generation ≤ T, whatever mix of commits landed after).
    * Unreadable names are skipped, not resolved: a torn/foreign
    * gen-file whose name sorts into the range must degrade to the
    * previous readable coordinate (the same fallback every read
    * takes), not turn every asofTs query into a 404. This keeps the
    * cross-table consistency claim honest under the store's OWN truth
    * rule: a torn generation is not a commit anywhere — the live read
    * path serves the newest READABLE head too — so "each table's
    * newest readable generation ≤ T" is exactly "each table's truth
    * at instant T", torn debris or not. None when T
    * predates retention (nothing retained is old enough to answer T
    * truthfully — serving the oldest surviving generation instead
    * would silently misdate the answer) or no readable generation
    * exists. Note the empty-table edge: a readable generation with
    * ZERO entries resolves here, but [[readGeneration]] then answers
    * None (no files to plan) — callers surface that as "no data",
    * the same answer the plain read gives an empty store.
    */
  def generationAsOf(tsMillis: Long): Option[String] =
    ParquetStore.resolveAsOf(
      generations().filter(g => genFileMillis(g).exists(_ <= tsMillis)),
      genFileMillis, g => manifest.readGen(g).flatMap(_.parent),
      generationReadable)

  /** A named durable incremental CDC consumer over this store's
    * generation history — see [[CdcFeed]]. `keyCols` nonEmpty makes
    * increments row-exact under any lineage (the g16 semantics);
    * empty keeps them file-granular.
    */
  def cdcFeed(consumer: String, keyCols: Seq[String] = Nil): CdcFeed =
    new CdcFeed(this, fs, dir, consumer, keyCols)

  /** The MAIN table as of one retained generation — time travel, the
    * capability the commit protocol gives for free: a generation's
    * entries still name on-disk files until vacuum's grace passes, so
    * planning from an older generation answers exactly the table that
    * generation committed (partition pruning and schema included).
    * Staged flushes are deliberately excluded: `_staging` is the
    * unversioned ingest tail — rows enter version history when a
    * drain commits them. None when the generation is pruned/corrupt or
    * names already-vacuumed files' tree shape (execution would then
    * fail on the missing files — time travel reaches exactly as far
    * as the vacuum grace, the documented isolation window).
    */
  def readGeneration(gen: String): Option[DataFrame] =
    manifest.readGen(gen).flatMap(snap =>
      relationFor(snap.entries, snap.schema)
        .map(_.drop("date", "hour", "minute")))

  /** Generation-diff incremental read (CDC): the rows in files `genB`
    * references that `genA` does not — the incremental-consumer shape
    * Delta/Iceberg deployments feed downstream jobs with, derived here
    * entirely from the two retained manifests (no extra change files).
    * File-granular, so it is EXACT when the mutations between the two
    * generations only added data in new files — appends landed and
    * folded by a date-scoped [[compactDate]], the rolling form
    * maintenance takes at scale; a whole-table [[compact]] between the
    * generations rewrites every byte into a fresh tree and the diff
    * degenerates (correctly, but uselessly) to the full table — the
    * same caveat Delta's docs put on file-level CDF without change
    * files. Both generations must still be retained (history reaches
    * exactly as far as the vacuum grace); None otherwise, or when no
    * file was added.
    */
  def changesBetween(genA: String, genB: String): Option[DataFrame] =
    for {
      a <- manifest.readGen(genA)
      b <- manifest.readGen(genB)
      have = a.entries.map(_.rel).toSet
      added = b.entries.filterNot(e => have(e.rel))
      df <- relationFor(added, b.schema)
    } yield df.drop("date", "hour", "minute")

  /** The delete side of [[changesBetween]]: the rows in files `genA`
    * references that `genB` no longer does — what a downstream
    * consumer must INVALIDATE when retention ([[expire]]) ran between
    * the generations. Plannable only while the removed files are
    * still on disk (they are tombstoned, not deleted, until vacuum's
    * grace passes — the same window that bounds time travel), and
    * file-granular with the same rewrite caveat as the insert side:
    * a compaction between the generations moves rows across files and
    * surfaces them here as removed (and in changesBetween as added) —
    * spurious-but-consistent churn, the caveat Delta's docs put on
    * file-level CDF. None when a generation is pruned or nothing was
    * removed.
    */
  def removedBetween(genA: String, genB: String): Option[DataFrame] =
    for {
      a <- manifest.readGen(genA)
      b <- manifest.readGen(genB)
      kept = b.entries.map(_.rel).toSet
      removed = a.entries.filterNot(e => kept(e.rel))
      df <- relationFor(removed, a.schema)
    } yield df.drop("date", "hour", "minute")

  /** ROW-exact CDC (round 18, closing the file-granular caveat): the
    * rows whose `keyCols` exist in `genB` but nowhere in `genA` — true
    * inserts under ANY lineage, including a whole-table [[compact]]
    * between the generations that moves every row to fresh files. The
    * file-granular prefilter keeps it cheap: a row in a file BOTH
    * generations reference is trivially in both tables (files are
    * immutable), so only genB's ADDED files need scanning; each
    * candidate is then anti-joined against genA's full key set —
    * column-pruned to the keys at the scan, distinct'd, broadcast by
    * AQE when small, shuffled on the key otherwise. Cost scales with
    * (rows in added files) + (genA's key cardinality), never the full
    * cross of both snapshots. Some(empty frame) when the lineage was
    * pure re-layout (the compaction-churn case the file-granular form
    * mis-reports); None only when a generation is pruned/unreadable
    * or genB plans empty.
    */
  def changesBetween(genA: String, genB: String,
      keyCols: Seq[String]): Option[DataFrame] =
    for {
      a <- manifest.readGen(genA)
      b <- manifest.readGen(genB)
      have = a.entries.map(_.rel).toSet
      added = b.entries.filterNot(e => have(e.rel))
      df <- plannedOrEmpty(added, b.entries, b.schema)
    } yield antiOnKeys(df, a.entries, a.schema, keyCols)

  /** The delete side of the keyed CDC: rows whose `keyCols` exist in
    * `genA` but nowhere in `genB` — true deletes under any lineage
    * (same prefilter: only genA's REMOVED files can hold them).
    */
  def removedBetween(genA: String, genB: String,
      keyCols: Seq[String]): Option[DataFrame] =
    for {
      a <- manifest.readGen(genA)
      b <- manifest.readGen(genB)
      kept = b.entries.map(_.rel).toSet
      removed = a.entries.filterNot(e => kept(e.rel))
      df <- plannedOrEmpty(removed, a.entries, a.schema)
    } yield antiOnKeys(df, b.entries, b.schema, keyCols)

  /** Plan `subset` as a frame; an empty subset plans the full list
    * limited to 0 (Catalyst's OptimizeLimitZero folds it to an empty
    * relation — no scan) so a pure re-layout still yields a typed
    * empty result instead of None.
    */
  private def plannedOrEmpty(subset: Seq[StoreManifest.Entry],
      all: Seq[StoreManifest.Entry],
      schema: Option[StructType]): Option[DataFrame] =
    relationFor(subset, schema)
      .map(_.drop("date", "hour", "minute"))
      .orElse(relationFor(all, schema)
        .map(_.drop("date", "hour", "minute").limit(0)))

  private def antiOnKeys(df: DataFrame,
      otherEntries: Seq[StoreManifest.Entry],
      otherSchema: Option[StructType], keyCols: Seq[String]): DataFrame =
    relationFor(otherEntries, otherSchema) match {
      case Some(other) =>
        // key columns only (column-pruned scan) + distinct: the anti
        // join's build side is the key SET, not the other snapshot
        df.join(other.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
      case None => df // the other generation is empty: all rows differ
    }

  /** Recursive delete (no-op when absent). */
  private def rm(p: Path): Unit = { fs.delete(p, true): Unit }

  // ---- writer fencing (epoch lease) ----

  private def lockDir = new Path(dir, "_lock")

  /** This instance's lease file name, once claimed. */
  @volatile private var myLease: Option[String] = None

  private def leaseNames(): Seq[String] =
    ls(lockDir).map(_.getPath.getName).filter(_.startsWith("lease-"))

  /** Claim (first mutation) or verify (every later mutation) this
    * instance's writer lease. Claiming creates a lease file with an
    * epoch strictly above every existing one; verification checks the
    * instance still holds the lexicographic max. Two instances
    * claiming concurrently create DISTINCT files (uuid suffix) — the
    * lexicographic winner proceeds, the loser throws on its own
    * verify. One LIST per mutation; mutations are heavyweight
    * (rewrites, flushes), so the fence is noise against them.
    */
  private def fence(): Unit = {
    // every mutator fences before touching state, so the fence is the
    // one choke point where the in-process mutation epoch must bump —
    // an entry-side bump invalidates any read plan memoized before the
    // mutation regardless of how the mutator exits
    bumpEpoch()
    fenceLease()
  }

  /** Epoch bump on mutation EXIT, paired with the entry-side bump in
    * [[fence]] (ADVICE r21): a concurrent reader that observes the
    * post-entry epoch and plans BEFORE the mutation lands would
    * otherwise memoize the pre-mutation plan under a key no later
    * read distinguishes — the exit bump makes that key stale the
    * moment the mutation completes (or aborts — a partial landing
    * must not be memo-servable either). Wraps every public mutator
    * body; early `return`s inside still run the finally.
    */
  private def bumpOnExit[A](body: => A): A =
    try body finally bumpEpoch()

  private def fenceLease(): Unit = myLease match {
    case None =>
      val existing = leaseNames().sorted
      val epoch = existing.lastOption
        .flatMap(_.stripPrefix("lease-").takeWhile(_ != '-').toLongOption)
        .getOrElse(0L) + 1L
      val name = f"lease-$epoch%019d-${java.util.UUID.randomUUID()}"
      fs.mkdirs(lockDir): Unit
      fs.createNewFile(new Path(lockDir, name)): Unit
      myLease = Some(name)
      // prune leases strictly below ours (never a newer claimant's)
      leaseNames().filter(_ < name).sorted.dropRight(2)
        .foreach(n => fs.delete(new Path(lockDir, n), false): Unit)
      verifyLease(name)
    case Some(name) => verifyLease(name)
  }

  private def verifyLease(name: String): Unit = {
    val names = leaseNames()
    if (names.isEmpty || names.max != name)
      throw new ParquetStore.WriterFencedException(
        s"$dir: writer lease $name fenced by ${names.sorted.lastOption
          .getOrElse("(lock dir cleared)")} — another writer owns this store")
  }

  // ---- writes ----

  /** Append a batch, deriving partition columns from the row's µs
    * epoch time column. A flush whose rows span D time partitions
    * across T tasks writes up to D×T files — batches with a WIDE
    * event-time spread should land through [[writeStaged]] instead
    * (flat append now, [[compact]] owns the layout); this direct
    * partitioned write is for the common observability case where a
    * flush touches the current few minutes.
    */
  def write(batch: DataFrame): Unit = bumpOnExit {
    fence()
    // dirty-before-mutate: once a manifest exists, readers plan from
    // it — the marker (dropped BEFORE any new file can land) tells
    // them to union a legacy-tree walk in until the next compaction
    // folds the appended files. A crash after the marker but before
    // the append leaves a spurious marker: readers pay a walk that
    // finds nothing new — correct, just unindexed.
    manifest.markDirty()
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
      // per touched partition dir. The partition count is EXPLICIT
      // (defaultParallelism — scale-adaptive, cluster cores): a
      // column-only repartition let AQE coalesce a small flush's
      // shuffle to ONE task that then opened every touched dir's
      // parquet writer serially (guide §2.6 idle capacity — measured
      // on g13's 181-minute-spread flushes: 2-3.6 s single-task write
      // stages, 31 of 32 cores idle). One-file-per-dir is partition-
      // count-independent: each dir hashes wholly into one task.
      .repartition(spark.sparkContext.defaultParallelism,
        col("date"), col("hour"), col("minute"))
      .write
      .mode("append")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .option("parquet.bloom.filter.expected.ndv#trace_id",
        bloomNdv.toString)
      .partitionBy("date", "hour", "minute")
      .parquet(dir)
  }

  /** Append a batch THROUGH the manifest commit protocol: the rows
    * land in a fresh immutable `_gen-*` tree (invisible — no dirty
    * marker, no staging), and one generation publish makes them the
    * table's truth, carrying the caller's `info` audit line. This is
    * the transactional landing [[CdcFeed.consumeInto]] builds
    * exactly-once delivery on: the rename that makes the rows
    * VISIBLE is the same rename that durably records WHICH increment
    * they came from, so a consumer crashing between landing and
    * cursor-advance can detect the landed increment from the sink's
    * own generation info and skip the replay. A crash before the
    * publish leaves an orphan tree for [[vacuum]]. Requires a batch
    * whose `timeCol` drives the partition derivation, like [[write]].
    * The recorded schema stays EXACT when it provably can: a batch
    * whose (all-nullable) schema equals the parent's recorded one
    * keeps it, and the first commit into an empty table records the
    * batch's — so a sink fed only by uniform committed appends (the
    * CDC-consumer shape) plans from the manifest schema forever,
    * never paying per-file footer inference. A DRIFTED batch drops
    * the recorded schema to None (footer inference until the next
    * compact), the same conservative contract as [[expire]].
    */
  def writeCommitted(batch: DataFrame,
      info: Option[String] = None): Unit = bumpOnExit {
    fence()
    val t = truth()
    val batchSchema = StoreManifest.allNullable(batch.schema)
    val gen = newGenName()
    landGenTree(batch, gen)
    beforeCommit()
    fence()
    val landed = manifest.walkSubtree(gen)
    t match {
      case Some(snap) =>
        // keep the parent's recorded schema only when the batch
        // provably conforms to it (order-sensitive equality — a
        // mismatch is just conservative: footer inference)
        manifest.publishPatch(adds = landed, drops = Nil,
          deadPlus = Nil, deadMinus = Nil,
          schema = snap.schema.filter(_ == batchSchema),
          parent = snap.gen, info = info)
      case None => // first commit ever: absolute, legacy files folded
        val legacy = manifest.walkLegacy()
        manifest.publish(legacy ++ landed,
          if (legacy.isEmpty) Some(batchSchema) else None, Nil,
          parent = None, info = info)
    }
  }

  /** Apply one CDC increment to this store AS A MIRROR, in ONE
    * manifest commit: rows whose `keyCols` match `removed` leave the
    * table and `adds` land, so a sink fed by
    * [[CdcFeed.consumeInto]]'s mirror mode equals the source's NET
    * state as of the consumed generation — the invalidation the
    * append-only `writeCommitted` path deliberately leaves to the
    * consumer ([[CdcFeed]] `maxGenerations` stepping surfaces
    * mid-history removals a single jump would net out).
    *
    * Partition-scoped, the [[compactDate]] discipline: only the sink
    * date partitions the removed rows' own times touch are read,
    * anti-joined (key set distinct'd and broadcast by AQE when small)
    * and rewritten into the fresh `_gen-*` tree the adds land in —
    * O(touched dates) data movement, never the table. The one
    * generation publish (drops = the touched partitions' prior files,
    * adds = the rewrite + appends, caller `info` recording which
    * increment landed) is the same rename atom every commit uses, so
    * the exactly-once handshake holds: a crash before it leaves an
    * orphan tree and a replayable increment, after it a healable
    * cursor. Contract: the store must be commit-owned (no direct
    * [[write]]s — mirror removal rewrites manifested files only), and
    * a consumer `transform` must preserve `keyCols` and the time
    * column (they are the row identity and the partition coordinate
    * the removal is applied in).
    */
  def applyMirror(adds: Option[DataFrame], removed: Option[DataFrame],
      keyCols: Seq[String], info: Option[String] = None): Unit = bumpOnExit {
    require(keyCols.nonEmpty, "applyMirror needs row-identity keyCols")
    fence()
    // commit-owned contract ENFORCED, not narrated (ADVICE r20):
    // staged files and dirty-marked direct-write landings are
    // invisible to the manifest truth this rewrite plans from, so a
    // removed key living in one would silently survive the mirror —
    // the worst failure class. A mirror sink fed by anything other
    // than manifest commits fails loudly here instead.
    val stagedN = stagedFileCount
    val dirtyN = manifest.dirtyMarkers().size
    require(stagedN == 0 && dirtyN == 0,
      s"applyMirror requires a commit-owned sink: $stagedN staged " +
        s"file(s), $dirtyN dirty marker(s) under $dir — direct " +
        "write()/writeStaged() landings cannot participate in mirror " +
        "removal")
    // the removed side is read TWICE (affected dates here, the
    // anti-join build below) and it is a generation-diff plan over
    // source files — persist so each mirror step scans those files
    // once, not per consumer of the frame
    val removedCached = removed.map(_.persist())
    try {
    // affected sink dates from the REMOVED rows' own times — bounded
    // driver collect (distinct DATES, not rows; an increment touches
    // the handful of partitions its mutation did)
    val affectedDates: Set[String] = removedCached.map(
      _.select(date_format(timestamp_micros(col(timeCol)), "yyyy-MM-dd")
        .as("d")).distinct().collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)
    def admits(pk: String): Boolean = pk.isEmpty ||
      affectedDates(StoreManifest.dateKeyOf(pk).stripPrefix("date="))
    val t = truthFor(Some(admits))
    val allEntries = t.map(_.entries)
      .getOrElse(manifest.walkLegacyFor(admits))
    val affected = allEntries.filter { e =>
      val l = logicalRel(e.rel)
      val i = l.indexOf('/')
      i > 0 && affectedDates(l.substring(0, i).stripPrefix("date="))
    }
    val survivors = removedCached.flatMap { r =>
      relationFor(affected, t.flatMap(_.schema)).map(
        _.drop("date", "hour", "minute")
          .join(r.select(keyCols.map(col): _*).distinct(),
            keyCols, "left_anti"))
    }
    val toLand: Option[DataFrame] = (survivors, adds) match {
      case (Some(sv), Some(ad)) =>
        Some(sv.unionByName(ad, allowMissingColumns = true))
      case (sv, ad) => sv.orElse(ad)
    }
    val gen = newGenName()
    toLand.foreach(landGenTree(_, gen))
    beforeCommit()
    fence()
    val landed =
      if (toLand.isDefined) manifest.walkSubtree(gen) else Nil
    val now = System.currentTimeMillis()
    val landedSchema = toLand.map(r =>
      StoreManifest.allNullable(r.schema))
    t match {
      case Some(snap) =>
        manifest.publishPatch(adds = landed,
          drops = affected.map(_.rel),
          deadPlus = affected.map(e => StoreManifest.Dead(e.rel, now)),
          deadMinus = Nil,
          // keep the recorded schema only when the landing provably
          // conforms (else footer inference — the drift contract)
          schema = snap.schema.filter(s => landedSchema.forall(_ == s)),
          parent = snap.gen, info = info)
      case None => // first commit ever: absolute
        val full = manifest.walkLegacy()
        val affectedSet = affected.map(_.rel).toSet
        manifest.publish(full.filterNot(e => affectedSet(e.rel)) ++ landed,
          None, affected.map(e => StoreManifest.Dead(e.rel, now)),
          parent = None, info = info)
    }
    } finally removedCached.foreach(_.unpersist(): Unit)
  }

  /** Replace the WHOLE table with `batch` in one manifest commit
    * (None = truncate): every prior main and staged file is
    * tombstoned, the new rows (if any) land in a fresh `_gen-*` tree,
    * and the single generation publish flips the truth — the
    * transactional landing a mirror consumer's RESYNC takes
    * ([[CdcFeed.consumeInto]]: retention outran the cursor, so the
    * sink must truncate-and-reload rather than append). Concurrent
    * readers planned before the replace stay green until the vacuum
    * grace passes, like every mutation.
    */
  def replaceCommitted(batch: Option[DataFrame],
      info: Option[String] = None): Unit = bumpOnExit {
    fence()
    val t = truth()
    val gen = newGenName()
    batch.foreach(landGenTree(_, gen))
    beforeCommit()
    fence()
    val landed =
      if (batch.isDefined) manifest.walkSubtree(gen) else Nil
    val now = System.currentTimeMillis()
    val priorEntries = t.map(_.entries).getOrElse(manifest.walkLegacy())
    val priorStaged = stagedStatuses(t.map(_.deadRels).getOrElse(Set.empty))
    manifest.publish(landed,
      batch.map(b => StoreManifest.allNullable(b.schema)),
      t.map(_.dead).getOrElse(Nil) ++
        (priorEntries.map(_.rel) ++
          priorStaged.map(s => s"_staging/${s.getPath.getName}"))
          .map(StoreManifest.Dead(_, now)),
      parent = t.map(_.gen), info = info)
  }

  /** Land `rows` in the immutable `_gen-*` tree `gen`: partition
    * columns derived from the row's own time, one file per touched
    * minute dir, trace_id bloom — the shared landing block of every
    * manifest-committed write ([[writeCommitted]] / [[applyMirror]] /
    * [[replaceCommitted]]); a change here (bloom knobs, partition
    * scheme) must reach all three or an unbounded trace lookup
    * silently loses its pruning on one path.
    */
  private def landGenTree(rows: DataFrame, gen: String): Unit =
    rows
      .withColumn("__ts", timestamp_micros(col(timeCol)))
      .withColumn("date", date_format(col("__ts"), "yyyy-MM-dd"))
      .withColumn("hour", date_format(col("__ts"), "HH"))
      .withColumn("minute", date_format(col("__ts"), "mm"))
      .drop("__ts")
      // explicit count for the same reason as [[write]]: a wide-
      // event-time landing must parallelize across dirs, not serialize
      // behind AQE's byte-sized coalescing
      .repartition(spark.sparkContext.defaultParallelism,
        col("date"), col("hour"), col("minute"))
      .write
      .mode("overwrite")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .option("parquet.bloom.filter.expected.ndv#trace_id",
        bloomNdv.toString)
      .partitionBy("date", "hour", "minute")
      .parquet(s"$dir/$gen")

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
  def writeStaged(batch: DataFrame): Unit = bumpOnExit {
    fence()
    batch.write.mode("append")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .option("parquet.bloom.filter.expected.ndv#trace_id",
        bloomNdv.toString)
      .parquet(stagingDir)
  }

  // ---- truth resolution (what IS the table right now) ----

  /** The planning state one read or mutation works from: the live main
    * file list (manifest entries, plus a legacy walk's extras when
    * dirty markers are present), the recorded schema when it is still
    * exact, the tombstone set, and the dirty markers observed (so a
    * compaction clears exactly those). None ⇔ no readable manifest
    * generation — the store is in legacy listing mode (never
    * compacted, or catastrophic manifest loss).
    */
  private case class Truth(gen: String,
      entries: Seq[StoreManifest.Entry],
      schema: Option[StructType], deadRels: Set[String],
      dirtyNames: Seq[String], dead: Seq[StoreManifest.Dead])

  private def truth(): Option[Truth] = truthFor(None)

  /** [[truth]] restricted to the partitions `admit` passes (see
    * [[StoreManifest.readStateFor]]): only admitted partitions'
    * manifest files are read and only their entries assemble — the
    * windowed-read planning path whose wall scales with the window,
    * not the table. The pruned entry list is a PLANNING view;
    * mutations that republish absolute state use the full form.
    */
  private def truthFor(admit: Option[String => Boolean]): Option[Truth] = {
    val (snapOpt, dirty) = admit match {
      case Some(a) => manifest.readStateFor(a)
      case None => manifest.readState()
    }
    snapOpt.map { snap =>
    val deadRels = snap.deadRels
    if (dirty.isEmpty)
      Truth(snap.gen, snap.entries, snap.schema, deadRels, Nil, snap.dead)
    else {
      // dirty: direct write()s appended to the legacy tree since the
      // last publish — union a walk in, minus files the manifest
      // already lists (a legacy rel can be IN the manifest: a store
      // that never gen-compacted publishes legacy rels) and minus
      // tombstones (superseded files still on disk until vacuum).
      // The walk itself honors the partition pruning — recursing the
      // whole tree and filtering after would pay O(table) listings on
      // every windowed read of a dirty store.
      val known = snap.entries.map(_.rel).toSet
      val extras = admit.fold(manifest.walkLegacy())(
          manifest.walkLegacyFor)
        .filterNot(e => known(e.rel) || deadRels(e.rel))
      // the recorded schema can't cover columns the dirty appends
      // introduced — drop to footer inference until the next compact
      Truth(snap.gen, snap.entries ++ extras, None, deadRels, dirty,
        snap.dead)
    }
    }
  }

  /** Partition-admit function for a µs time window: the session-zone
    * calendar dates the window can touch (the same derivation the
    * write path's date_format uses for the dir names), boundary dates
    * kept whole — conservative at day granularity, so tightening only
    * changes the MANIFESTS READ, never the rows returned (the row
    * predicate stays exact). A hot-date HOUR sub-key
    * (`date=…/hour=…`, [[StoreManifest.subPartKeyOf]]) additionally
    * refines the window's boundary dates to whole hours — the split's
    * entire point: a one-hour query on a split date plans ~1/24 of
    * its metadata. The catch-all `""` partition always passes. None
    * (= no pruning) for an unbounded read.
    */
  private def dateAdmitOf(startUs: Option[Long],
      endUs: Option[Long]): Option[String => Boolean] =
    if (startUs.isEmpty && endUs.isEmpty) None
    else {
      val zone = java.time.ZoneId.of(
        spark.conf.get("spark.sql.session.timeZone"))
      def dayHourOf(us: Long): (String, String) = {
        val zdt = java.time.Instant
          .ofEpochSecond(Math.floorDiv(us, 1000000L)).atZone(zone)
        (zdt.toLocalDate.toString, f"${zdt.getHour}%02d")
      }
      val lo = startUs.map(dayHourOf)
      val hi = endUs.map(dayHourOf)
      // ISO dates and zero-padded hours compare chronologically as
      // strings; an hour-less key checks its date only (kept whole)
      Some(pk => pk.isEmpty || {
        val slash = pk.indexOf('/')
        val d = (if (slash > 0) pk.substring(0, slash) else pk)
          .stripPrefix("date=")
        val h = if (slash > 0)
          Some(pk.substring(slash + 1).stripPrefix("hour=")) else None
        lo.forall { case (ld, lh) =>
          ld < d || (ld == d && h.forall(lh <= _)) } &&
        hi.forall { case (hd, hh) =>
          d < hd || (d == hd && h.forall(_ <= hh)) }
      })
    }

  /** Test seam (specs only): runs after a mutation's rewrite fully
    * lands, immediately before its commit (the lease re-verify +
    * manifest publish) — the only way a spec can interleave a SECOND
    * writer's full mutation inside the first writer's in-flight one
    * and prove the publish-time fence + expected-parent CAS reject
    * the stale commit.
    */
  private[graft] var beforeCommit: () => Unit = () => ()

  /** rel → rel without its leading `_gen-…` tree segment: the LOGICAL
    * path (`date=…/hour=…/minute=…/file`), the coordinate space
    * prefixes, planning, and grain checks operate in. A rewrite tree
    * is an implementation detail of WHERE a partition's bytes live.
    */
  private def logicalRel(rel: String): String =
    if (rel.startsWith("_gen-")) rel.substring(rel.indexOf('/') + 1)
    else rel

  private def treeRootOf(rel: String): String =
    if (rel.startsWith("_gen-")) rel.take(rel.indexOf('/')) else ""

  /** Plan the given entries as a DataFrame with ZERO filesystem
    * listings: one [[ManifestFileIndex]] per tree root (Spark's
    * partition-path parser refuses mixed `date=…` depths below one
    * basePath, so legacy and each `_gen-*` tree plan as their own
    * relation), unioned by name. Partition columns, pruning and types
    * are identical to a directory read per tree.
    */
  private def relationFor(entries: Seq[StoreManifest.Entry],
      schema: Option[StructType]): Option[DataFrame] = {
    if (entries.isEmpty) return None
    val byTree = entries.groupBy(e => treeRootOf(e.rel))
    val parts = byTree.toSeq.sortBy(_._1).flatMap { case (tree, es) =>
      val base = if (tree.isEmpty) dir else s"$dir/$tree"
      val scoped = es.map(e => e.copy(rel = logicalRel(e.rel)))
      ManifestFileIndex.relation(spark, base, scoped, schema)
    }
    parts.reduceOption(_.unionByName(_, allowMissingColumns = true))
  }

  /** The legacy tree / the staging tree as DataFrames via Spark
    * directory discovery, None when that side holds no data yet. Only
    * the no-manifest mode plans this way. Schema inference doubles as
    * the distributed "any files?" probe — a driver-side walk would not
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

  /** Staged parquet files still live (listing minus tombstones: a
    * drained staged file stays on disk until vacuum, but is no longer
    * part of the table).
    */
  private def stagedStatuses(deadRels: Set[String]): Seq[FileStatus] =
    ls(new Path(stagingDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !deadRels(s"_staging/${s.getPath.getName}"))

  private def readStaged(deadRels: Set[String]): Option[DataFrame] = {
    val files = stagedStatuses(deadRels)
    if (files.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true")
      .parquet(files.map(_.getPath.toString): _*))
  }

  /** Read with optional µs time-range pruning pushed onto the partition
    * columns; mergeSchema covers dynamic log-schema drift across files
    * (the reference's open FIXME at duo/src/partition/query.rs:72-75).
    * Partition columns are dropped after pruning so the result matches
    * the logical table schema.
    */
  def read(startUs: Option[Long], endUs: Option[Long]): Option[DataFrame] = {
    if (!exists) return None
    val rowPred: Option[org.apache.spark.sql.Column] = (startUs, endUs) match {
      case (Some(s), Some(e)) => Some(col(timeCol).between(s, e))
      case (Some(s), None) => Some(col(timeCol) >= s)
      case (None, Some(e)) => Some(col(timeCol) <= e)
      case _ => None
    }
    // windowed reads assemble only the dates the window admits — the
    // manifest prune that keeps plan wall ∝ window as the table grows
    val t = truthFor(dateAdmitOf(startUs, endUs))
    val (mainOpt, grainDepth) = t match {
      case Some(tr) =>
        // partition grain from the entries themselves (logical rel
        // depth), so a mixed-grain union prunes at the COMMON grain
        val depths = tr.entries.map(e => logicalRel(e.rel).count(_ == '/'))
        (relationFor(tr.entries, tr.schema),
          if (depths.isEmpty) 0 else depths.min)
      case None =>
        val base = tryRead(dir)
        val d = base.map { b =>
          if (b.columns.contains("minute")) 3
          else if (b.columns.contains("hour")) 2
          else if (b.columns.contains("date")) 1 else 0
        }.getOrElse(0)
        (base, d)
    }
    val main = mainOpt.map { base =>
      // Partition predicate at the FINEST grain the tree exposes
      // (minute → hour → date, probed from the layout so hour/day-
      // compacted trees still prune at their own grain) + exact row
      // predicate on the time column; both push down (partition
      // pruning + parquet row-group stats). The predicate is
      // conservative (boundary partitions kept whole) and the row
      // filter is exact, so tightening the grain changes the FILES
      // READ, never the rows returned: a one-hour window over a
      // year-deep minute store plans ~60 files instead of a whole
      // day's 1,440.
      val hasHour = grainDepth >= 2 && base.columns.contains("hour")
      // minute-grain pruning additionally requires the session zone to
      // have NO UTC-offset transition near the bound instant: in a DST
      // fall-back hour the repeated local minutes are not monotone in
      // event time (01:05 EST is AFTER 01:50 EDT), so a minute bound
      // would prune same-hour partitions holding in-window rows. Near
      // a transition the boundary HOUR is kept whole instead — ≤59
      // extra files planned, rows unchanged (the row predicate is
      // exact either way).
      val hasMinute = hasHour && grainDepth >= 3 &&
        base.columns.contains("minute")
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
      val zone = java.time.ZoneId.of(
        spark.conf.get("spark.sql.session.timeZone"))
      def minuteSafe(us: Long): Boolean = {
        val rules = zone.getRules
        rules.isFixedOffset || {
          val inst = java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L))
          val next = rules.nextTransition(inst.minusSeconds(3600))
          next == null || next.getInstant.isAfter(inst.plusSeconds(3600))
        }
      }
      def prune(us: Long, lower: Boolean): org.apache.spark.sql.Column = {
        val d = dayStr(us); val h = hourStr(us); val m = minStr(us)
        val sameDay =
          if (lower) col("date") > d else col("date") < d
        if (hasMinute && minuteSafe(us)) sameDay || (col("date") === d &&
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
    // the staged files' row-group stats
    val staged = readStaged(t.map(_.deadRels).getOrElse(Set.empty))
      .map(df => rowPred.fold(df)(df.where))
    (main, staged) match {
      case (Some(m), Some(st)) => Some(m.unionByName(st,
        allowMissingColumns = true))
      case (m, st) => m.orElse(st)
    }
  }

  // ---- compaction (manifest-commit protocol) ----

  private def newGenName(): String =
    f"_gen-${System.currentTimeMillis()}%013d-" +
      java.util.UUID.randomUUID().toString

  /** Compact ONE date partition — the incremental form compaction
    * actually takes at scale: a rolling background job over
    * partitions older than the hot ingest tail, never a whole-table
    * rewrite (at 100 TB the [[compact]] full rewrite is a migration
    * tool, not a cadence). The date's current files (whatever trees
    * they live in) are rewritten into a fresh immutable `_gen-*` tree;
    * the manifest publish — prior entries minus the date's, plus the
    * rewrite's, tombstones extended — is the atomic commit. Old files
    * stay on disk for concurrent readers until [[vacuum]]. Never
    * touches other dates or the `_staging` tree (draining staging is
    * the whole-table pass's job).
    *
    * `crashAfterStep` (tests only) aborts after the numbered step:
    * 1 = rewrite tree fully written but UNPUBLISHED (readers see the
    * old state; the orphan tree is vacuum's to reclaim), 2 = manifest
    * generation published (the mutation is fully visible).
    */
  def compactDate(date: String, filesPerPartition: Int = 1,
      zorderOn: Option[(org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)] = None,
      blockSize: Option[Long] = None,
      crashAfterStep: Int = Int.MaxValue): Unit = bumpOnExit {
    fence()
    val part0 = s"date=$date"
    // the rolling heal only needs ITS date's entries (plus the
    // catch-all) — the patch-shaped commit below never republishes
    // the rest of the table, so the other partitions' manifests are
    // never read: per-date maintenance is O(date) metadata end to end
    // (a hot-split date's hour sub-keys all group under this date)
    val t = truthFor(Some(pk =>
      pk.isEmpty || StoreManifest.dateKeyOf(pk) == part0))
    val mainEntries = t.map(_.entries).getOrElse(manifest.walkLegacy())
    val part = part0
    val eD = mainEntries.filter(e => logicalRel(e.rel).startsWith(part + "/"))
    if (eD.isEmpty) return
    // partition columns re-derived from the row's own time (the store
    // invariant: dir values are pure functions of timeCol in the
    // session zone) — one derivation path whatever trees the input
    // files lived in. compactDate targets the minute layout
    // (planCompactions only flags minute-grain dates).
    val dataRows = relationFor(eD, t.flatMap(_.schema)).getOrElse(return)
      .drop("date", "hour", "minute")
    val rows = dataRows
      .withColumn("__ts", timestamp_micros(col(timeCol)))
      .withColumn("date", date_format(col("__ts"), "yyyy-MM-dd"))
      .withColumn("hour", date_format(col("__ts"), "HH"))
      .withColumn("minute", date_format(col("__ts"), "mm"))
      .drop("__ts")
    // `filesPerPartition` is a hash-partition count, so one dir's rows
    // land wholly in one task at ANY value — the file-per-dir layout
    // is count-independent. Raise it to the cluster's parallelism so
    // the rewrite spreads its dirs across cores instead of opening
    // every parquet writer in one serial task (measured on g13's
    // maintenance heals: 2-3 s single-task rewrite stages at the
    // default 1).
    val base = rows.repartition(
      math.max(filesPerPartition, spark.sparkContext.defaultParallelism),
      col("hour"), col("minute"))
    val sorted = zorderOn.fold(base) { case (x, y) =>
      base.sortWithinPartitions(col("hour"), col("minute"),
        graft.operators.Pipelines.zorderKey(x, y))
    }
    val gen = newGenName()
    val writer = sorted.write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .option("parquet.bloom.filter.expected.ndv#trace_id",
        bloomNdv.toString)
    blockSize.fold(writer)(b => writer
        .option("parquet.block.size", b.toString))
      .partitionBy("date", "hour", "minute")
      .parquet(s"$dir/$gen")
    if (crashAfterStep <= 1) return
    // COMMIT: prior entries outside the date kept verbatim — no walk —
    // plus the rewrite's walk (bounded by the files just written).
    // The prior merged schema stays exact only when it was exact
    // before (not dirty): the rewrite read with that schema pinned, so
    // its files carry the full unified column set. The lease is
    // RE-verified here (the rewrite may have run for minutes; a writer
    // fenced mid-rewrite must not land a stale truth) and the publish
    // CASes on the planning snapshot's generation.
    beforeCommit()
    fence()
    val now = System.currentTimeMillis()
    val rewritten = manifest.walkSubtree(gen)
    val info = Some(s"""{"op":"compactDate","date":"$date",""" +
      s""""wrote":${rewritten.size},"retired":${eD.size}}""")
    t match {
      case Some(snap) =>
        // patch-shaped: this mutation KNOWS its delta (the one date it
        // rewrote) — O(date), not O(table), per commit
        manifest.publishPatch(
          adds = rewritten,
          drops = eD.map(_.rel),
          deadPlus = eD.map(e => StoreManifest.Dead(e.rel, now)),
          deadMinus = Nil,
          schema = snap.schema, parent = snap.gen, info = info)
      case None => // first ever publish: absolute by construction
        val kept = mainEntries.filterNot(e =>
          logicalRel(e.rel).startsWith(part + "/"))
        // when the rewrite IS the whole table (no kept files), its
        // unified schema is exact — record it so later reads and
        // rewrites plan from the manifest instead of re-running the
        // distributed footer-merge inference every call (guide §6;
        // measured on g13's maintenance cadence: one 32-task
        // inferSchema job per read/heal without this)
        manifest.publish(kept ++ rewritten,
          if (kept.isEmpty)
            Some(StoreManifest.allNullable(dataRows.schema))
          else None,
          eD.map(e => StoreManifest.Dead(e.rel, now)),
          parent = None, info = info)
    }
  }

  /** Compact the small files the minute-grained ingest leaves behind:
    * fold the whole main truth plus the staged flushes into one fresh
    * `_gen-*` tree at the target granularity, committed by a manifest
    * generation whose tombstones cover every superseded file (old main
    * files AND the drained staged files — both stay on disk for
    * concurrent readers until [[vacuum]]). Readers are unaffected
    * (same hive layout per tree, same pruning); at scale this runs
    * periodically over stores whose main tree is compaction-owned.
    *
    * `crashAfterStep` (tests only) aborts after the numbered step:
    * 1 = rewrite tree fully written but UNPUBLISHED — readers still
    * see the pre-compaction state exactly (main + staging), the orphan
    * tree is invisible (underscore-hidden, referenced by nothing) and
    * is vacuum's to reclaim; 2 = manifest generation published — the
    * drain is fully visible, only the observed dirty markers' cleanup
    * is outstanding (harmless: a dirty walk finds no extras).
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
    *   Granularity applies to the WHOLE rewrite (each tree's hive
    *   discovery requires uniform depth), so it fits stores whose main
    *   tree is compaction-owned (the [[writeStaged]]/LSM shape); a
    *   store also taking direct minute-grained [[write]]s should stay
    *   "minute".
    */
  def compact(filesPerPartition: Int = 1,
      crashAfterStep: Int = Int.MaxValue,
      zorderOn: Option[(org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)] = None,
      blockSize: Option[Long] = None,
      granularity: String = "minute"): Unit = bumpOnExit {
    val partCols = ParquetStore.partColsFor(granularity)
    fence()
    if (!exists) return
    // SNAPSHOT: the staged file list and main truth are captured NOW;
    // a flush landing in `_staging` after this listing is cleanly
    // "late" — outside the rewrite, outside the tombstones, visible
    // before and after the commit.
    val t = truth()
    val deadRels = t.map(_.deadRels).getOrElse(Set.empty)
    val stagedF = stagedStatuses(deadRels)
    val mainEntries = t.map(_.entries).getOrElse(manifest.walkLegacy())
    val mainRows = relationFor(mainEntries, t.flatMap(_.schema))
      .map(_.drop("date", "hour", "minute"))
    val stagedRows =
      if (stagedF.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(stagedF.map(_.getPath.toString): _*))
    val all = (mainRows, stagedRows) match {
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
    // hash-partition count raised to cluster parallelism — layout-
    // neutral, write-parallel (see [[compactDate]])
    val base = derived
      .repartition(
        math.max(filesPerPartition, spark.sparkContext.defaultParallelism),
        partCols.map(col): _*)
    // partition columns lead the sort so the writer's own
    // required-ordering (it otherwise re-sorts each task by the
    // dynamic partition keys, unstably) is already satisfied and the
    // z-order survives into the files
    val gen = newGenName()
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
      .parquet(s"$dir/$gen")
    if (crashAfterStep <= 1) return
    // COMMIT: one manifest publish flips the table from (old main ∪
    // staged) to the rewrite — entries walked from the files just
    // written (bounded), schema exact (every file written from ONE
    // DataFrame), tombstones = everything superseded plus the prior
    // not-yet-vacuumed set carried forward. The lease is RE-verified
    // at the commit point (a whole-table rewrite can run for minutes;
    // a writer fenced mid-rewrite must fail here, not publish a truth
    // missing the fencer's commits) and the publish CASes on the
    // planning snapshot's generation.
    beforeCommit()
    fence()
    val now = System.currentTimeMillis()
    val rewritten = manifest.walkSubtree(gen)
    manifest.publish(rewritten, Some(all.get.schema),
      t.map(_.dead).getOrElse(Nil) ++
        (mainEntries.map(_.rel) ++
          stagedF.map(s => s"_staging/${s.getPath.getName}"))
          .map(StoreManifest.Dead(_, now)),
      parent = t.map(_.gen),
      info = Some(s"""{"op":"compact","granularity":"$granularity",""" +
        s""""wrote":${rewritten.size},""" +
        s""""retired":${mainEntries.size + stagedF.size}}"""))
    if (crashAfterStep <= 2) return
    // the legacy extras this pass folded are now in the manifest —
    // clear exactly the markers observed at the snapshot (a marker
    // dropped by a later write must survive; single-writer makes that
    // impossible here, but the discipline is free)
    manifest.clearDirty(t.map(_.dirtyNames).getOrElse(Nil))
  }

  /** Reclaim what the manifest-commit protocol deferred: tombstoned
    * files whose mutation is at least `graceMs` old, `_gen-*` trees no
    * retained generation references (crashed rewrites, or fully-
    * superseded trees emptied by tombstone reclaim), and retained
    * manifest generations beyond the newest that are older than the
    * grace window. The grace window IS the snapshot-isolation
    * guarantee: a reader holds its planned `FileStatus`es safely for
    * up to `graceMs` after the mutation that superseded them.
    * Idempotent; crash at any point leaves strictly less to reclaim.
    * Returns (tombstonedFilesDeleted, orphanTreesDeleted, gensPruned).
    */
  /** The generation files currently standing vacuum's destructive
    * sweeps down, as (name, reason, reclaimable) — the operator
    * observability surface of the future-format gate (empty ⇔ sweeps
    * run). `reclaimable = true` marks provably-dead debris (a
    * zero-byte / header-torn artifact from a non-atomic copy) the
    * operator can acknowledge via [[vacuum]]'s `reclaimUnknown`;
    * false means a NEWER binary's commit (leave it; roll this binary
    * forward) or a transient read fault (retries next pass). The flag
    * here agrees with the ack path's full rule: an artifact the PARSE
    * layer can still fold (a tear that happens to leave a
    * self-consistent header-only body) reports non-reclaimable even
    * when its header scan says torn — deleting a foldable generation
    * through the ack is never allowed.
    */
  def vacuumStandDowns(): Seq[(String, String, Boolean)] =
    manifest.futureFormatGens().map(u => (u.name, u.reason,
      u.reclaimable && !generationReadable(u.name)))

  /** @param reclaimUnknown generation file names the OPERATOR
    *   acknowledges as dead debris (from [[vacuumStandDowns]]): they
    *   are deleted before the gate is evaluated, so a permanently-torn
    *   artifact cannot disable reclaim forever. Every named file must
    *   currently classify as PROVABLY-DEAD debris (zero-byte,
    *   header-torn, torn gzip, oversized header — shapes no whole-file
    *   rename publish produces). Acknowledging anything else throws:
    *   a readable generation or an unheld name means the
    *   acknowledgment was written against stale facts, and an
    *   unknown-form / future-protocol / transient-I/O classification
    *   may be a NEWER binary's live commit — the acknowledge path
    *   must not become the rollback hazard's own delete button.
    */
  def vacuum(graceMs: Long,
      reclaimUnknown: Seq[String] = Nil): (Int, Int, Int) = bumpOnExit {
    fence()
    if (reclaimUnknown.nonEmpty) {
      // the classification is RE-VERIFIED twice, on two independent
      // header reads inside this call (never memoized): an ack racing
      // one transient read fault must not delete a healthy file — a
      // reclaim proceeds only when both fresh passes prove the same
      // dead-debris shape
      def unknownNow() =
        manifest.futureFormatGens().map(u => u.name -> u).toMap
      val (u1, u2) = (unknownNow(), unknownNow())
      // classification-reclaimable on BOTH fresh reads AND not
      // parser-readable: the parse layer is more lenient than the
      // header scan in one corner (a legacy header-only body whose
      // final newline a copy clipped still folds), and a generation
      // ANY reader can fold must never be deletable through the ack
      // path — deleting a foldable newest head would silently roll
      // the table back
      def reclaimableTwice(n: String): Boolean =
        u1.get(n).exists(_.reclaimable) &&
          u2.get(n).exists(_.reclaimable) && !generationReadable(n)
      val bad = reclaimUnknown.filterNot(reclaimableTwice)
      if (bad.nonEmpty) throw new IllegalArgumentException(
        s"$dir: reclaimUnknown names not (repeatably) classified as " +
          s"provably-dead debris: ${bad.map(n => u2.get(n)
            .map(u => s"$n (${u.reason})").getOrElse(s"$n (not held)"))
            .mkString(", ")} — re-check vacuumStandDowns() and " +
          "acknowledge only reclaimable entries; a future binary's " +
          "commit is never acknowledgeable, and a persistently " +
          "I/O-unreadable artifact is out-of-band operator surgery " +
          "on the named file, never an API call")
      reclaimUnknown.foreach(manifest.deleteGen)
    }
    val now = System.currentTimeMillis()
    // 0. lease housekeeping: claims leave a bounded trickle of
    // superseded lease files (each claim prunes to the top few), but a
    // long-lived writer that never re-claims would still pay the
    // residue in every mutation's LIST — vacuum holds the max lease
    // right now (fence() above), so everything strictly below it is a
    // dead claimant's and can go.
    myLease.foreach { mine =>
      leaseNames().filter(_ < mine)
        .foreach(n => fs.delete(new Path(lockDir, n), false): Unit)
    }
    val snap = manifest.read()
    // 1. ripe tombstones → delete the files (idempotent: missing = ok).
    // Parallel beyond a small batch: on an object store each delete is
    // a ~tens-of-ms round trip, and a compaction-heavy table whose
    // grace just expired can owe 10⁵-10⁶ of them (the 100 TB tier) —
    // sequentially that is hours, pooled it is bounded by store
    // throughput (Delta's vacuum distributes deletes for the same
    // reason; driver-side threads suffice here because a delete is
    // all-latency-no-data and FileSystem clients are thread-safe).
    val ripe = snap.map(_.dead.filter(_.millis + graceMs <= now))
      .getOrElse(Nil)
    deleteBatch(ripe.map(d => new Path(s"$dir/${d.rel}")))
    // drop now-empty partition dirs the tombstones vacated (legacy
    // tree dirs; gen trees are handled whole below). Depth-bounded:
    // only parents of deleted files are probed.
    val tableP = new Path(dir)
    ripe.map(d => new Path(s"$dir/${d.rel}").getParent).distinct
      .foreach { p =>
        var cur = p
        // a dir holding only writer metadata (`_SUCCESS`) is as empty
        // as the tombstones left it — drop the marker with the dir
        def onlyMarkers(children: Seq[FileStatus]): Boolean =
          children.forall(s => s.isFile && s.getPath.getName == "_SUCCESS")
        while (cur != null && cur != tableP && fs.exists(cur) && {
            val cs = ls(cur); cs.isEmpty || onlyMarkers(cs) }) {
          rm(cur)
          cur = cur.getParent
        }
      }
    // DESTRUCTIVE-SWEEP GATE: if ANY retained generation is in a
    // format this binary cannot interpret (unknown body form or a
    // future `protocol` capability — NOT torn debris), a newer binary
    // owns this store's tail. Steps 3/3b/4 decide what to delete by
    // "what do the generations I can read reference" — running them
    // here would destroy the newer binary's manifests and data trees
    // (the rollback-then-vacuum hazard). Stand down on those steps
    // and on step 2's republish (its CAS against the future head
    // would only fail loudly); the ripe-tombstone reclaim above is
    // still safe — a tombstone in a readable generation stays dead
    // in every later one, rels are never reused.
    val futureGens = manifest.futureFormatGens()
    if (futureGens.nonEmpty)
      // the stand-down must be LOUD: silently skipping reclaim forever
      // reads as "vacuum runs but the store grows" to an operator
      org.slf4j.LoggerFactory.getLogger(classOf[ParquetStore]).warn(
        s"$dir: vacuum destructive sweeps STANDING DOWN — " +
          s"${futureGens.size} generation(s) this binary cannot " +
          "interpret: " + futureGens.map(u =>
            s"${u.name} (${u.reason})").mkString("; ") +
          " — a newer binary's commits must not be swept; if this is " +
          "provably-dead debris, acknowledge it via " +
          "vacuum(reclaimUnknown = ...)")
    // 2. republish with the reclaimed tombstones pruned (entries and
    // schema unchanged) so the dead list never grows unboundedly —
    // lease re-verified and CAS'd on the snapshot read at step 1,
    // like every commit
    if (ripe.nonEmpty && futureGens.isEmpty) snap.foreach { s =>
      val ripeSet = ripe.map(_.rel).toSet
      fence()
      // patch-shaped: the reclaim's delta is exactly the ripe
      // tombstone list — no O(table) entry diff on a maintenance tick
      manifest.publishPatch(adds = Nil, drops = Nil,
        deadPlus = Nil, deadMinus = ripe.map(_.rel),
        schema = s.schema, parent = s.gen,
        info = Some(s"""{"op":"vacuum","reclaimed":${ripe.size}}"""))
    }
    if (futureGens.nonEmpty) return (ripe.size, 0, 0)
    // 3. prune retained generations past the grace window (newest kept
    // unconditionally — it IS the table) BEFORE the orphan scan, so a
    // tree referenced only by an out-of-grace generation is reclaimed
    // in this same pass. Chain-aware (round 18): a generation file a
    // WITHIN-grace head's delta chain folds through must survive even
    // when it is itself older than the grace — deleting a checkpoint
    // out from under a live delta head would make the head unreadable.
    val gens = manifest.genNames()
    val roots = gens.filter(g => gens.lastOption.contains(g) ||
      genFileMillis(g).forall(_ + graceMs > now))
    val needed = manifest.neededFor(roots)
    val pruned = gens.filterNot(needed)
    pruned.foreach(manifest.deleteGen)
    // 3b. partition-manifest files no surviving generation references
    // and older than the grace — crashed in-flight commits' debris
    // (commit-time retention prunes the referenced ones with their
    // generations)
    manifest.vacuumOrphanManifests(graceMs, now): Unit
    // 4. orphan gen trees: referenced (live OR tombstoned) by NO
    // retained generation and older than the grace window — crashed
    // rewrites, or trees whose last live file a prior vacuum
    // reclaimed. Every retained generation counts: an older gen is
    // exactly what a corrupt-latest reader falls back to.
    val referenced: Set[String] = manifest.readAll().flatMap(s =>
      (s.entries.map(e => treeRootOf(e.rel)) ++
        s.dead.map(d => treeRootOf(d.rel))).filter(_.nonEmpty)).toSet
    val orphans = ls(new Path(dir)).filter { s =>
      s.isDirectory && s.getPath.getName.startsWith("_gen-") &&
        !referenced(s.getPath.getName) &&
        s.getModificationTime + graceMs <= now &&
        genNameMillis(s.getPath.getName).forall(_ + graceMs <= now)
    }
    orphans.foreach(s => rm(s.getPath))
    (ripe.size, orphans.size, pruned.size)
  }

  /** Delete many files, pooled when the batch is large. 32 threads:
    * deletes are pure metadata round trips, so the win is latency
    * overlap, and more would only invite object-store rate limits.
    * Failures propagate (vacuum callers treat a failed delete as a
    * retryable pass — the tombstone stays until one succeeds).
    */
  private def deleteBatch(paths: Seq[Path]): Unit =
    if (paths.size <= 64)
      paths.foreach(p => fs.delete(p, false): Unit)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32,
        (r: Runnable) => {
          val t = new Thread(r, "store-vacuum-delete")
          t.setDaemon(true)
          t
        })
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[Unit]] =
          paths.map(p => (() => { fs.delete(p, false): Unit
            }): java.util.concurrent.Callable[Unit])
        pool.invokeAll(tasks.asJava).asScala.foreach { f =>
          // unwrap: callers must see the same IOException (naming the
          // failing path) whichever side of the pool threshold the
          // batch landed on
          try f.get(): Unit
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }

  private def genNameMillis(name: String): Option[Long] =
    name.stripPrefix("_gen-").takeWhile(_.isDigit).toLongOption

  private def genFileMillis(name: String): Option[Long] =
    name.stripPrefix("gen-").takeWhile(_.isDigit).toLongOption

  /** Staged-but-uncompacted file count — the LSM depth signal the
    * compaction policy triggers on. A driver-side listing of ONE flat
    * directory (staged flushes write few files each) minus the
    * already-drained tombstones, not a tree walk.
    */
  def stagedFileCount: Int =
    stagedStatuses(manifest.read().map(_.deadRels).getOrElse(Set.empty)).size

  /** Oldest staged file's age in µs (None when staging is empty) — the
    * policy's second trigger: a trickle ingest never reaches the count
    * threshold but must still drain eventually.
    */
  def stagedOldestAgeUs(nowUs: Long = System.currentTimeMillis() * 1000L)
      : Option[Long] = {
    val files = stagedStatuses(
      manifest.read().map(_.deadRels).getOrElse(Set.empty))
    if (files.isEmpty) None
    else Some(nowUs - files.map(_.getModificationTime).min * 1000L)
  }

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
    * compaction-owned; a dirty store (direct-write ingest) pays a
    * legacy-tree walk until the next compaction folds the appends.
    * ZERO data reads either way. Leaf dirs are LOGICAL (gen-tree
    * prefixes stripped), so a date whose files straddle a rewrite tree
    * and fresh legacy flushes is counted — and healed — as one date.
    */
  def planCompactions(maxFilesPerDate: Int = 8,
      minAvgBytes: Long = 4L * 1024 * 1024): Seq[String] = {
    if (!exists) return Seq.empty
    val entries = truth().map(_.entries).getOrElse(manifest.walkLegacy())
    entries.groupBy(e => logicalRel(e.rel).takeWhile(_ != '/'))
      .collect { case (datePart, files) if datePart.startsWith("date=") && {
          val rels = files.map(e => logicalRel(e.rel))
          val minuteGrain = rels.forall(_.count(_ == '/') == 3)
          val leafDirs = rels
            .map(r => r.take(r.lastIndexOf('/'))).distinct.size
          minuteGrain && files.size > leafDirs &&
            (files.size > maxFilesPerDate ||
              files.map(_.size).sum / files.size < minAvgBytes)
        } => (datePart.stripPrefix("date="), files.size)
      }
      .toSeq.sortBy { case (d, n) => (-n, d) }.map(_._1)
  }

  /** Metadata-only granularity heal (maintenance): split any hot
    * UNSPLIT date's giant manifest into hour sub-keys — one manifest
    * commit, zero data movement (see
    * [[StoreManifest.resplitHot]]). Lets a table that concentrated
    * files before the threshold (or under an older binary) adopt the
    * hour layout without waiting for a data rewrite of that date.
    * Returns the dates re-keyed; no-op (and no commit) otherwise.
    */
  def resplitHotDates(): Seq[String] = bumpOnExit {
    if (!exists) return Nil
    fence()
    manifest.resplitHot()
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
    * SEES. Mutations on one store are serialized by the owning
    * engine and fenced against other writers; concurrent READERS are
    * safe across a drain (snapshot isolation — see the class doc).
    */
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
    *  - the MAIN truth drops whole `date=` partitions strictly before
    *    the cutoff's session-zone date — the drop-old-days shape every
    *    observability retention job runs (pure metadata; the cutoff's
    *    own date is kept whole);
    *  - the STAGING tree drops a file when its parquet footer says
    *    max(timeCol) < the cutoff's day floor — file-granular, footer
    *    stats only, still no data read. A file STRADDLING the boundary
    *    is kept whole (conservative: retention may retain up to one
    *    extra day/file; exact trimming is what the next [[compact]]
    *    gives, since its rewrite re-derives dirs from surviving rows).
    *
    * With a live manifest the drop is a pure manifest operation:
    * survivors republished, dropped files tombstoned (schema-free —
    * dropping a date can retire the only files carrying a drifted
    * column, and a stale schema would resurrect it as all-null;
    * readers infer from footers until the next compact re-publishes),
    * bytes reclaimed by [[vacuum]] after the grace window — so
    * concurrent readers planned before the expiry stay green. A
    * never-compacted store (no manifest) deletes eagerly, as plain
    * listing-mode stores always have. Returns
    * (datePartitionsDropped, stagedFilesDropped).
    */
  def expire(cutoffUs: Long): (Int, Int) = bumpOnExit {
    fence()
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
    // retention only needs the EXPIRED dates' entries (the patch's
    // drops) — surviving partitions' manifests are never read, so a
    // retention tick is O(expired dates), not O(table)
    truthFor(Some(pk => pk.isEmpty || StoreManifest.dateKeyOf(pk)
        .stripPrefix("date=") < cutoffDate.toString)) match {
      case Some(t) =>
        // ISO dates compare chronologically as strings
        def dateOf(rel: String): String = {
          val l = logicalRel(rel)
          l.take(math.max(l.indexOf('/'), 0)).stripPrefix("date=")
        }
        val (droppedE, kept) = t.entries.partition(e =>
          dateOf(e.rel).nonEmpty && dateOf(e.rel) < cutoffDate.toString)
        val stagedDead = stagedStatuses(t.deadRels).filter(s =>
          fileMaxStat(s.getPath).exists(_ < dayFloorUs))
        if (droppedE.isEmpty && stagedDead.isEmpty) return (0, 0)
        val now = System.currentTimeMillis()
        fence()
        // patch-shaped: the expiry's delta is exactly the dropped
        // dates' entries. schema=None keeps the documented
        // drifted-column contract (readers fall back to footer
        // inference after an expire), same as the absolute form.
        manifest.publishPatch(adds = Nil,
          drops = droppedE.map(_.rel),
          deadPlus = (droppedE.map(_.rel) ++
            stagedDead.map(s => s"_staging/${s.getPath.getName}"))
            .map(StoreManifest.Dead(_, now)),
          deadMinus = Nil,
          schema = None, parent = t.gen,
          info = Some(s"""{"op":"expire","cutoffDate":"$cutoffDate",""" +
            s""""retired":${droppedE.size + stagedDead.size}}"""))
        (droppedE.map(e => logicalRel(e.rel).takeWhile(_ != '/'))
          .distinct.size, stagedDead.size)
      case None =>
        // never-compacted store: eager deletes, the plain shape.
        // Idempotent — a crash mid-expiry leaves fewer dirs for the
        // next run.
        val expiredDirs = ls(new Path(dir))
          .filter(s => s.isDirectory &&
            s.getPath.getName.startsWith("date=") &&
            s.getPath.getName.stripPrefix("date=") < cutoffDate.toString)
        expiredDirs.foreach(s => rm(s.getPath))
        val droppedFiles = ls(new Path(stagingDir))
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .count { s =>
            // stats missing ⇒ unprovable ⇒ keep (loud is
            // rowGroupRanges' job; retention must only ever delete
            // what it can prove dead)
            fileMaxStat(s.getPath).exists(_ < dayFloorUs) && {
              fs.delete(s.getPath, false): Unit; true
            }
          }
        (expiredDirs.size, droppedFiles)
    }
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
    * main truth — the metadata a stats-aware reader prunes on
    * ([[readSpanRange]]'s skip measurement reads this). With a live
    * manifest the file list comes straight from it (ZERO listings —
    * footer opens are reads of the files themselves); a never-
    * compacted store walks. Staged flushes are deliberately excluded:
    * `_staging` is the un-organized tail whose layout [[compact]] has
    * not built yet, so its stats are not part of any layout-pruning
    * claim — measure skip ratios after the drain, the state the claim
    * is about.
    */
  def rowGroupRanges(
      cols: Seq[String]): Seq[(String, Map[String, (Long, Long)])] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val files: Seq[Path] =
      truth().map(_.entries).getOrElse(manifest.walkLegacy())
        .map(e => new Path(s"$dir/${e.rel}"))
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
    * Listing discipline for object stores: with a manifest, the whole
    * plan (prefix existence, coarse fallback, file expansion) derives
    * from the one GET. Without one, prefix existence is probed with
    * ONE listing per distinct PARENT directory (not one HEAD per
    * prefix — a day window is 1,440 minute prefixes but only ~24
    * parents), and the coarse-fallback ancestor listings are memoized
    * per ancestor within the call, so a wide window over a day-grain
    * tree lists each date dir once. Cost is bounded by DIRECTORIES
    * TOUCHED, never by window width.
    *
    * Schema contract when `schema` is None: the result's column set is
    * the WINDOW-LOCAL merged schema — inferred over exactly the files
    * the window selects — on every path (manifest, dirty, listing), so
    * an identical query answers with an identical shape regardless of
    * background maintenance state. Callers that pin hashes pass
    * `schema` explicitly, which every path honors identically.
    */
  def readPrefixes(startUs: Long, endUs: Long,
      schema: Option[StructType] = None): Option[DataFrame] = {
    val wantedRel = TimePrefix.generatePrefixes(startUs, endUs)
      .map(_.stripSuffix("/"))
    val t = truthFor(dateAdmitOf(Some(startUs), Some(endUs)))
    val entryByLogical: Map[String, Seq[StoreManifest.Entry]] =
      t.map(_.entries.groupBy(e => logicalRel(e.rel)))
        .getOrElse(Map.empty)
    // LOGICAL parent → child names, derived once from the truth
    // entries (manifest mode: zero listings) or from memoized
    // per-parent listings (legacy mode)
    val byParent: Option[Map[String, Set[String]]] = t.map { tr =>
      val m = scala.collection.mutable.Map.empty[String, Set[String]]
      tr.entries.foreach { e =>
        var parent = ""
        logicalRel(e.rel).split("/").foreach { seg =>
          m.update(parent, m.getOrElse(parent, Set.empty) + seg)
          parent = if (parent.isEmpty) seg else s"$parent/$seg"
        }
      }
      m.toMap
    }
    val childNames = scala.collection.mutable.Map.empty[String, Set[String]]
    def children(parentRel: String): Set[String] = byParent match {
      case Some(m) => m.getOrElse(parentRel, Set.empty)
      case None => childNames.getOrElseUpdate(parentRel,
        ls(new Path(if (parentRel.isEmpty) dir else s"$dir/$parentRel"))
          .map(_.getPath.getName).toSet)
    }
    def prefixExists(rel: String): Boolean = {
      val slash = rel.lastIndexOf('/')
      val parent = if (slash < 0) "" else rel.substring(0, slash)
      children(parent).contains(rel.substring(slash + 1))
    }
    val (present, missing) = wantedRel.partition(prefixExists)
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
    val dirFiles = scala.collection.mutable.Map.empty[String, Seq[String]]
    def parquetChildFiles(parentRel: String): Seq[String] = byParent match {
      // truth children are file AND subdir names; the .parquet filter
      // keeps exactly the direct files, like the listing path
      case Some(m) =>
        m.getOrElse(parentRel, Set.empty).toSeq
          .filter(_.endsWith(".parquet")).sorted
          .map(n => if (parentRel.isEmpty) n else s"$parentRel/$n")
      case None => dirFiles.getOrElseUpdate(parentRel,
        ls(new Path(if (parentRel.isEmpty) dir else s"$dir/$parentRel"))
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => if (parentRel.isEmpty) s.getPath.getName
            else s"$parentRel/${s.getPath.getName}"))
    }
    val fallbackRels = missing.flatMap { p =>
      val segs = p.split("/")
      // coarser ancestors, nearest first (minute → hour, date; hour →
      // date) — never above the date level; the FIRST existing one is
      // the coarse dir that holds this window's rows, if any
      (1 until segs.length)
        .map(k => segs.dropRight(k).mkString("/"))
        .find(prefixExists)
        .toSeq
        .flatMap(parquetChildFiles)
    }.distinct
    val main = t match {
      case Some(tr) =>
        // prefix → file expansion by binary search over the sorted
        // LOGICAL rel list: O(P log N + hits), not O(P·N) — a day
        // window over a million-file manifest is 1,440 probes, not
        // 1.4B startsWith
        val sortedRels = entryByLogical.keys.toIndexedSeq.sorted
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
        val expanded = present.flatMap(relsUnder) ++ fallbackRels
        val selected = expanded.distinct
          .flatMap(entryByLogical.getOrElse(_, Nil))
        relationFor(selected, schema).map { df0 =>
          val df = df0.drop("date", "hour", "minute")
          if (fallbackRels.isEmpty) df
          else df.where(col(timeCol) >= loUs && col(timeCol) < hiUs)
        }
      case None =>
        val mainInputs = (present ++ fallbackRels).map(r => s"$dir/$r")
        if (mainInputs.isEmpty) None else {
          val reader = spark.read.option("mergeSchema", "true")
            .option("basePath", dir)
          val withSchema = schema.map(reader.schema).getOrElse(reader)
          val df = withSchema.parquet(mainInputs: _*)
            .drop("date", "hour", "minute")
          Some(if (fallbackRels.isEmpty) df
            else df.where(col(timeCol) >= loUs && col(timeCol) < hiUs))
        }
    }
    val staged = readStaged(t.map(_.deadRels).getOrElse(Set.empty))
      .map(_.where(col(timeCol) >= loUs && col(timeCol) < hiUs))
    (main, staged) match {
      case (Some(m), Some(st)) =>
        Some(m.unionByName(st, allowMissingColumns = true))
      case (m, st) => m.orElse(st)
    }
  }
}

object ParquetStore {
  /** Per-table-dir mutation epochs (see the instance field). */
  private val epochs = new scala.collection.concurrent.TrieMap[
    String, java.util.concurrent.atomic.AtomicLong]

  /** AS-OF resolution over the eligible (committed ≤ T) generations,
    * newest readable wins. Same-millisecond commits (ADVICE r20): the
    * gen file name's UUID suffix is creation entropy, not a lineage
    * order, so among candidates sharing the max millis the one whose
    * fold SUPERSEDES the others — the one no other tied candidate
    * names as parent — resolves T; parent reads happen only on a tie.
    * An ambiguous tie (several non-parents) keeps the stable name
    * order, and an unreadable winner falls back exactly as before.
    */
  private[graft] def resolveAsOf(eligible: Seq[String],
      millisOf: String => Option[Long],
      parentOf: String => Option[String],
      readable: String => Boolean): Option[String] = {
    val byMs = eligible.flatMap(g => millisOf(g).map(_ -> g))
    if (byMs.isEmpty) return None
    val maxMs = byMs.map(_._1).max
    val (tied, earlier) = byMs.partition(_._1 == maxMs)
    val tiedReadable = tied.map(_._2).filter(readable)
    val winner =
      if (tiedReadable.size > 1) {
        val parents = tiedReadable.flatMap(parentOf).toSet
        tiedReadable.filterNot(parents) match {
          case Seq(only) => Some(only)
          case _ => tiedReadable.lastOption
        }
      } else tiedReadable.lastOption
    winner.orElse(
      earlier.map(_._2).reverseIterator.find(readable))
  }

  /** A mutation was attempted by a store instance whose writer lease
    * has been superseded: a second writer claimed the store root. The
    * single-writer contract is enforced, not narrated — the loser
    * fails loudly; readers are unaffected.
    */
  final class WriterFencedException(msg: String)
    extends IllegalStateException(msg)

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
