package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** A durable incremental CDC consumer over one store's generation
  * history — the operational layer on the raw diff surfaces
  * ([[ParquetStore.changesBetween]]/`removedBetween`): a named cursor
  * persisted next to the table, `poll()` returning the unconsumed
  * increment, `commit()` advancing the cursor through the same
  * temp-write + rename atom every manifest commit uses. The reference
  * has no change feed at all (duo consumers re-query); this is the
  * Delta `startingVersion` streaming idea at this store's scale,
  * without internal streaming APIs.
  *
  * Delivery contract: AT-LEAST-ONCE. A crash between `poll()` and
  * `commit()` re-delivers the same increment on restart (the cursor
  * is the consumer's only state); exactly-once is the consumer's to
  * build by committing the cursor transactionally with its sink —
  * the same contract as a Kafka consumer group's offsets.
  *
  * Increment sides are Options because "no rows on this side" and
  * "diff not computable" are different facts: a pure-housekeeping
  * commit (vacuum's tombstone reclaim) or a delete-only commit
  * (expire) still delivers, with the empty side None — the consumer
  * advances its cursor through data-less generations instead of
  * misreading them as a gap. Computability is verified against the
  * retained generation set BEFORE and AFTER the diffs are built, so a
  * vacuum pruning the cursor's generation mid-poll can never yield a
  * half-increment (adds without their deletes): the post-check
  * downgrades it to a resync.
  *
  * Retention interaction: an increment is computable only while the
  * cursor's generation is retained (manifest heads + vacuum grace —
  * the window that also bounds time travel). A consumer that falls
  * behind it gets a RESYNC: the full table as of the newest
  * generation, `resync = true`, so a downstream that honors the flag
  * (truncate-and-reload) never silently misses the pruned middle.
  * The first-ever poll is the same shape: snapshot, then increments.
  *
  * Multiple independent consumers coexist (one cursor file each under
  * `_cdc/`); the underscore prefix hides the directory from Spark's
  * partition discovery like `_staging`/`_manifest`.
  */
final class CdcFeed private[store] (store: ParquetStore,
    fs: org.apache.hadoop.fs.FileSystem, tableDir: String,
    consumer: String, keyCols: Seq[String]) {

  require(consumer.nonEmpty && consumer.forall(c =>
    c.isLetterOrDigit || c == '-' || c == '_'),
    s"consumer name must be [A-Za-z0-9_-]+: '$consumer'")

  private def cdcDir = new Path(tableDir, "_cdc")

  // cursor commits rename to a NEW unique name (like manifest
  // generations) and prune older ones afterwards — there is never a
  // delete-then-recreate window on a single path, so a crash at any
  // point leaves the previous cursor standing and a concurrent reader
  // always finds A maximum. <consumer>.cursor-<millis>-<uuid>
  private def cursorFiles(): Seq[String] =
    StoreFs.list(fs, cdcDir).map(_.getPath.getName)
      .filter(_.startsWith(s"$consumer.cursor-"))

  /** The committed cursor: the newest generation this consumer has
    * fully processed. None before the first [[commit]].
    */
  def cursor(): Option[String] = cursor(retriesLeft = 1)

  private def cursor(retriesLeft: Int): Option[String] =
    cursorFiles().maxOption.flatMap { name =>
      // a concurrent commit may prune `name` between the listing and
      // the read — re-list once; the newer cursor it renamed in is
      // there (prune runs strictly after the rename)
      try StoreFs.readString(
          new Path(cdcDir, name).toString)
        .map(_.trim).filter(_.startsWith("gen-"))
      catch {
        case _: java.io.IOException if retriesLeft > 0 =>
          cursor(retriesLeft - 1)
      }
    }

  /** The unconsumed increment, or None when the consumer is caught up
    * (or the table has no generation yet). `added` rows are inserts
    * since the cursor (row-exact when the feed was built with
    * `keyCols`, file-granular otherwise — same caveats as the diff
    * surfaces) and `removed` the delete side; either is None when
    * that side has no rows. Call [[commit]] with the increment's
    * `toGen` once the rows are safely down; polling again before
    * that re-delivers.
    */
  def poll(): Option[CdcFeed.Increment] = {
    val newest = store.generations().lastOption.getOrElse(return None)
    cursor() match {
      case Some(c) if c == newest => None // caught up
      case Some(c) if store.generationReadable(c) &&
          store.generationReadable(newest) =>
        val added =
          if (keyCols.nonEmpty) store.changesBetween(c, newest, keyCols)
          else store.changesBetween(c, newest)
        val removed =
          if (keyCols.nonEmpty) store.removedBetween(c, newest, keyCols)
          else store.removedBetween(c, newest)
        // post-check BOTH ends: if retention pruned c — or newer
        // commits landed and vacuum pruned the captured `newest` —
        // while the diffs were being planned, one side may have
        // quietly come back None-for-the-wrong-reason. A half
        // increment (adds without their deletes, or both sides None
        // with real changes in between) must downgrade to a resync,
        // never commit as truth.
        if (store.generationReadable(c) && store.generationReadable(newest))
          Some(CdcFeed.Increment(newest, added, removed, resync = false))
        else // re-fetch: the captured newest itself may be the pruned one
          store.generations().lastOption.flatMap(resyncTo)
      case Some(_) => resyncTo(newest) // cursor outran by retention
      case None => resyncTo(newest) // first poll: snapshot, like
                                    // Delta's startingVersion=latest-full
    }
  }

  /** Full-snapshot delivery: `added` is the whole table as of
    * `newest` (None when that table is EMPTY — an empty resync still
    * delivers, so a consumer that fell behind a delete-everything
    * expiry learns to truncate).
    */
  private def resyncTo(newest: String): Option[CdcFeed.Increment] =
    if (!store.generationReadable(newest)) None // corrupt head: retry later
    else Some(CdcFeed.Increment(newest, store.readGeneration(newest),
      None, resync = true))

  /** Durably advance the cursor to `gen` (an increment's `toGen`):
    * temp-write + rename to a fresh unique cursor file, then best-
    * effort prune of the older ones — the same publish discipline as
    * a manifest generation, so a crash at ANY point leaves a readable
    * cursor (the previous one, or both with the new one winning the
    * max), never none and never a torn body.
    */
  def commit(gen: String): Unit = {
    require(gen.startsWith("gen-"), s"not a generation name: '$gen'")
    fs.mkdirs(cdcDir): Unit
    val uuid = java.util.UUID.randomUUID().toString
    val tmp = new Path(cdcDir, s".tmp-$uuid")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val cur = new Path(cdcDir,
      f"$consumer.cursor-${System.currentTimeMillis()}%019d-$uuid")
    if (!fs.rename(tmp, cur)) {
      fs.delete(tmp, false): Unit
      throw new java.io.IOException(s"cursor commit failed: $cur")
    }
    cursorFiles().filter(_ < cur.getName).foreach(n =>
      fs.delete(new Path(cdcDir, n), false): Unit)
  }

  /** Deregister this consumer: delete its cursor files, so the next
    * [[poll]] starts over with a first-poll resync. Decommissioned
    * consumers (and throwaway ones — probes, gates) call this instead
    * of leaving a dead cursor under `_cdc` forever.
    */
  def reset(): Unit =
    cursorFiles().foreach(n =>
      fs.delete(new Path(cdcDir, n), false): Unit)
}

object CdcFeed {
  /** One unconsumed increment: consume `added` (inserts) and
    * `removed` (invalidations) — None on a side means no rows there,
    * e.g. a housekeeping commit delivers with both None and the
    * consumer just advances — then [[CdcFeed.commit]] `toGen`. When
    * `resync` is true the poll could not compute a diff (first poll,
    * or the cursor's generation was pruned by retention): `added` is
    * the FULL table as of `toGen` (None = that table is empty) and
    * the consumer must truncate-and-reload rather than append.
    */
  final case class Increment(toGen: String, added: Option[DataFrame],
      removed: Option[DataFrame], resync: Boolean)
}
