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

  private def cursorPath = new Path(tableDir, s"_cdc/$consumer.cursor")

  /** The committed cursor: the newest generation this consumer has
    * fully processed. None before the first [[commit]].
    */
  def cursor(): Option[String] =
    if (!fs.exists(cursorPath)) None
    else {
      val in = fs.open(cursorPath)
      val raw = try in.readAllBytes() finally in.close()
      Some(new String(raw, java.nio.charset.StandardCharsets.UTF_8).trim)
        .filter(_.startsWith("gen-"))
    }

  /** The unconsumed increment, or None when the consumer is caught up
    * (or the table has no generation yet). `added` rows are inserts
    * since the cursor (row-exact when the feed was built with
    * `keyCols`, file-granular otherwise — same caveats as the diff
    * surfaces); `removed` is the delete side, None on resync. Call
    * [[commit]] with the increment's `toGen` once the rows are safely
    * down; polling again before that re-delivers.
    */
  def poll(): Option[CdcFeed.Increment] = {
    val gens = store.generations()
    val newest = gens.lastOption.getOrElse(return None)
    cursor() match {
      case Some(c) if c == newest => None // caught up
      case Some(c) =>
        val added =
          if (keyCols.nonEmpty) store.changesBetween(c, newest, keyCols)
          else store.changesBetween(c, newest)
        added match {
          case Some(df) =>
            val removed =
              if (keyCols.nonEmpty)
                store.removedBetween(c, newest, keyCols)
              else store.removedBetween(c, newest)
            Some(CdcFeed.Increment(newest, df, removed, resync = false))
          case None => resyncTo(newest) // cursor outran by retention
        }
      case None => resyncTo(newest) // first poll: snapshot, like
                                    // Delta's startingVersion=latest-full
    }
  }

  private def resyncTo(newest: String): Option[CdcFeed.Increment] =
    store.readGeneration(newest)
      .map(df => CdcFeed.Increment(newest, df, None, resync = true))

  /** Durably advance the cursor to `gen` (an increment's `toGen`) —
    * temp-write + rename, the same atom as a manifest commit, so a
    * torn cursor can never be read (rename publishes whole files) and
    * a crash mid-commit leaves the previous cursor standing.
    */
  def commit(gen: String): Unit = {
    require(gen.startsWith("gen-"), s"not a generation name: '$gen'")
    fs.mkdirs(cursorPath.getParent): Unit
    val tmp = new Path(cursorPath.getParent,
      s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(cursorPath)) fs.delete(cursorPath, false): Unit
    if (!fs.rename(tmp, cursorPath))
      throw new java.io.IOException(s"cursor commit failed: $cursorPath")
  }
}

object CdcFeed {
  /** One unconsumed increment: consume `added` (and invalidate
    * `removed` when present), then [[CdcFeed.commit]] `toGen`. When
    * `resync` is true the poll could not compute a diff (first poll,
    * or the cursor's generation was pruned by retention): `added` is
    * the FULL table as of `toGen` and the consumer must
    * truncate-and-reload rather than append.
    */
  final case class Increment(toGen: String, added: DataFrame,
      removed: Option[DataFrame], resync: Boolean)
}
