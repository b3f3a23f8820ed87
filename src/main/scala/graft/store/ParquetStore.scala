package graft.store

import java.io.File

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
  * At scale: minute-grained dirs are only sensible for recent data; the
  * same layout compacts upward (minute→hour→day files) without changing
  * readers because pruning is on column predicates, not path strings.
  */
final class ParquetStore(spark: SparkSession, root: String, table: String,
    timeCol: String) {

  private def dir = s"$root/$table"

  /** Append a batch, derivating partition columns from the row's µs
    * epoch time column.
    *
    * @param onePerPartition repartition by the derived time-partition
    *   keys before writing, so each (date, hour, minute) dir gets ONE
    *   file per flush instead of one per upstream task. Without it a
    *   flush whose rows span D time partitions across T tasks writes
    *   up to D×T files — a streamed ingest whose micro-batches carry a
    *   wide event-time spread (or any wide batch append) should set
    *   it; the shuffle is bounded by the flush batch, and the
    *   [[compact]] pass still exists for merging across flushes.
    */
  def write(batch: DataFrame, onePerPartition: Boolean = false): Unit = {
    val derived = batch
      .withColumn("__ts", timestamp_micros(col(timeCol)))
      .withColumn("date", date_format(col("__ts"), "yyyy-MM-dd"))
      .withColumn("hour", date_format(col("__ts"), "HH"))
      .withColumn("minute", date_format(col("__ts"), "mm"))
      .drop("__ts")
    (if (onePerPartition)
       derived.repartition(col("date"), col("hour"), col("minute"))
     else derived)
      .write
      .mode("append")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .partitionBy("date", "hour", "minute")
      .parquet(dir)
  }

  def exists: Boolean = new File(dir).exists()

  /** Read with optional µs time-range pruning pushed onto the partition
    * columns; mergeSchema covers dynamic log-schema drift across files
    * (the reference's open FIXME at duo/src/partition/query.rs:72-75).
    * Partition columns are dropped after pruning so the result matches
    * the logical table schema.
    */
  def read(startUs: Option[Long], endUs: Option[Long]): Option[DataFrame] = {
    recover()
    if (!exists) return None
    val base = spark.read.option("mergeSchema", "true").parquet(dir)
    val pruned = (startUs, endUs) match {
      case (Some(s), Some(e)) =>
        // Conservative day-granular partition predicate + exact row
        // predicate on the time column; both push down (dir pruning +
        // parquet row-group stats).
        base.where(
          col("date") >= date_format(timestamp_micros(lit(s)), "yyyy-MM-dd") &&
          col("date") <= date_format(timestamp_micros(lit(e)), "yyyy-MM-dd") &&
          col(timeCol).between(s, e))
      case (Some(s), None) =>
        base.where(col("date") >= date_format(timestamp_micros(lit(s)), "yyyy-MM-dd") &&
          col(timeCol) >= s)
      case (None, Some(e)) =>
        base.where(col("date") <= date_format(timestamp_micros(lit(e)), "yyyy-MM-dd") &&
          col(timeCol) <= e)
      case _ => base
    }
    Some(pruned.drop("date", "hour", "minute"))
  }

  private def stagedDir = s"$root/.compact-$table"
  private def oldDir = s"$root/.old-$table"
  private def stagedMarker = new File(stagedDir, "_STAGED_OK")

  private def rm(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(): Unit
  }

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
    val live = new File(dir)
    val old = new File(oldDir)
    val staged = new File(stagedDir)
    if (live.exists()) {
      if (staged.exists()) rm(staged)
      if (old.exists()) rm(old)
    } else if (stagedMarker.exists()) {
      if (!staged.renameTo(live))
        throw new java.io.IOException(s"recover: rename $stagedDir -> $dir failed")
      new File(live, "_STAGED_OK").delete(): Unit
      if (old.exists()) rm(old)
    } else if (old.exists()) {
      rm(staged)
      if (!old.renameTo(live))
        throw new java.io.IOException(s"recover: rename $oldDir -> $dir failed")
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
    *   each rewritten partition. The motivating pair for the span
    *   table is (start-minute, capped duration-ms): trace search
    *   filters on BOTH a start range and a duration range (SURVEY
    *   F9/F10, duo/src/query.rs:141-152), and a time-partitioned
    *   layout alone leaves the duration predicate scanning every
    *   row group in the admitted partitions. Z-ordering the rewrite
    *   makes per-row-group min/max stats tight in both dimensions at
    *   once, so parquet row-group pruning serves either predicate —
    *   the [[graft.operators.Pipelines.zorderKey]] layout applied to
    *   the engine's own storage (rectangle guarantee proven at p18).
    */
  def compact(filesPerPartition: Int = 1,
      crashAfterStep: Int = Int.MaxValue,
      zorderOn: Option[(org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)] = None): Unit = {
    recover()
    if (!exists) return
    val base = spark.read.option("mergeSchema", "true").parquet(dir)
      .repartition(filesPerPartition, col("date"), col("hour"), col("minute"))
    // partition columns lead the sort so the writer's own
    // required-ordering (it otherwise re-sorts each task by the
    // dynamic partition keys, unstably) is already satisfied and the
    // z-order survives into the files
    zorderOn.fold(base) { case (x, y) =>
      base.sortWithinPartitions(col("date"), col("hour"), col("minute"),
        graft.operators.Pipelines.zorderKey(x, y))
    }
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .partitionBy("date", "hour", "minute")
      .parquet(stagedDir)
    stagedMarker.createNewFile(): Unit
    if (crashAfterStep <= 1) return
    val live = new File(dir)
    if (!live.renameTo(new File(oldDir)))
      throw new java.io.IOException(s"compact: rename $dir -> $oldDir failed")
    if (crashAfterStep <= 2) return
    // the marker rides along into the live tree and is dropped below;
    // parquet readers ignore underscore-prefixed files either way
    if (!new File(stagedDir).renameTo(live))
      throw new java.io.IOException(s"compact: rename $stagedDir -> $dir failed")
    new File(live, "_STAGED_OK").delete(): Unit
    if (crashAfterStep <= 3) return
    rm(new File(oldDir))
  }

  /** Reference-shaped read path: enumerate minimal partition prefixes
    * with [[TimePrefix]] and read only those directories (the
    * ListingTable-over-prefixes plan, duo/src/partition/query.rs:38-60).
    */
  def readPrefixes(startUs: Long, endUs: Long,
      schema: Option[StructType] = None): Option[DataFrame] = {
    val paths = TimePrefix.generatePrefixes(startUs, endUs)
      .map(p => s"$dir/$p")
      .filter(p => new File(p).exists())
    if (paths.isEmpty) None
    else {
      val reader = spark.read.option("mergeSchema", "true")
        .option("basePath", dir)
      val withSchema = schema.map(reader.schema).getOrElse(reader)
      Some(withSchema.parquet(paths: _*).drop("date", "hour", "minute"))
    }
  }
}
