package graft.store

import scala.collection.mutable.LinkedHashMap

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A Spark `FileIndex` built entirely from [[StoreManifest]] entries:
  * every `FileStatus` Spark needs for split planning (path, size,
  * mtime) comes from the manifest's one GET, so planning a scan of the
  * partitioned tree performs ZERO filesystem listings. This is the
  * piece `spark.read.parquet(file, file, ...)` cannot give — Spark's
  * own `InMemoryFileIndex` re-lists every input path it is handed
  * (one LIST per file on an object store, the exact rate-limited call
  * the manifest exists to avoid). The partition columns (`date=`,
  * `hour=`, `minute=`) are inferred from the manifest paths by the
  * same `inferPartitioning` the directory scan uses, so partition
  * pruning, types, and the resulting schema are identical to a
  * directory read — only the I/O to discover the files is gone.
  * (Iceberg/Delta read planning at this store's scale; the reference
  * lists per prefix at query time, duo/src/partition/query.rs.)
  *
  * Spark-internal surface, version-pinned: this extends
  * `execution.datasources.PartitioningAwareFileIndex` and the
  * companion casts to `sql.classic.SparkSession` for
  * `baseRelationToDataFrame` — developer-internal API, stable across
  * Spark 4.1.x (the build's pinned line) but free to move in a minor
  * bump. Upgrade checklist: (1) `leafFiles`/`leafDirToChildrenFiles`/
  * `partitionSpec` signatures, (2) the "basePath" parameters key,
  * (3) the classic-session cast. Breakage degrades loudly at compile
  * time, not silently at read time; if the index ever has to be
  * dropped, [[ParquetStore]]'s legacy listing mode is the functional
  * (slower) fallback for never-compacted stores, and a
  * DataSourceV2 `FileTable` port is the forward path.
  */
final class ManifestFileIndex(
    spark: SparkSession,
    tableDir: Path,
    statuses: Seq[FileStatus])
  extends PartitioningAwareFileIndex(
    spark, Map("basePath" -> tableDir.toString), None) {

  override def rootPaths: Seq[Path] = Seq(tableDir)

  override val leafFiles: LinkedHashMap[Path, FileStatus] =
    LinkedHashMap(statuses.map(s => s.getPath -> s): _*)

  override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap

  private lazy val spec: PartitionSpec = inferPartitioning()
  override def partitionSpec(): PartitionSpec = spec

  override def refresh(): Unit = ()
}

object ManifestFileIndex {

  /** Nominal block size for the synthesized statuses; parquet split
    * planning derives split sizes from `maxPartitionBytes`/file
    * length, not this, so the value only has to be sane.
    */
  private val NominalBlockSize = 128L * 1024 * 1024

  /** The given manifest entries as a DataFrame, planned listing-free.
    * `dataSchema` skips footer inference when the caller already knows
    * the (merged) schema; otherwise schemas are merged from the
    * entries' footers — reads of the files themselves, still zero
    * listings. Returns None for an empty selection (mirrors the
    * "no files" read contract).
    */
  def relation(spark: SparkSession, tableDir: String,
      entries: Seq[StoreManifest.Entry],
      dataSchema: Option[StructType]): Option[DataFrame] = {
    if (entries.isEmpty) return None
    val statuses = entries.map(e => new FileStatus(e.size, false, 1,
      NominalBlockSize, e.mtime, new Path(s"$tableDir/${e.rel}")))
    val index = new ManifestFileIndex(spark, new Path(tableDir), statuses)
    val fmt = new ParquetFileFormat()
    val opts = Map("mergeSchema" -> "true")
    // all-nullable mirrors DataSource.resolveRelation's asNullable, so
    // a caller-pinned schema reads exactly as through spark.read.schema
    dataSchema.orElse(fmt.inferSchema(spark, opts, statuses)).map { ds =>
      val rel = HadoopFsRelation(index, index.partitionSchema,
        StoreManifest.allNullable(ds), None, fmt, opts)(spark)
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .baseRelationToDataFrame(rel)
    }
  }
}
