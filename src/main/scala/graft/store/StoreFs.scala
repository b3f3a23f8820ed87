package graft.store

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Store-layer filesystem access (S5): every metadata operation the
  * store performs — existence probes, listings, staging renames, marker
  * files, the tiny JSON registries — goes through
  * `org.apache.hadoop.fs.FileSystem` resolved from the PATH'S OWN
  * scheme, never `java.io`. This is the reference's object-store
  * abstraction (duo/src/config.rs:69-132: one trait, local-FS vs S3
  * picked by URL) in its Hadoop form: a store rooted at
  * `s3a://bucket/duo` resolves to the S3A filesystem, a bare `/tmp/duo`
  * to the local one, with identical store code above. Data reads/writes
  * were already scheme-portable (Spark's parquet source runs on the
  * same FileSystem API); this makes the store's own bookkeeping match.
  */
private[graft] object StoreFs {

  /** Hadoop configuration: the active session's (it carries credentials
    * and `fs.*` wiring) when one exists, else library defaults — the
    * registries are constructed from bare path strings and must not
    * require a session for local metadata.
    */
  def conf: Configuration =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fs(path: Path): FileSystem = path.getFileSystem(conf)

  /** A directory's children ([] when absent) — one listing RPC on an
    * object store, where `java.io.File#listFiles` cannot leave the
    * local disk at all.
    */
  def list(fs: FileSystem, dir: Path): Seq[FileStatus] =
    if (fs.exists(dir)) fs.listStatus(dir).toSeq else Seq.empty

  /** Overwrite a small text file (registry JSON); parents are created
    * by the FileSystem `create` contract.
    */
  def writeString(path: String, text: String): Unit = {
    val p = new Path(path)
    val f = fs(p)
    val out = f.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readString(path: String): Option[String] = {
    val p = new Path(path)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }
}
