package graft

import org.apache.spark.sql.functions._

import graft.store.ParquetStore

/** A real Hadoop FileSystem under a NON-`file:` scheme: the S5
  * portability probe. Every path the store touches is a
  * `rawtest://…` URI — a string `java.io.File` cannot interpret (it
  * would treat `rawtest:/…` as a relative name and fail existence
  * checks) — so any store code path that bypasses the
  * [[graft.store.StoreFs]] FileSystem plumbing breaks this suite
  * immediately. RawLocalFileSystem is the same class the S3A/ABFS
  * connectors sit beside: resolving it from the URI scheme is exactly
  * the reference's object-store switch (duo/src/config.rs:69-132).
  */
class RawTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "rawtest"
  override def getUri: java.net.URI = java.net.URI.create("rawtest:///")
}

class FsStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.rawtest.impl", classOf[RawTestFileSystem].getName)
    "rawtest://" +
      java.nio.file.Files.createTempDirectory("fsstore").toString
  }

  private val t0 = 1760000000000000L // µs epoch

  test("store lifecycle end-to-end on a non-file FileSystem scheme: " +
      "land → read → drain → prefix read → recover") {
    val root = newRoot()
    val store = new ParquetStore(spark, root, "span", "start")
    def batch(ids: Seq[Long]) =
      ids.map(i => (i, t0 + i * 60L * 1000000L, i * 10L))
        .toDF("id", "start", "trace_id")
    // LSM land: staged flushes visible to both read APIs pre-drain
    store.writeStaged(batch(Seq(1L, 2L)))
    store.writeStaged(batch(Seq(3L)))
    assert(store.stagedFileCount > 0)
    assert(store.read(None, None).get.select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 3L))
    // drain through the policy; partitioned tree answers identically
    assert(store.maybeCompact(maxStagedFiles = 1))
    assert(store.stagedFileCount == 0)
    assert(store.read(None, None).get.select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 3L))
    // reference-shaped prefix read (directory listings through the FS)
    val viaPrefix = store.readPrefixes(t0, t0 + 4L * 60L * 1000000L)
      .get.select("id").as[Long].collect().toSet
    assert(viaPrefix == Set(1L, 2L, 3L))
    // coarse-granularity rewrite: prefix read takes the ancestor-file
    // fallback (per-ancestor listings through the FS, memoized)
    store.compact(granularity = "hour")
    assert(store.readPrefixes(t0, t0 + 4L * 60L * 1000000L)
      .get.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // time-pruned hive read drops partition cols as usual
    val pruned = store.read(Some(t0), Some(t0 + 120L * 1000000L)).get
    assert(pruned.columns.toSet == Set("id", "start", "trace_id"))
    assert(pruned.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("crash-interrupted swap recovers at every step on the FS scheme") {
    (1 to 3).foreach { step =>
      val root = newRoot()
      val store = new ParquetStore(spark, root, "span", "start")
      store.write(Seq((1L, t0, 100L), (2L, t0 + 1000L, 200L))
        .toDF("id", "start", "trace_id"))
      store.compact(crashAfterStep = step)
      // whatever the crash point, read()'s recover() finds a complete
      // table — the marker + roll-forward discipline through the FS API
      val rows = store.read(None, None).get.select("id").as[Long]
        .collect().toSeq.sorted
      assert(rows == Seq(1L, 2L), s"crash after step $step")
      // and a FRESH store over the same root recovers identically
      val again = new ParquetStore(spark, root, "span", "start")
      assert(again.read(None, None).get.count() == 2, s"fresh, step $step")
    }
  }

  test("w11 ingest loop lands and queries identically through the FS " +
      "scheme root") {
    // the store's hottest call site — streamed flushes through
    // writeStaged, the LSM policy probe, and the pruning read-back —
    // run against a rawtest:// root and must answer the w11 gate's
    // query byte-identically to the local-path root
    val d = "/root/testdata/sf0.001"
    val (raw, logs) = graft.queries.EngineQueries.ordersAsSpans(spark, d)
    val local = graft.queries.EngineQueries
      .ingestLoopRun(spark, raw, logs).collect().toSeq
    val viaFs = graft.queries.EngineQueries
      .ingestLoopRun(spark, raw, logs, storeRoot = Some(newRoot()))
      .collect().toSeq
    assert(local.nonEmpty)
    assert(viaFs == local)
  }

  test("engine root on the FS scheme: registries, WAL, flush, restart") {
    val root = newRoot()
    val e1 = new DuoEngine(spark, root, walFormat = "arrow")
    e1.processes.register("svc", Map.empty)
    val logs = Seq(("svc-0", t0 + 500L, "INFO", "hello", 7L))
      .toDF("process_id", "time", "level", "message", "flag")
    e1.appendLogBatch(logs)
    // crash before flush: WAL (arrow IPC through the FS stream) replays
    val e2 = new DuoEngine(spark, root, walFormat = "arrow")
    assert(e2.logTable().filter(col("flag") === 7L).count() == 1)
    assert(e2.services() == Seq("svc")) // process registry JSON via FS
    e2.flush() // parquet store + WAL clear through the FS
    val e3 = new DuoEngine(spark, root, walFormat = "arrow")
    assert(e3.logTable().count() == 1)
    // dynamic schema registry persisted and re-merged through the FS
    assert(e3.logTable().columns.contains("flag"))
  }
}
