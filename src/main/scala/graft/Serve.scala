package graft

import org.apache.spark.sql.SparkSession

/** Runnable server entry point — the drop-in shape of the reference's
  * `duo` binary minus the gRPC listener (duo/src/main.rs boots the
  * memory store, the web server, and the ingest loop): boots an engine
  * over a store root and serves the HTTP query façade
  * ([[graft.api.HttpApi]]) against it. Ingest arrives through the
  * library API (`DuoEngine.ingest*`) or the JSON-file backfill edge
  * (`ingestJsonLogDir`) — the reference's gRPC transport is the one
  * façade a drop-in replacement still needs and is out of reach
  * without protobuf/HTTP2 dependencies (SURVEY "missing" item 1).
  *
  * Usage: `runMain graft.Serve <storeRoot> [port]` — port defaults to
  * the reference's 3000 (duo/src/config.rs).
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: graft.Serve <storeRoot> [port]"))
    // a present-but-unparseable port must fail loudly, not silently
    // bind the default ('graft.Serve /data 8o80' listening on 3000
    // would be a misconfiguration nobody notices)
    val port = args.drop(1).headOption
      .map(s => s.toIntOption.getOrElse(
        sys.error(s"unparseable port argument: '$s'")))
      .getOrElse(3000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new DuoEngine(spark, root)
    // hardening knobs from the environment: CORS stays off unless a
    // deployment names an origin; a token gates the mutating route
    val api = new graft.api.HttpApi(engine, port,
      corsOrigin = sys.env.get("SPARK_GRAFT_CORS_ORIGIN"),
      ingestToken = sys.env.get("SPARK_GRAFT_INGEST_TOKEN"),
      // point at a built frontend (the reference's embedded duo-ui
      // output works unchanged) and the binary serves it like
      // mod.rs:26-55; unset = API-only, non-API paths 404
      uiDir = sys.env.get("SPARK_GRAFT_UI_DIR"))
    // the reference binary's timer loops (duo/src/grpc/server.rs:
    // 31-120): parquet flush every 60 s by default, plus the
    // maintenance cadence (small-file healing + vacuum) the reference
    // lacks; 0 disables either. Without these a crashed unattended
    // server would lose everything since the last explicit flush
    // (modulo WAL replay) and nothing would ever heal fragmentation.
    def cadence(envKey: String, default: Long): Long =
      sys.env.get(envKey).map(s => s.toLongOption.getOrElse(
        sys.error(s"unparseable $envKey: '$s'"))).getOrElse(default)
    val cadences = engine.startCadences(
      flushEveryMs = cadence("SPARK_GRAFT_FLUSH_MS", 60000L),
      maintainEveryMs = cadence("SPARK_GRAFT_MAINTAIN_MS", 300000L))
    api.start()
    println(s"duospark query API listening on http://127.0.0.1:${api.boundPort}")
    // serve until killed; flush the hot view on shutdown so nothing
    // buffered is lost (the reference's ctrl-c path flushes too).
    // Registered through Hadoop's ShutdownHookManager at a priority
    // ABOVE Spark's own hook (which stops the SparkContext): a plain
    // JVM shutdown hook runs concurrently with Spark's in unspecified
    // order, and a flush racing the context teardown would lose the
    // buffered rows this hook exists to save.
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable {
        override def run(): Unit = {
          api.stop()
          cadences.close()
          engine.flush()
        }
      }, 100)
    Thread.currentThread().join()
  }
}
