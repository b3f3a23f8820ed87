package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-purpose probe: the cost of draining a wide-event-time-spread
  * staging tree at each target granularity (the w11 measurement —
  * SCALE.md "drain granularity"). Lands the orders/lineitem span feed
  * (event times spread over ~7 years) into a temp store via
  * writeStaged, then times `compact(granularity = …)` and counts the
  * resulting leaf dirs/files. Run:
  * `runMain graft.DrainProbe [sfDir] [granularity...]`.
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val grans = { val g = args.drop(1); if (g.isEmpty) Seq("minute", "hour", "day") else g.toSeq }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // two fixture shapes: the 7-year date-spread span feed (leaf count
    // pinned by distinct DATES — midnight-clustered starts) and a
    // minute-spread log feed (3-hour window, leaf count pinned by
    // distinct MINUTES — the shape hour granularity collapses 60×)
    val shape = sys.env.getOrElse("SPARK_GRAFT_DRAIN_SHAPE", "span")
    val timeColName = if (shape == "span") "start" else "time"
    val feed = (if (shape == "span")
      graft.queries.EngineQueries.ordersAsSpans(spark, sfDir)._1
    else graft.queries.EngineQueries.eventsAsLogs(spark, sfDir)
      .withColumn("time", lit(1705276800000000L) +
        pmod(col("time"), lit(3L * 3600L * 1000000L)))
      .withColumn("id", col("span_id"))).localCheckpoint(true)
    val spans = feed
    def walk(f: java.io.File): (Long, Long) = // (dirs, files)
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.map(walk)
          .foldLeft((1L, 0L)) { case ((d1, f1), (d2, f2)) => (d1 + d2, f1 + f2) }
      else (0L, if (f.getName.endsWith(".parquet")) 1L else 0L)
    for (g <- grans) {
      val root = java.nio.file.Files.createTempDirectory(s"drain_$g").toString
      val store = new graft.store.ParquetStore(spark, root, "span", timeColName)
      // three flushes, like the w11 cadence
      store.writeStaged(spans.filter(col("id") % 3 === 0))
      store.writeStaged(spans.filter(col("id") % 3 === 1))
      store.writeStaged(spans.filter(col("id") % 3 === 2))
      val t0 = System.nanoTime()
      store.compact(granularity = g)
      val sec = (System.nanoTime() - t0) / 1e9
      val (dirs, files) = walk(new java.io.File(s"$root/span"))
      val t1 = System.nanoTime()
      val n = store.read(None, None).get.count()
      val readSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"granularity":"$g","drain_sec":$sec%.1f,""" +
        f""""dirs":$dirs,"files":$files,"rows":$n,"read_sec":$readSec%.2f}""")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
    spark.stop()
  }
}
