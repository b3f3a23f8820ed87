package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-timing probe for the streaming-gate harness floor (r14 VERDICT
  * item 3): the 15 w-gates carry a per-gate cost beyond their operator
  * work — this main runs a TRIVIAL operator (projection, no state)
  * through the exact [[graft.util.StreamGate]] skeleton and times each
  * phase (feed landing, query start, per-batch drain, stop+reclaim),
  * repeated so the first-query warmup is visible separately. What the
  * phases say determines which lever (if any) can shrink the floor
  * without touching gate semantics.
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def batch(i: Int): DataFrame =
      (1 to 1000).map(j => (i.toLong * 1000 + j, s"m$j")).toDF("id", "msg")

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    // the runParquet skeleton, inlined with phase clocks.
    // sinkKind: "parquet" (exactly-once file sink + metadata log,
    // the w07/w09 shape) | "foreach" (no-op foreachBatch — isolates
    // the sink's share of the drain) ; feedFiles: part files per
    // landed batch (the micro-batch's task count)
    def probe(tag: String, sinkKind: String, feedFiles: Int): Unit = {
      val root = java.nio.file.Files.createTempDirectory(s"floor_$tag")
      val watch = root.resolve("in")
      java.nio.file.Files.createDirectories(watch): Unit
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(batch(0).schema)
        .parquet(watch.toString)
      val out = src.withColumn("up", upper(col("msg")))
      val sink = root.resolve("out").toString
      val writer = out.writeStream
        .option("checkpointLocation", root.resolve("chk").toString)
        .outputMode("append")
      val q = (if (sinkKind == "parquet")
          writer.format("parquet").option("path", sink)
        else writer.foreachBatch((df: DataFrame, _: Long) =>
          { df.count(): Unit })).start()
      val startMs = ms(t0)
      val batchMs = (0 until 3).map { i =>
        val tb = System.nanoTime()
        val staged = root.resolve(s"stage_$i")
        batch(i).coalesce(feedFiles).write.parquet(staged.toString)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(staged).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .zipWithIndex.foreach { case (p, j) =>
            java.nio.file.Files.move(p,
              watch.resolve(s"b${i}_$j.parquet")): Unit
          }
        val landMs = ms(tb)
        val tp = System.nanoTime()
        q.processAllAvailable()
        (landMs, ms(tp))
      }
      val ts = System.nanoTime()
      q.stop()
      val stopMs = ms(ts)
      println(f"""{"probe":"$tag","sink":"$sinkKind","files":$feedFiles,""" +
        f""""start_ms":$startMs%.0f,""" +
        batchMs.zipWithIndex.map { case ((l, p), i) =>
          f""""land${i}_ms":$l%.0f,"proc${i}_ms":$p%.0f""" }
          .mkString(",") +
        f""","stop_ms":$stopMs%.0f}""")
    }

    probe("first", "parquet", 32) // pays session streaming warmup
    probe("warm", "parquet", 32)
    probe("warm", "parquet", 32)
    probe("sink_noop", "foreach", 32) // drain minus file-sink commit
    probe("sink_noop", "foreach", 32)
    probe("feed4", "parquet", 4) // 4 tasks/batch instead of 32
    probe("feed4", "parquet", 4)
    spark.stop()
  }
}
