package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B timing harness for the optimization rounds: run the
  * named gates K times each inside ONE warmed JVM and print EVERY
  * repeat (Bench reports only cold/warm, which is too coarse to
  * discriminate sub-second effects under multi-second box noise —
  * medians over all repeats are the comparison unit). Not part of the
  * library surface; the bench record stays graft.Bench's.
  *
  * args: gate names; SPARK_GRAFT_TIME_REPEAT=N (default 5).
  */
object TimeGate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.get("SPARK_GRAFT_TIME_REPEAT")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).schema)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val names = args.toSeq
    // Deterministic structure counters: wall time on this box swings
    // ±30% with external load, but the NUMBER of jobs / stages / tasks
    // a gate schedules is a property of the code — the primary
    // before/after evidence for harness-shape optimizations.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet(): Unit
          tasks.addAndGet(s.stageInfo.numTasks.toLong): Unit
          // opt-in per-stage breakdown for attributing task counts
          if (sys.env.contains("SPARK_GRAFT_TIME_STAGES")) {
            val ms = (for {
              sub <- s.stageInfo.submissionTime
              done <- s.stageInfo.completionTime
            } yield done - sub).getOrElse(-1L)
            System.err.println(s"[stage] ${s.stageInfo.numTasks} tasks " +
              s"${ms}ms  " + s.stageInfo.name.takeWhile(_ != '\n').take(140))
          }
        }
      })
    // opt-in micro-batch duration breakdown: where a streaming gate's
    // wall time goes (queryPlanning / addBatch / walCommit / ...)
    if (sys.env.contains("SPARK_GRAFT_TIME_STREAMS"))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            val p = e.progress
            val d = p.durationMs
            System.err.println(s"[batch] ${p.name} b=${p.batchId} " +
              s"rows=${p.numInputRows} total=${d.get("triggerExecution")} " +
              s"plan=${d.get("queryPlanning")} add=${d.get("addBatch")} " +
              s"getB=${d.get("getBatch")} off=${d.get("latestOffset")} " +
              s"wal=${d.get("walCommit")} commit=${d.get("commitOffsets")}")
            Option(p.stateOperators).foreach(_.foreach(so =>
              System.err.println(s"[state] ${p.name} b=${p.batchId} " +
                s"op=${so.operatorName} commitMs=${so.allUpdatesTimeMs}+" +
                s"${so.commitTimeMs} rows=${so.numRowsTotal} " +
                s"mem=${so.memoryUsedBytes}")))
          }
        })
    // same warmup discipline as Bench: plans + codegen compile off-clock
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count(): Unit
      catch { case e: Throwable =>
        System.err.println(s"[timegate] warmup $n failed: ${e.getMessage}") }
    }
    util.StreamGate.quiesce(spark)
    val out = names.map { n =>
      var counts = (0L, 0L, 0L)
      val times = (1 to repeat).map { i =>
        val j0 = jobs.get(); val s0 = stages.get(); val k0 = tasks.get()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count(): Unit
        val t = (System.nanoTime() - t0) / 1e9
        operators.Dedup.releaseIntermediates()
        util.StreamGate.quiesce(spark)
        // count the LAST repeat (memoized gate stores settle by then)
        if (i == repeat)
          counts = (jobs.get() - j0, stages.get() - s0, tasks.get() - k0)
        t
      }
      val sorted = times.sorted
      val med = sorted(sorted.size / 2)
      f"""  "$n": {"median": $med%.3f, "jobs": ${counts._1}, """ +
        f""""stages": ${counts._2}, "tasks": ${counts._3}, "times": [${
          times.map(t => f"$t%.3f").mkString(",")}]}"""
    }
    println(out.mkString("{\n", ",\n", "\n}"))
    spark.stop()
  }
}
