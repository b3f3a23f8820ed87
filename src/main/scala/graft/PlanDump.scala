package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named gates to
  * plans/<tag>/<gate>_<suffix>.txt — the optimization rounds' committed
  * plan evidence (the judge checks plan claims against these files).
  * Runs under the bench session configuration at SPARK_GRAFT_SF_DIR.
  *
  * args: <tag> <suffix> <gate...>   e.g. `r21 before g06_dynamic_schema`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <gate...>")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO", "."), "plans", tag)
    java.nio.file.Files.createDirectories(dir): Unit
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        dir.resolve(s"${n}_$suffix.txt"), txt): Unit
      println(s"[plandump] wrote ${dir.resolve(s"${n}_$suffix.txt")}")
    }
    spark.stop()
  }
}
