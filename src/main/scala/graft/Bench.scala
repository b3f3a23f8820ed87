package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR (driver runs sf0.1) and prints ONE JSON line.
  *
  * A warmup pass (tiny action + a footer read per table) runs first so
  * the first timed query doesn't absorb JVM/codegen/session startup —
  * per-query numbers reflect the plans, not the warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // warm the hash-aggregate / sort / exchange codegen paths so the
    // first timed query doesn't absorb plan-compile time
    spark.range(100000L)
      .selectExpr("id % 100 AS k", "cast(id as string) AS s")
      .groupBy("k").agg(org.apache.spark.sql.functions.count("*"),
        org.apache.spark.sql.functions.collect_list("s"))
      .orderBy("k").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).schema)

    // A failed query must not masquerade as a fast one (a swallowed
    // analysis error takes milliseconds): failures report negative time.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      val secs = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) secs else -secs)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
