package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for interactive probing during development. Not part of
  * the library surface. Prints formatted physical plans for a few
  * representative queries so pushdown/broadcast/codegen can be audited.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    // deliberately NOT setting nanosAsLong here: Tables.load must be
    // able to flip it at runtime for sessions the driver builds itself
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    println(s"[dev] events rows via Tables.load (runtime conf): " +
      s"${Tables.events(spark, d).count()}")
    val out = new java.io.PrintWriter("/tmp/plans.txt")
    for (name <- args) {
      out.println(s"===== $name =====")
      out.println(SparkEntry.queries(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    out.close()
    spark.stop()
  }
}
