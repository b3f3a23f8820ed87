package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for interactive probing during development. Not part of
  * the library surface.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, false)
    spark.stop()
  }
}
