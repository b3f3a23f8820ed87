package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one per suite via lazy val). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    // keep saveAsTable fixtures (bucketing specs) out of the repo dir
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("spark-warehouse").toString)
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("WARN") }
}
