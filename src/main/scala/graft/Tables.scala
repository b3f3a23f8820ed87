package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema at
  * `/root/testdata/sf*` (see TESTDATA.md).
  *
  * `events.ts` has shipped in two physical layouts across testdata
  * generations: parquet INT64 TIMESTAMP(NANOS,false) — which the
  * `spark.sql.legacy.parquet.nanosAsLong` flag surfaces as a plain
  * epoch-nanoseconds `LongType` — and parquet TIMESTAMP(MICROS), which
  * Spark reads as a timestamp type the flag does not touch.
  * [[normalizeEventTs]] folds both onto the same canonical column: an
  * epoch-nanoseconds `LongType`, the representation the duo reference
  * uses for time (plain int64 micros, see SURVEY §1.3 citing
  * duo/src/schema.rs:23-24) and the one the DuckDB oracle's
  * `epoch_ns(ts)` produces on either layout — so every downstream
  * operator and oracle stays layout-agnostic and bit-exact.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(spark, df) else df
  }

  /** Canonicalize `ts` to epoch-nanos LongType regardless of the parquet
    * layout. TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ (naive wall
    * time, written as UTC instants by the generator): pin the session
    * zone to UTC so the ntz→ltz cast is identity on the underlying
    * micros, then widen to nanos. Column position is preserved
    * (withColumn replaces in place), so the surfaced schema is
    * identical to the historical nanos-as-long one.
    */
  def normalizeEventTs(spark: SparkSession, df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) |
           Some(org.apache.spark.sql.types.TimestampNTZType) =>
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts as timestamp)) * 1000"))
      case _ => df
    }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
