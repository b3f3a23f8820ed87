package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The events loader's layout canonicalization: `ts` has shipped as
  * both INT64 TIMESTAMP(NANOS) (surfaced as epoch-nanos long via the
  * legacy flag) and TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ)
  * across testdata generations; both must load as the identical
  * epoch-nanos LongType column, or every epoch-arithmetic query breaks
  * on a regeneration (the round-10 driver run lost 11 gates this way).
  */
class TablesSpec extends SparkSpec {

  test("events.ts surfaces as epoch-nanos long for both parquet layouts") {
    import spark.implicits._
    val micros = Seq(
      (1L, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 7, 179575000), 10L),
      (2L, java.time.LocalDateTime.of(2024, 6, 15, 12, 30, 0, 500000), 20L))
      .toDF("event_id", "ts", "user_id")
    assert(micros.schema("ts").dataType.typeName.startsWith("timestamp"))
    val dir = java.nio.file.Files.createTempDirectory("ts-layout")
    micros.write.parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir.toString, "events")
    assert(loaded.schema("ts").dataType == LongType)
    val got = loaded.orderBy("event_id").select("ts")
      .collect().map(_.getLong(0)).toSeq
    // LocalDateTime values are naive UTC wall times; epoch-nanos exact
    assert(got == Seq(1704067207179575000L, 1718454600000500000L))
    // column position preserved (in-place replace, schema-compatible)
    assert(loaded.columns.toSeq == Seq("event_id", "ts", "user_id"))
  }

  test("a long ts column passes through normalizeEventTs untouched") {
    import spark.implicits._
    val asLong = Seq((1L, 1704067207179575000L), (2L, 42L))
      .toDF("event_id", "ts")
    val out = Tables.normalizeEventTs(spark, asLong)
    assert(out.schema("ts").dataType == LongType)
    assert(out.orderBy("event_id").select("ts").collect()
      .map(_.getLong(0)).toSeq == Seq(1704067207179575000L, 42L))
  }

  test("the real fixture loads with nanos granularity intact") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == LongType)
    val r = ev.agg(min(col("ts")), max(col("ts"))).head
    // 2024-epoch nanos are ~1.7e18; a micros-as-long slip would be 1e15
    assert(r.getLong(0) > 1_500_000_000_000_000_000L)
    assert(r.getLong(1) < 2_500_000_000_000_000_000L)
  }
}
