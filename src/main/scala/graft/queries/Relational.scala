package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.util.Cols._

/** Core relational operator inventory over the driver star schema.
  *
  * Each query is tagged with the SURVEY.md §2 operator IDs it covers;
  * together they exercise every scan/filter/join/agg/sort/limit/set-op
  * semantic the duo reference executes (plus the window/rollup/percentile
  * extensions called out in §2.4/§2.5), re-expressed as idiomatic Spark
  * DataFrame pipelines. Oracle SQL lives in [[Relational.oracle]] and is
  * kept structurally identical so DuckDB computes bit-equal results
  * (see [[graft.util.Cols]] for the decimal-sum convention).
  *
  * Scale notes (100 TB design): every aggregate here is a partial-agg
  * friendly hash aggregate; dimension joins broadcast the small side
  * explicitly; semi/anti joins are expressed as left_semi/left_anti so
  * Catalyst can pick broadcast-hash variants; all filters/projections sit
  * directly on the parquet scan so pushdown + column pruning apply.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** Q1-style pricing summary. SURVEY §2.4 A2 (grouped agg with aliases),
    * §2.2 F9 (time-range predicate), ref duo/src/web/logs.rs:64-98.
    */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val charge = dec4(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
    Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) <= lit("1999-12-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        asD(sum(charge)).as("sum_disc_price"),
        asD(sum(charge * (lit(1) + dec2(col("l_tax"))))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Facet histogram: group-count top-K with deterministic tiebreak.
    * SURVEY §2.4 A2 + §2.6 O2/O3, ref duo/src/web/logs.rs:84-89.
    */
  def facetTopK(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("value"))
      .limit(20)

  /** Distinct values. SURVEY §2.4 A1 / §2.6 O6 (span-name listing),
    * ref duo/src/query.rs:138-152.
    */
  def distinctValues(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(col("p_type")).distinct().orderBy(col("p_type"))

  /** Prefix LIKE filter (service-prefix analog). SURVEY §2.2 F1,
    * ref duo/src/web/services.rs:22.
    */
  def prefixLike(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_name").like("Customer#0000001%"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** IN-list filter. SURVEY §2.2 F3, ref duo/src/web/services.rs:70. */
  def inList(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(200)

  /** Conjunctive range predicates over a scan (TPC-H Q6 shape).
    * SURVEY §2.2 F4/F9/F10 + filter pushdown §4.
    */
  def rangeRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        to_date(col("l_shipdate")).between(lit("1996-01-01"), lit("1996-12-31")) &&
        col("l_discount").between(0.03, 0.06) && col("l_quantity") < 24)
      .agg(asD(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))).as("revenue"))

  /** User-supplied SQL filter expression parsed against the schema —
    * the one place user text enters the planner. SURVEY §2.2 F6,
    * ref duo/src/web/logs.rs:45-57. Falls back to an ILIKE-contains
    * filter when the expression does not parse (F5).
    */
  def exprFilter(s: SparkSession, d: String): DataFrame = {
    val userExpr = "event_type = 'click' AND value > 100.0"
    val ev = Tables.events(s, d)
    val pred = scala.util.Try(expr(userExpr))
      .getOrElse(col("event_type").ilike("%click%"))
    ev.filter(pred)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
      .limit(500)
  }

  /** ILIKE contains fallback path itself. SURVEY §2.2 F5,
    * ref duo/src/web/logs.rs:54.
    */
  def ilikeContains(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").ilike("%SPARK%"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"))

  /** Left-outer join + IS NULL filter (root-span-predicate analog over a
    * join). SURVEY §2.2 F8 + §2.3. Customers with no high-value order.
    */
  def outerNull(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d)
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey")).distinct()
    Tables.customer(s, d)
      .join(big, col("c_custkey") === big("o_custkey"), "left_outer")
      .filter(big("o_custkey").isNull)
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Manual semi-join made native: lineitems of expensive orders.
    * SURVEY §2.3 J1 (trace-scoped fetch), ref duo/src/web/services.rs:68-76.
    * left_semi keeps the probe side unexpanded; the build side is small
    * and broadcastable.
    */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val expensive = Tables.orders(s, d)
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey").as("l_orderkey"))
    Tables.lineitem(s, d)
      .join(broadcast(expensive), Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("tot"))
      .orderBy(col("l_orderkey"))
  }

  /** Anti join: parts that never shipped in bulk. SURVEY §2.3 (J1
    * complement); left_anti with a broadcastable build side.
    */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val bulk = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 48)
      .select(col("l_partkey"))
    Tables.part(s, d)
      .join(bulk, col("p_partkey") === bulk("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  /** Trace-assembly analog: per-user event rollup with error flag and a
    * deterministic member digest. SURVEY §2.3 J2/J3 + §2.4 A3,
    * ref duo/src/models.rs:80-94, duo/src/web/services.rs:33-66.
    */
  def groupAssembly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_errors"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("has_error"),
        min(nsToUs("ts")).as("first_us"),
        max(nsToUs("ts")).as("last_us"),
        concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"))
      .orderBy(col("user_id"))

  /** Multi-way dimension join with broadcast small sides: revenue per
    * region/nation. SURVEY §2.3 + §4 (broadcast is the 100 TB-safe plan:
    * nation/region/customer are tiny vs the lineitem fact).
    */
  def regionRevenue(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(asD(sum(dec4(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Customer order-count distribution (TPC-H Q13 shape): left outer join
    * + two-level aggregation. SURVEY §2.3/§2.4.
    */
  def custDist(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    counts.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Union of two filtered subsets. SURVEY §2.6 O5 (memory ∪ parquet
    * union), ref duo/src/query.rs:110 — expressed with unionByName as the
    * schema-drift-safe form.
    */
  def unionSubsets(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val hi = ev.filter(col("value") >= 150.0)
      .select(col("event_id"), lit("hi").as("bucket"))
    val lo = ev.filter(col("value") < 50.0)
      .select(col("event_id"), lit("lo").as("bucket"))
    hi.unionByName(lo)
      .orderBy(col("event_id"), col("bucket"))
      .limit(500)
  }

  /** Sort desc + offset/limit pagination. SURVEY §2.6 O1/O3,
    * ref duo/src/query.rs:91-97,127-134 (conventional
    * filter→sort→offset→limit order; the reference's sort-after-limit
    * quirk is deliberately not reproduced, see SURVEY §2.4).
    */
  def sortPage(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("ts_us", nsToUs("ts"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .select(col("event_id"), col("ts_us"), col("event_type"), col("value"))
      .offset(100)
      .limit(50)

  /** Ranking window: top-3 orders per customer. SURVEY §2.5 extension. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running-sum window per user ordered by event time. SURVEY §2.5. */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("running", asD(sum(dec2(col("value"))).over(w)))
      .select(col("user_id"), col("event_id"), col("running"))
      .orderBy(col("user_id"), col("event_id"))
      .limit(1000)
  }

  /** Time-based RANGE window frame — the trailing-window aggregation
    * ROWS frames can't express (q18's running sum counts ROWS; this
    * bounds by event-TIME distance, so sparse and dense users get the
    * same 7-day horizon). The frame rides on the canonical epoch-ns
    * long, identical in both engines because normalized ts is a
    * multiple of 1000 ns (see Tables.normalizeEventTs) — a boundary
    * row lands on the same side everywhere. Decimal-sum discipline as
    * q18. SURVEY §2.5 extension.
    */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val weekNs = 7L * 86400L * 1000000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-weekNs, 0)
    Tables.events(s, d)
      .withColumn("trailing_7d", asD(sum(dec2(col("value"))).over(w)))
      .select(col("user_id"), col("event_id"), col("trailing_7d"))
      .orderBy(col("user_id"), col("event_id"))
      .limit(1000)
  }

  /** Exact grouped count-distinct. SURVEY §2.4 extension. */
  def countDistinct_(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("uniq_custs"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** Approximate distinct (HLL). No oracle — algorithm-specific result;
    * the driver records a rows-only check. SURVEY §2.4 note.
    */
  /** HLL approx-count-distinct, gated against the EXACT oracle with a
    * bounded-relative-error check: the output carries the exact count
    * (hash-comparable) plus a boolean asserting the HLL estimate landed
    * within 15% of it (default rsd is 5%, so 15% is a 3-sigma bound —
    * a broken sketch fails the gate, a healthy one always passes).
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey")).as("approx"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx") - col("exact_orders")).cast("double") /
          col("exact_orders") <= 0.15).as("approx_ok"))
      .orderBy(col("l_returnflag"))

  /** CASE WHEN severity mapping (level enum analog). SURVEY §2.7 C5. */
  def caseWhen(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("sev",
        when(col("o_orderpriority") === "1-URGENT", 1)
          .when(col("o_orderpriority") === "2-HIGH", 2)
          .otherwise(3))
      .groupBy(col("sev"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("sev"))

  /** JSON field extraction from the props column (tags JSON analog).
    * SURVEY §2.7 C4, ref duo/src/arrow.rs:33.
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("k_sum"), count(col("k")).as("k_n"))
      .orderBy(col("event_type"))

  /** Event-time day bucketing (storage-partition cadence analog).
    * SURVEY §2.7 C3 + §2.10; ts is epoch-ns long (see [[graft.Tables]]),
    * bucketed with pure integer arithmetic shared with the oracle.
    */
  def timeBucket(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day", to_date(timestamp_micros(nsToUs("ts"))))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
      .orderBy(col("day"))

  /** Rollup over two group keys. SURVEY §2.4 extension (grouping sets). */
  /** GROUPING SETS with a NON-hierarchical set list — the aggregation
    * grammar rollup (q25) and cube (q29) can't express: {(flag,
    * status), (flag), (ship_month)} shares one scan + one partial-agg
    * pass across unrelated groupings instead of three scans unioned.
    * SURVEY §2.4 extension, completing the grouping family.
    */
  def groupingSets_(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("ship_month"))),
        col("l_returnflag"), col("l_linestatus"), col("ship_month"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy(asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"), asc_nulls_first("ship_month"))

  def rollup_(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Exact interpolated median over integer cents — integer interpolation
    * is bit-deterministic in both engines. SURVEY §2.4 extension
    * (percentiles called out as the Spark built-in to reach for).
    */
  def medianCents(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("cents", round(col("o_totalprice") * 100).cast(LongType))
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(cents, 0.5)").as("median_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Session counting via lag window + gap threshold (30 min, in ns) —
    * streaming-sessionization analog computed in batch. SURVEY §2.8 note
    * (the reference has no event-time windows; this is the extended
    * scope's version).
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .withColumn("ts_us", nsToUs("ts"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("brk",
        when(col("ts_us") - col("prev_ts") > 1800000000L, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg((sum(col("brk")) + 1).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Human timing formatting (C1) applied to synthetic µs durations —
    * the reference's busy/idle tag formatting (duo/src/models.rs:186-195)
    * exercised over all three unit branches (us/ms/s). The UDF rounds
    * half-to-even exactly like printf, so DuckDB reproduces it.
    */
  def timingFormat(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("us_small", round(col("l_discount") * 1000).cast(LongType))
      .withColumn("us_big", round(col("l_extendedprice") * 10).cast(LongType))
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.functions.Timing.format_timing(col("us_small")).as("fmt_small"),
        graft.functions.Timing.format_timing(col("us_big")).as("fmt_big"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(2000)

  /** Sliding event-time windows (1 h window, 30 min slide) via Spark's
    * native window() — the §2.8 extension the reference lacks (it only
    * has wall-clock flush cadence). Window starts surface as epoch secs.
    */
  def slidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("tsx", timestamp_micros(nsToUs("ts")))
      .groupBy(window(col("tsx"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
      .select(col("window.start").cast(LongType).as("w_start"),
        col("n"), col("value_sum"))
      .orderBy(col("w_start"))

  /** Session event-time windows via Spark's native session_window()
    * (dynamic-gap session assignment inside the aggregation operator —
    * the batch/streaming-unified form of q27's lag+gap sessionize).
    * Session end = last event + gap. Spark merges windows that merely
    * TOUCH — an event at exactly last+gap still extends the session —
    * so a new session starts only when the inter-event gap is strictly
    * > 30 min. Bounds surface as floor'd epoch seconds.
    *
    * Scale shape: one shuffle on user_id; session merging happens
    * inside the sort-based session aggregation, so state is bounded by
    * one user's events per task — no per-session shuffle.
    */
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("tsx", timestamp_micros(nsToUs("ts")))
      .groupBy(col("user_id"), session_window(col("tsx"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("value_sum"))
      .select(col("user_id"),
        col("sw.start").cast(LongType).as("s_start"),
        col("sw.end").cast(LongType).as("s_end"),
        col("n_events"), col("value_sum"))
      .orderBy(col("user_id"), col("s_start"))

  /** w05 gate harness: the tumbling event-time window aggregation run
    * as a REAL Structured Streaming query — parquet file source,
    * 30-minute watermark, append-mode window state, memory-sink landing
    * for the bounded window set (StreamGate.runParquetMem: the FEED
    * is distributed parquet files, never a driver broadcast) — over the
    * events fixture, hash-checked against DuckDB's batch replay. Windowed aggregation is arrival-order-independent
    * (same groups, associative decimal sums), so unlike w03/w04 no
    * layout trick is needed: the feed is one batch of all events plus
    * a far-future advance marker whose watermark flushes every real
    * window out of state (the marker's own window stays pending and is
    * deliberately never emitted). Makes the streaming WINDOW face
    * oracle-hard, complementing w01/w02's batch forms and
    * StreamingWindowSpec's late-event semantics.
    */
  /** w05/w06's watermark-advance marker (max event time + 1 year),
    * memoized per corpus dir — one deterministic scalar whose agg job
    * otherwise re-ran per bench repeat (the feed-memo discipline).
    */
  private val markerMemo =
    new scala.collection.concurrent.TrieMap[String, Long]
  private def advanceMarker(s: SparkSession, d: String): Long =
    markerMemo.getOrElseUpdate(d,
      Tables.events(s, d).agg(max(nsToUs("ts"))).head().getLong(0) +
        365L * 24 * 3600 * 1000000L)

  def tumblingStreamGate(s: SparkSession, d: String): DataFrame = {
    // distributed feed (round 11): the events never pass through the
    // driver — only the max timestamp does (one scalar, the
    // broadcast-build pattern) to place the watermark-advance marker
    val ev = Tables.events(s, d).select(nsToUs("ts").as("tus"), col("value"))
    val marker = advanceMarker(s, d)
    graft.util.StreamGate.runParquetMem(s, "w05_tumbling_stream",
      Seq(ev, s.range(1).select(lit(marker).as("tus"), lit(0.0).as("value"))),
      "append",
      build = _.withColumn("tsx", timestamp_micros(col("tus")))
        .withWatermark("tsx", "30 minutes")
        .groupBy(window(col("tsx"), "1 hour"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
        .select(col("window.start").cast(LongType).as("w_start"),
          col("n"), col("value_sum")),
      statePartitions = Some(8),
      feedKey = Some(s"w05|$d"))
      .orderBy(col("w_start"))
  }

  /** w06 gate harness: [[sessionWindow]]'s dynamic-gap session
    * aggregation run as a REAL Structured Streaming query — the
    * MERGING window state (sessions extend and coalesce as events
    * arrive, unlike w05's fixed tumbling buckets), under the same
    * file-source → watermark → append-mode → memory-sink skeleton.
    * Session aggregation is arrival-order-independent per user (same
    * merge-on-touch semantics, associative decimal sums), so the feed
    * is one batch of all events plus a far-future marker under a
    * sentinel user: its watermark closes every real session (all ends
    * < watermark), while the marker's own session stays pending and is
    * never emitted — the streamed result must equal the batch
    * [[sessionWindow]] exactly, and the oracle is w02's batch replay
    * verbatim.
    */
  def sessionStreamGate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), nsToUs("ts").as("tus"), col("value"))
    val marker = advanceMarker(s, d)
    graft.util.StreamGate.runParquetMem(s, "w06_session_stream",
      Seq(ev, s.range(1).select(lit(-1L).as("user_id"),
        lit(marker).as("tus"), lit(0.0).as("value"))),
      "append",
      build = _.withColumn("tsx", timestamp_micros(col("tus")))
        .withWatermark("tsx", "30 minutes")
        .groupBy(col("user_id"), session_window(col("tsx"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("value_sum"))
        .select(col("user_id"),
          col("sw.start").cast(LongType).as("s_start"),
          col("sw.end").cast(LongType).as("s_end"),
          col("n_events"), col("value_sum")),
      statePartitions = Some(8),
      feedKey = Some(s"w06|$d"))
      .orderBy(col("user_id"), col("s_start"))
  }

  /** Pivot: returnflag columns per linestatus (conditional-aggregation
    * equivalent in the oracle). SURVEY §2.4 extension.
    */
  def pivotFlags(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(asD(sum(dec2(col("l_quantity")))))
      .orderBy(col("l_linestatus"))

  /** Cube over two keys. SURVEY §2.4 extension (grouping sets family). */
  def cube_(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Two-phase salted aggregation — the skew-mitigation pattern for hot
    * grouping keys at scale: partial aggregation over (key, salt)
    * spreads one hot key across `salts` reducers, then a cheap final
    * combine over the tiny partial table. Results are identical to the
    * direct groupBy (the oracle IS the direct groupBy).
    */
  def saltedAgg(s: SparkSession, d: String, salts: Int = 8): DataFrame =
    Tables.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(dec2(col("value"))).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), asD(sum(col("psum"))).as("value_sum"))
      .orderBy(col("event_type"))

  /** Two-sided salted JOIN — the skew-mitigation pattern for a hot
    * join key (q30 is the aggregation flavor): the fact side gets a
    * deterministic salt from a row-local column, the dimension side is
    * replicated once per salt value, and the join keys on
    * (key, salt) — one hot order's lineitems spread across `salts`
    * reducers instead of hammering one. Results are identical to the
    * direct join; the oracle IS the direct join.
    *
    * The honesty note: replication multiplies the dimension side's
    * shuffle volume by `salts`, so this is a targeted tool for keys
    * AQE's skew-join split can't fix (e.g. a single key holding >50%
    * of a stage), not a default join strategy.
    */
  def saltedJoin(s: SparkSession, d: String, salts: Int = 8): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), dec2(col("l_extendedprice")).as("price"),
        pmod(col("l_linenumber"), lit(salts)).as("salt"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        explode(array((0 until salts).map(lit(_)): _*)).as("salt"))
    li.join(ord,
        li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), asD(sum(col("price"))).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Top-3 terms per document by integer-exact TF×N/DF score (explode →
    * term/document frequencies → broadcast corpus size → rank window).
    * Integer arithmetic end-to-end so the oracle matches bit-for-bit
    * (a float idf would diverge across libm implementations).
    */
  def topTerms(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val ex = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val tf = ex.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("corpus_n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    tf.join(df_, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score", expr("tf * 1000000 * corpus_n div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        col("score"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Correlated scalar subquery through the spark.sql surface —
    * Catalyst decorrelates it into an aggregate + join; the engine also
    * exposes plain SQL over registered views this way.
    */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_name,
        | (SELECT MAX(o_totalprice) FROM orders_v o
        |   WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM customer_v c
        |ORDER BY c_custkey LIMIT 500""".stripMargin)
  }

  /** Set operations (absent from the reference, SURVEY §2.6 note):
    * customers appearing in both halves of a date-split order stream /
    * only in the early half.
    */
  private def custHalves(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(s, d)
    val early = o.filter(to_date(col("o_orderdate")) < lit("1998-01-01"))
      .select(col("o_custkey"))
    val late = o.filter(to_date(col("o_orderdate")) >= lit("1998-01-01"))
      .select(col("o_custkey"))
    (early, late)
  }

  def intersectCusts(s: SparkSession, d: String): DataFrame = {
    val (early, late) = custHalves(s, d)
    early.intersect(late).orderBy(col("o_custkey"))
  }

  def exceptCusts(s: SparkSession, d: String): DataFrame = {
    val (early, late) = custHalves(s, d)
    early.except(late).orderBy(col("o_custkey"))
  }

  val queries: Map[String, Q] = Map(
    "q24_timing_format" -> (timingFormat _),
    "q31_scalar_subquery" -> (scalarSubquery _),
    "q32_intersect" -> (intersectCusts _),
    "q33_except" -> (exceptCusts _),
    "q30_salted_agg" -> ((s, d) => saltedAgg(s, d)),
    "q36_salted_join" -> ((s, d) => saltedJoin(s, d)),
    "t05_top_terms" -> (topTerms _),
    "q28_pivot" -> (pivotFlags _),
    "q29_cube" -> (cube_ _),
    "w01_sliding_window" -> (slidingWindow _),
    "w02_session_window" -> (sessionWindow _),
    "w05_tumbling_stream" -> (tumblingStreamGate _),
    "w06_session_stream" -> (sessionStreamGate _),
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_facet_topk" -> (facetTopK _),
    "q03_distinct" -> (distinctValues _),
    "q04_prefix_like" -> (prefixLike _),
    "q05_in_list" -> (inList _),
    "q06_range_revenue" -> (rangeRevenue _),
    "q07_expr_filter" -> (exprFilter _),
    "q08_ilike_contains" -> (ilikeContains _),
    "q09_outer_null" -> (outerNull _),
    "q10_semi_join" -> (semiJoin _),
    "q11_anti_join" -> (antiJoin _),
    "q12_group_assembly" -> (groupAssembly _),
    "q13_region_revenue" -> (regionRevenue _),
    "q14_custdist" -> (custDist _),
    "q15_union" -> (unionSubsets _),
    "q16_sort_page" -> (sortPage _),
    "q17_window_rank" -> (windowRank _),
    "q18_window_running" -> (windowRunning _),
    "q38_range_frame" -> (windowRangeFrame _),
    "q19_count_distinct" -> (countDistinct_ _),
    "q20_approx_distinct" -> (approxDistinct _),
    "q21_case_when" -> (caseWhen _),
    "q22_json_extract" -> (jsonExtract _),
    "q23_time_bucket" -> (timeBucket _),
    "q25_rollup" -> (rollup_ _),
    "q37_grouping_sets" -> (groupingSets_ _),
    "q26_median_cents" -> (medianCents _),
    "q27_sessionize" -> (sessionize _),
    "q34_asof_join" -> (asofJoin _),
    "q35_range_join" -> (rangeJoin _)
  )

  /** As-of join composed from built-ins (the brief's named example of
    * an operator Spark lacks): for each event, the most recent order of
    * the same customer at or before the event time. Scale-honest
    * formulation: tag both sides, union, ONE window sort-shuffle keyed
    * on the join key with last(ignoreNulls) carrying the right-side
    * payload forward — no range-explosion join, no per-row lookup, and
    * the window never materializes more than a partition's run. At tied
    * times the order row sorts before the event row (ASOF `>=`
    * semantics); the right side is pre-deduped to one row per
    * (key, time) so tie resolution is engine-independent. The DuckDB
    * oracle uses its NATIVE ASOF LEFT JOIN, proving the composition
    * matches the real operator's semantics.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id").as("k"), nsToUs("ts").as("t"),
        lit(1).as("side"), lit(null).cast(LongType).as("ok"), col("event_id"))
    val ords = Tables.orders(s, d)
      .select(col("o_custkey").as("k"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"), col("o_orderkey"))
      .groupBy(col("k"), col("t"))
      .agg(max(col("o_orderkey")).as("ok"))
      .select(col("k"), col("t"), lit(0).as("side"), col("ok"),
        lit(null).cast(LongType).as("event_id"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ords)
      .withColumn("last_order", last(col("ok"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("t_us"),
        col("last_order"))
      .orderBy(col("event_id"))
  }

  /** Range (band) join: facts matched into value intervals via a
    * non-equi join against a tiny derived band dimension. The dim is
    * broadcast, so the plan is a broadcast nested-loop with NO shuffle
    * of the fact side — the standard shape for small-dim range joins
    * (a large range dim would bucket-align both sides instead).
    */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val bands = Tables.region(s, d).select(
      col("r_regionkey").as("band_id"),
      (col("r_regionkey") * 100.0).as("lo"),
      ((col("r_regionkey") + 1) * 100.0).as("hi"))
    Tables.events(s, d)
      .join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"), "left_outer")
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
      .orderBy(asc_nulls_first("band_id"))
  }

  // DuckDB oracle SQL — structurally identical pipelines. Decimal-sum
  // convention mirrors graft.util.Cols (see scaladoc there).
  private val D2 = "DECIMAL(18,2)"
  private val D4 = "DECIMAL(18,4)"

  /** printf-style 2-dp formatting fragment: DuckDB's printf rounds the
    * exact binary double half-to-even, matching Timing.formatTimingValue.
    * Shared with EngineQueries' w07 oracle (busy-tag formatting).
    */
  private[queries] def fmtSql(us: String): String =
    s"""CASE WHEN $us < 1000 THEN CAST($us AS VARCHAR)||'us'
       |     WHEN $us < 1000000 THEN printf('%.2f', $us/1000.0)||'ms'
       |     ELSE printf('%.2f', $us/1000000.0)||'s' END""".stripMargin

  /** Batch session replay (lag/gap islands) — shared by w02 (batch
    * session windows) and w06 (the streamed form, which must land the
    * identical session set).
    */
  private lazy val sessionOracleSql: String =
    s"""WITH x AS (SELECT user_id, epoch_us(ts) AS tus, event_id, value FROM events),
       |m AS (SELECT user_id, tus, event_id, value,
       |  CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
       |            > 1800000000 THEN 1 ELSE 0 END AS brk
       | FROM x),
       |g AS (SELECT user_id, tus, value,
       |  SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
       |                 ROWS UNBOUNDED PRECEDING) AS grp
       | FROM m)
       |SELECT user_id, min(tus)//1000000 AS s_start,
       | (max(tus) + 1800000000)//1000000 AS s_end,
       | COUNT(*) AS n_events,
       | CAST(SUM(CAST(value AS $D2)) AS DOUBLE) AS value_sum
       |FROM g GROUP BY user_id, grp ORDER BY user_id, s_start""".stripMargin

  val oracle: Map[String, String] = Map(
    "q32_intersect" ->
      """SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,
    "q33_except" ->
      """SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,
    "q31_scalar_subquery" ->
      """SELECT c_custkey, c_name,
        | (SELECT MAX(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM customer c
        |ORDER BY c_custkey LIMIT 500""".stripMargin,
    "q30_salted_agg" ->
      s"""SELECT event_type, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS $D2)) AS DOUBLE) AS value_sum
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q36_salted_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         | CAST(SUM(CAST(l_extendedprice AS $D2)) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "t05_top_terms" ->
      """WITH ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM ex GROUP BY doc_id, tok),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT COUNT(*) AS corpus_n FROM documents),
        |scored AS (SELECT doc_id, tf.tok AS tok, tf, df,
        |   (tf * 1000000 * corpus_n) // df AS score
        |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n),
        |ranked AS (SELECT *, ROW_NUMBER() OVER
        |   (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank FROM scored)
        |SELECT doc_id, tok, tf, df, score, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q24_timing_format" ->
      s"""WITH x AS (SELECT l_orderkey, l_linenumber,
         |  CAST(round(l_discount*1000) AS BIGINT) AS us_small,
         |  CAST(round(l_extendedprice*10) AS BIGINT) AS us_big
         | FROM lineitem)
         |SELECT l_orderkey, l_linenumber,
         | ${fmtSql("us_small")} AS fmt_small,
         | ${fmtSql("us_big")} AS fmt_big
         |FROM x ORDER BY l_orderkey, l_linenumber LIMIT 2000""".stripMargin,
    "q28_pivot" ->
      s"""SELECT l_linestatus,
         | CAST(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS $D2) END) AS DOUBLE) AS "A",
         | CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS $D2) END) AS DOUBLE) AS "N",
         | CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS $D2) END) AS DOUBLE) AS "R"
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q29_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    // batch replay of the streamed tumbling windows: every real window
    // flushes (the advance marker's never does, and is excluded here
    // by construction since it aggregates only the marker row — which
    // the stream never emits)
    "w05_tumbling_stream" ->
      s"""WITH x AS (SELECT epoch_us(ts)//1000000 AS tsec, value FROM events)
         |SELECT (tsec//3600)*3600 AS w_start, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS $D2)) AS DOUBLE) AS value_sum
         |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "w01_sliding_window" ->
      s"""WITH x AS (SELECT epoch_us(ts)//1000000 AS tsec, value FROM events),
         |e AS (SELECT (tsec//1800 - o)*1800 AS w_start, value
         |  FROM x CROSS JOIN (SELECT unnest([0, 1]) AS o))
         |SELECT w_start, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS $D2)) AS DOUBLE) AS value_sum
         |FROM e GROUP BY w_start ORDER BY w_start""".stripMargin,
    // Session semantics: Spark merges session windows that merely
    // TOUCH — an event at exactly last+gap extends the session — so a
    // session breaks only when the inter-event gap is strictly > the
    // gap duration; end = last event + gap. Floor'd epoch seconds
    // match the timestamp->long cast.
    "w02_session_window" -> sessionOracleSql,
    // the streamed form must land EXACTLY the batch sessions (every
    // real session closes under the marker's watermark) — same replay
    "w06_session_stream" -> sessionOracleSql,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(CAST(l_quantity AS $D2)) AS DOUBLE) AS sum_qty,
         | CAST(SUM(CAST(l_extendedprice AS $D2)) AS DOUBLE) AS sum_base_price,
         | CAST(SUM(CAST(CAST(l_extendedprice AS $D2) * (1 - CAST(l_discount AS $D2)) AS $D4)) AS DOUBLE) AS sum_disc_price,
         | CAST(SUM(CAST(CAST(l_extendedprice AS $D2) * (1 - CAST(l_discount AS $D2)) AS $D4) * (1 + CAST(l_tax AS $D2))) AS DOUBLE) AS sum_charge,
         | CAST(SUM(CAST(l_quantity AS $D2)) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
         | CAST(SUM(CAST(l_extendedprice AS $D2)) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
         | COUNT(*) AS count_order
         |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1999-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_facet_topk" ->
      """SELECT event_type AS value, COUNT(*) AS cnt FROM events
        |GROUP BY event_type ORDER BY cnt DESC, value LIMIT 20""".stripMargin,
    "q03_distinct" ->
      "SELECT DISTINCT p_type FROM part ORDER BY p_type",
    "q04_prefix_like" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_name LIKE 'Customer#0000001%' ORDER BY c_custkey""".stripMargin,
    "q05_in_list" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |ORDER BY o_orderkey LIMIT 200""".stripMargin,
    "q06_range_revenue" ->
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS $D2) * CAST(l_discount AS $D2)) AS DOUBLE) AS revenue
         |FROM lineitem
         |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
         |  AND l_discount BETWEEN 0.03 AND 0.06 AND l_quantity < 24""".stripMargin,
    "q07_expr_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'click' AND value > 100.0
        |ORDER BY event_id LIMIT 500""".stripMargin,
    "q08_ilike_contains" ->
      """SELECT lang, COUNT(*) AS n FROM documents
        |WHERE text ILIKE '%SPARK%' GROUP BY lang ORDER BY lang""".stripMargin,
    "q09_outer_null" ->
      """SELECT c_custkey, c_name FROM customer
        |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 450000.0) b
        |  ON c_custkey = b.o_custkey
        |WHERE b.o_custkey IS NULL ORDER BY c_custkey""".stripMargin,
    "q10_semi_join" ->
      s"""SELECT l_orderkey, COUNT(*) AS n_lines,
         | CAST(SUM(CAST(l_extendedprice AS $D2)) AS DOUBLE) AS tot
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
         |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q11_anti_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 48)
        |ORDER BY p_partkey""".stripMargin,
    "q12_group_assembly" ->
      """SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        | MAX(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS has_error,
        | MIN(epoch_ns(ts)//1000) AS first_us,
        | MAX(epoch_ns(ts)//1000) AS last_us,
        | string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q13_region_revenue" ->
      s"""SELECT r_name, n_name,
         | CAST(SUM(CAST(CAST(l_extendedprice AS $D2) * (1 - CAST(l_discount AS $D2)) AS $D4)) AS DOUBLE) AS revenue,
         | COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q14_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority='1-URGENT') o
        |    ON c_custkey = o.o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_union" ->
      """SELECT * FROM (
        |  SELECT event_id, 'hi' AS bucket FROM events WHERE value >= 150.0
        |  UNION ALL
        |  SELECT event_id, 'lo' AS bucket FROM events WHERE value < 50.0) t
        |ORDER BY event_id, bucket LIMIT 500""".stripMargin,
    "q16_sort_page" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type, value FROM events
        |ORDER BY ts_us DESC, event_id DESC LIMIT 50 OFFSET 100""".stripMargin,
    "q17_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q18_window_running" ->
      s"""SELECT user_id, event_id,
         | CAST(SUM(CAST(value AS $D2)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
         |FROM events ORDER BY user_id, event_id LIMIT 1000""".stripMargin,
    "q38_range_frame" ->
      s"""SELECT user_id, event_id,
         | CAST(SUM(CAST(value AS $D2)) OVER (PARTITION BY user_id
         |   ORDER BY epoch_ns(ts)
         |   RANGE BETWEEN 604800000000000 PRECEDING AND CURRENT ROW)
         |  AS DOUBLE) AS trailing_7d
         |FROM events ORDER BY user_id, event_id LIMIT 1000""".stripMargin,
    "q19_count_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS uniq_custs, COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q20_approx_distinct" ->
      """SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q21_case_when" ->
      """SELECT CASE WHEN o_orderpriority='1-URGENT' THEN 1
        |            WHEN o_orderpriority='2-HIGH' THEN 2 ELSE 3 END AS sev,
        | COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY sev""".stripMargin,
    "q22_json_extract" ->
      """SELECT event_type,
        | CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
        | COUNT(CAST(props->>'$.k' AS BIGINT)) AS k_n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q34_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
        |ords AS (SELECT o_custkey AS k, epoch_us(o_orderdate) AS t,
        |   CAST(MAX(o_orderkey) AS BIGINT) AS ok
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.t AS t_us, o.ok AS last_order
        |FROM ev e ASOF LEFT JOIN ords o ON e.user_id = o.k AND e.t >= o.t
        |ORDER BY e.event_id""".stripMargin,
    "q35_range_join" ->
      s"""WITH bands AS (SELECT r_regionkey AS band_id,
         |   r_regionkey * 100.0 AS lo, (r_regionkey + 1) * 100.0 AS hi
         |  FROM region)
         |SELECT b.band_id, COUNT(*) AS n,
         | CAST(SUM(CAST(e.value AS $D2)) AS DOUBLE) AS value_sum
         |FROM events e LEFT JOIN bands b
         |  ON e.value >= b.lo AND e.value < b.hi
         |GROUP BY b.band_id ORDER BY b.band_id NULLS FIRST""".stripMargin,
    "q23_time_bucket" ->
      s"""SELECT CAST(make_timestamp(epoch_ns(ts)//1000) AS DATE) AS day,
         | COUNT(*) AS n,
         | CAST(SUM(CAST(value AS $D2)) AS DOUBLE) AS value_sum
         |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "q37_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         | strftime(l_shipdate, '%Y-%m') AS ship_month, COUNT(*) AS n,
         | CAST(SUM(CAST(l_quantity AS $D2)) AS DOUBLE) AS qty
         |FROM lineitem GROUP BY GROUPING SETS (
         |  (l_returnflag, l_linestatus), (l_returnflag),
         |  (strftime(l_shipdate, '%Y-%m')))
         |ORDER BY l_returnflag ASC NULLS FIRST,
         | l_linestatus ASC NULLS FIRST, ship_month ASC NULLS FIRST""".stripMargin,
    "q25_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         | CAST(SUM(CAST(l_quantity AS $D2)) AS DOUBLE) AS qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q26_median_cents" ->
      """SELECT o_orderpriority,
        | quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5) AS median_cents,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q27_sessionize" ->
      """SELECT user_id, CAST(SUM(brk) + 1 AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
        |  SELECT user_id,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM events) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
