package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Sketch-aggregate properties: the paper guarantees each sketch is
  * used FOR, pinned on the real fixtures — mergeability for HLL (the
  * property that makes partial aggregation a correct sketch-merge
  * tree), one-sided error for CMS, estimator accuracy for HLL/KMV.
  */
class SketchesSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, d)
  private lazy val docs = Tables.documents(spark, d)

  test("HLL registers merge by max: two halves fold to the whole corpus") {
    val whole = Sketches.hllRegisters(events, col("event_type"),
      col("event_id"), "merge:")
    val half = (pred: org.apache.spark.sql.Column) =>
      Sketches.hllRegisters(events.filter(pred), col("event_type"),
        col("event_id"), "merge:")
    val merged = half(col("event_id") % 2 === 0)
      .unionAll(half(col("event_id") % 2 === 1))
      .groupBy(col("g"), col("bucket")).agg(max(col("mreg")).as("mreg"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // and therefore the estimates agree exactly
    val eW = Sketches.hllEstimate(whole).select("g", "hll_est").collect().toSet
    val eM = Sketches.hllEstimate(merged).select("g", "hll_est").collect().toSet
    assert(eW == eM && eW.nonEmpty)
  }

  test("HLL estimate lands within 3 standard errors on both branches") {
    val got = Sketches.hllGate(events).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_est")
      // m=512 -> sigma ~ 4.6% raw, better for linear counting
      assert(math.abs(est - exact) / exact < 0.14,
        s"${r.getAs[String]("event_type")}/${r.getAs[String]("elem")}: " +
          s"est $est vs exact $exact")
    }
  }

  test("CMS estimates are one-sided: never below the true count") {
    val got = Sketches.cmsHeavyHitters(docs).collect()
    assert(got.length == 20)
    got.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_cnt"))
    }
  }

  test("KMV pairwise Jaccard and union track the exact set overlap") {
    import graft.functions.TextFns.{shingles, tokens}
    val overlap = Sketches.kmvSourceOverlap(docs)
    val sh = docs.select(col("source"),
      explode(shingles(tokens(col("text")))).as("g")).distinct()
    // exact pairwise overlap via self-join (test-only: quadratic)
    val exact = sh.toDF("sa", "ga").join(sh.toDF("sb", "gb"),
        col("sa") < col("sb") && col("ga") === col("gb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n_int"))
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val checked = overlap
      .join(exact, col("source_a") === col("sa") &&
        col("source_b") === col("sb"), "left")
      .join(sizes.toDF("s1", "na"), col("source_a") === col("s1"))
      .join(sizes.toDF("s2", "nb"), col("source_b") === col("s2"))
      .select(col("source_a"), col("source_b"), col("jacc_ppm"),
        col("union_est"), coalesce(col("n_int"), lit(0L)).as("n_int"),
        (col("na") + col("nb") - coalesce(col("n_int"), lit(0L)))
          .as("n_union"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val trueJ = r.getAs[Long]("n_int").toDouble / r.getAs[Long]("n_union")
      val estJ = r.getAs[Long]("jacc_ppm").toDouble / 1e6
      // K=256 -> sigma ~ 1/sqrt(256) ~ 6%; allow 3 sigma + quantization
      assert(math.abs(estJ - trueJ) < 0.2,
        s"${r.getAs[String]("source_a")}-${r.getAs[String]("source_b")}: " +
          s"jacc est $estJ vs exact $trueJ")
      val trueU = r.getAs[Long]("n_union").toDouble
      val estU = r.getAs[Double]("union_est")
      assert(math.abs(estU - trueU) / trueU < 0.25,
        s"union est $estU vs exact $trueU")
    }
  }

  test("KMV build is one map-side-partial aggregation, no corpus window") {
    val plan = Sketches.kmvSketches(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-task stage:\n$plan")
    // the one-pass build's scale contract: the gram stream is folded
    // by a PARTIAL bottom-k aggregate before its only exchange (so the
    // shuffle carries <=K-long sketch partials, never grams), and no
    // window/sort stage touches the corpus at all
    assert(plan.contains("partial_bottom_k_agg"),
      s"no map-side sketch partial:\n$plan")
    assert(!plan.contains("Window"), s"corpus window crept back:\n$plan")
  }

  test("KMV one-pass aggregate preserves the sketch on both paths") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFns.tokens
    graft.functions.VectorExprs.register(spark)
    def brute(d: org.apache.spark.sql.DataFrame) = d
      .select(col("source"),
        explode(call_function("gram_hashes", tokens(col("text")), lit(3)))
          .as("h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rn") <= 256).drop("rn")
      .collect().toSet
    // real corpus: one-pass aggregate result == brute bottom-K over
    // the distinct hash set
    val sk = Sketches.kmvSketches(docs).collect().toSet
    assert(sk.nonEmpty && sk == brute(docs))
    // pathological duplication (the case that broke the retired
    // occurrence-threshold prune): 2000 copies of one 30-token doc —
    // 56000 occurrences, only 28 distinct grams. The distinct insert
    // must fold the duplicates and keep all 28.
    import spark.implicits._
    val text = (0 until 30).map(i => s"tok$i").mkString(" ")
    val dup = (1 to 2000).map(i => (i.toLong, "dupsrc", text))
      .toDF("doc_id", "source", "text")
    val skD = Sketches.kmvSketches(dup).collect().toSet
    assert(skD.size == 28, s"fallback missed hashes: kept ${skD.size}/28")
    assert(skD == brute(dup))
  }

  test("histogram quantile estimates bracket the exact percentiles") {
    val got = Sketches.logHistQuantiles(events).collect()
    assert(got.length == 15) // 5 event types x 3 probes
    val exact = events.select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    got.foreach { r =>
      val vs = exact(r.getAs[String]("event_type"))
      val k = math.ceil(r.getAs[Int]("q") * vs.length / 100.0).toInt
      val truth = vs(k - 1)
      val est = r.getAs[Double]("est")
      // log2 buckets bound the error at 2x; interpolation tightens it
      assert(est / truth > 0.5 && est / truth < 2.0,
        s"${r.getAs[String]("event_type")} p${r.getAs[Int]("q")}: " +
          s"est $est vs exact $truth")
    }
  }

  test("histogram buckets merge by addition: halves sum to the whole") {
    // mergeability: the sketch of a union is the cell-wise sum — so
    // the quantile table computed from merged halves equals the whole
    val whole = Sketches.logHistQuantiles(events).collect().toSeq
    val merged = Sketches.logHistQuantiles(
      events.filter(col("event_id") % 2 === 0)
        .unionAll(events.filter(col("event_id") % 2 =!= 0))).collect().toSeq
    assert(whole == merged && whole.nonEmpty)
  }

  test("streamed HLL registers equal the batch x01 user branch exactly") {
    val streamed = Sketches.hllStreamGate(spark, d)
      .select("event_type", "zeros", "sum_scaled", "hll_est").collect().toSeq
    val batch = Sketches.hllGate(events).filter(col("elem") === "user")
      .select("event_type", "zeros", "sum_scaled", "hll_est").collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streamed CMS counters equal the batch build cell-for-cell") {
    // mergeability by cell-wise addition across micro-batch boundaries:
    // the landed complete-mode counter table IS the batch sketch
    val streamed = Sketches.cmsStreamGate(spark, d)
      .collect().toSeq.map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sorted
    val probed = Sketches.cmsHeavyHitters(docs).collect()
    assert(streamed.nonEmpty)
    // the batch x02 probe estimates must be reproducible from the
    // streamed counters alone (min over the probe token's D cells)
    val byCell = streamed.map { case (j, c, n) => (j, c) -> n }.toMap
    probed.foreach { r =>
      val tok = r.getString(0)
      def cell(j: Int): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"x02:$j:$tok".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(7)
        java.lang.Long.parseLong(hex, 16) % 1024
      }
      val est = (0 until 4).map(j => byCell((j, cell(j)))).min
      assert(est == r.getLong(2),
        s"token '$tok': streamed-counter estimate $est vs batch ${r.getLong(2)}")
    }
  }

  test("streamed histogram equals the batch build cell-for-cell and feeds x04 quantiles") {
    // mergeability by bucket-count addition across micro-batch
    // boundaries: the landed complete-mode histogram IS the batch
    // sketch — and because quantile extraction is a deterministic
    // function of the cells, the full sketch→quantile path follows
    val landed = Sketches.histStreamGate(spark, d)
    val streamed = landed.collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val batch = Sketches.histBuckets(events)
      .orderBy(col("event_type"), col("bucket")).collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(streamed == batch && streamed.nonEmpty)
    val qStream = Sketches.quantilesFromHist(landed).collect().toSeq
    val qBatch = Sketches.logHistQuantiles(events).collect().toSeq
    assert(qStream == qBatch && qStream.nonEmpty)
  }

  test("bottom_k_agg is sort-distinct-take-k under any partitioning") {
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    // values with duplicates, spread across partitions so the capped
    // sorted-merge (partial-agg combine) path actually runs
    val vals = (1L to 3000L).map(i => (i % 7, (i * 2654435761L) % 1000L))
    val expected = vals.groupBy(_._1).view.mapValues(
      _.map(_._2).distinct.sorted.take(256)).toMap
    for (parts <- Seq(1, 4)) {
      val df = vals.toDF("g", "v").repartition(parts)
      val got = df.groupBy(col("g"))
        .agg(call_function("bottom_k_agg", col("v"), lit(256)).as("sk"))
        .select(col("g"), col("sk")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == expected, s"parts=$parts")
    }
    // the cap evicts the maximum: k=5 keeps exactly the 5 smallest
    val small = vals.toDF("g", "v").groupBy(col("g"))
      .agg(call_function("bottom_k_agg", col("v"), lit(5)).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(small == expected.map { case (g, xs) => g -> xs.take(5) })
  }

  test("streamed KMV sketch equals the batch bottom-K hash-for-hash") {
    // the order-statistics fold: BottomKAgg's bounded buffer through
    // the state store must land the same per-source sketch the batch
    // threshold-pruned rank build produces
    val streamed = Sketches.kmvStreamGate(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = Sketches.kmvSketches(docs)
      .orderBy(col("source"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streamed sketch-view maintenance equals the batch rollup exactly") {
    // appended register PARTIALS from two flushes must max-merge to
    // the direct build — mergeability as incremental view maintenance
    val streamed = Sketches.rollupStreamGate(spark, d).collect().toSeq
    val batch = Sketches.hllPartitionRollup(events).collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("partition-sketch rollup equals the direct sketch over the pruned range") {
    // mergeability over the PARTITION dimension: max-merging the
    // per-day register maxima must reproduce the registers of a direct
    // build over the date-filtered rows — estimate columns and all
    val rolled = Sketches.hllPartitionRollup(events)
      .select("event_type", "zeros", "sum_scaled", "hll_est")
      .collect().toSeq.sortBy(_.getString(0))
    val day = to_date(timestamp_micros(graft.util.Cols.nsToUs("ts")))
    val direct = Sketches.hllEstimate(Sketches.hllRegisters(
        events.filter(day.between(lit(Sketches.RollupLoDay),
          lit(Sketches.RollupHiDay))),
        col("event_type"), col("user_id"), "x05:"))
      .withColumnRenamed("g", "event_type")
      .select("event_type", "zeros", "sum_scaled", "hll_est")
      .collect().toSeq.sortBy(_.getString(0))
    assert(rolled.nonEmpty && rolled == direct)
    // the persisted partition-sketch table is bounded by partitions ×
    // registers, never by raw rows — the reason it can be maintained
    val parts = Sketches.hllRegisters(events.withColumn("day", day),
      struct(col("event_type"), col("day")), col("user_id"), "x05:")
    val nTypes = events.select("event_type").distinct().count()
    val nDays = events.select(day.as("d")).distinct().count()
    assert(parts.count() <= nTypes * nDays * 512)
  }

  test("CMS counter build collapses map-side: bounded groups, one scan") {
    val plan = Sketches.cmsHeavyHitters(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe join not broadcast:\n$plan")
  }
}
