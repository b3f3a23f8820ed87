package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipelines}

/** Pipeline-composition contracts not covered by the oracle gates:
  * the precomputed-cluster overloads must return exactly what the
  * self-contained forms do (a real pipeline runs connected components
  * once and fans the table out to split + keeper + dedup).
  */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  // two near-dup pairs (docs 0/1 and 2/3 share most shingles) plus a
  // loner; enough structure for minhash clusters to be non-trivial
  private def docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (2L, "one two three four five six seven eight nine ten."),
    (3L, "one two three four five six seven eight nine ten!"),
    (4L, "entirely unrelated text with different words in this row"))
    .toDF("doc_id", "text")

  test("composed cleaning pipeline: real attrition per stage, keepers consistent") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val corpus = graft.Tables.documents(spark, dir)
    val out = Pipelines.cleanTrainingCorpus(corpus)
    val survivors = out.select("doc_id").as[Long].collect().toSet
    val n0 = corpus.count()
    // stage-by-stage replay: each stage must actually drop something
    val q = graft.operators.TextAnalysis.qualityModelScore(corpus)
      .filter(col("score") >= 0.5).select("doc_id").as[Long].collect().toSet
    assert(q.nonEmpty && q.size < n0, s"quality stage dropped nothing: ${q.size}/$n0")
    val kept1 = corpus.filter(col("doc_id").isin(q.toSeq: _*))
    val nonTail = graft.operators.TextAnalysis.perplexityBuckets(kept1)
      .filter(col("bucket") =!= "tail").select("doc_id").as[Long].collect().toSet
    assert(nonTail.size < q.size, "perplexity stage dropped nothing")
    // survivors ⊆ non-tail ⊆ quality-kept, and dedup dropped the rest
    assert(survivors.subsetOf(nonTail) && nonTail.subsetOf(q))
    assert(survivors.size <= nonTail.size)
    // keepers are unique by content fingerprint and are the minimum
    // doc_id of their family among stage-2 survivors
    val fps = graft.operators.TextAnalysis.fingerprint(
        kept1.filter(col("doc_id").isin(nonTail.toSeq: _*)))
      .select("doc_id", "fp").as[(Long, String)].collect()
    val byFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    assert(survivors == byFp.values.toSet)
  }

  test("full pipeline: p21 prefix preserved, fuzzy+decontam stages attrit") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val corpus = graft.Tables.documents(spark, dir)
    val p21 = Pipelines.cleanTrainingCorpus(corpus)
      .select("doc_id").as[Long].collect().toSet
    val p22 = Pipelines.cleanTrainingCorpusFull(corpus)
      .select("doc_id").as[Long].collect().toSet
    // the full pipeline's first three stages ARE p21, so p22 ⊆ p21
    assert(p22.nonEmpty && p22.subsetOf(p21))
    // decontamination must at least drop the bench members themselves
    // that p21 kept
    val benchKept = p21.filter(_ % 50 == 0)
    assert(benchKept.nonEmpty, "fixture has no bench members in p21 output")
    assert(p22.intersect(benchKept).isEmpty, "bench members survived decontam")
    // fuzzy stage: every dropped-by-fuzzy doc's cluster keeper survives
    // to the fuzzy stage (it may still fall to decontamination after)
    val kept3 = corpus.filter(col("doc_id").isin(p21.toSeq: _*))
    val clusters = Dedup.minhashClusters(kept3)
      .select("doc_id", "cluster").as[(Long, Long)].collect().toMap
    val fuzzyKept = p21.filter(id => clusters(id) == id)
    assert(fuzzyKept.subsetOf(p21))
    val expected = fuzzyKept.filter(_ % 50 != 0) -- contaminatedIds(corpus)
    assert(p22 == expected, "p22 != quality→ppl→exact→fuzzy→decontam replay")
  }

  private def contaminatedIds(corpus: org.apache.spark.sql.DataFrame) =
    Dedup.contaminationOverlap(corpus)
      .select("doc_id").as[Long].collect().toSet

  test("leakageSafeSplit via a precomputed cluster table is identical") {
    val clusters = Dedup.minhashClusters(docs)
    val self = Pipelines.leakageSafeSplit(docs).collect().toSet
    val pre = Pipelines.leakageSafeSplit(docs, clusters).collect().toSet
    assert(self.nonEmpty && self == pre)
  }

  test("clusterQualityKeeper via a precomputed cluster table is identical") {
    val clusters = Dedup.minhashClusters(docs, 0.5)
    val self = Pipelines.clusterQualityKeeper(docs).collect().toSet
    val pre = Pipelines.clusterQualityKeeper(docs, clusters).collect().toSet
    assert(self.nonEmpty && self == pre)
  }

  test("pack segments tile every doc exactly and never overfill a pack") {
    // maxTokens=8 forces multi-pack docs out of 10-token texts
    val segs = Pipelines.packSegments(docs, maxTokens = 8L).collect()
    val byDoc = segs.groupBy(_.getAs[Long]("doc_id"))
    val tokenCounts = Pipelines.sequencePackPartitioned(docs, maxTokens = 8L)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per doc: segments tile [0, n_tokens) contiguously
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_off"))
      assert(sorted.head.getAs[Long]("doc_off") == 0L)
      assert(sorted.map(_.getAs[Long]("seg_len")).sum == tokenCounts(id))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("doc_off") + a.getAs[Long]("seg_len") ==
            b.getAs[Long]("doc_off"))
        case _ =>
      }
    }
    // per pack: segments fit within maxTokens and never overlap
    segs.groupBy(_.getAs[Long]("pack_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("seg_len")).sum <= 8L)
      val spans = rows.map(r =>
        (r.getAs[Long]("pack_off"), r.getAs[Long]("pack_off") + r.getAs[Long]("seg_len")))
        .sortBy(_._1)
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 <= s2)
        case _ =>
      }
    }
  }

  test("pack export cuts exact fixed-length sequences and loses no piece") {
    // tiny vocab + maxTokens=4 forces docs to straddle packs; greedy
    // split: "abcd"->[ab,cd], "cdab"->[cd,ab], "abab"->[ab,ab],
    // "x"->[x] (single-char fallback)
    val d = Seq(
      (1L, "abcd ab"), (2L, "cdab abab"), (3L, "ab x abcd"),
      (4L, "abab abab cdab"), (5L, "x"))
      .toDF("doc_id", "text")
    val vocab = Seq("ab", "cd")
    val out = Pipelines.packExport(d, vocab, maxTokens = 4L).cache()
    val rows = out.select("pack_id", "n_segs", "n_toks", "pack_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    // conservation: every piece of every doc lands in exactly one pack
    val totalPieces = 3 + 4 + 4 + 6 + 1
    assert(rows.map(_._3).sum == totalPieces, s"pieces lost: $rows")
    rows.foreach { case (_, _, n, txt) =>
      assert(n <= 4 && txt.split(" ").length == n) }
    // every pack but each stream's LAST is exactly full
    val byPart = rows.groupBy(_._1 >> 40)
    byPart.values.foreach { ps =>
      val sorted = ps.sortBy(_._1)
      sorted.dropRight(1).foreach { case (id, _, n, _) =>
        assert(n == 4, s"non-final pack $id not full") }
    }
    // each doc's piece stream is a contiguous slice of its stream's
    // concatenated text (the layout is concat-and-cut, not shuffle)
    val streams = byPart.map { case (p, ps) =>
      p -> ps.sortBy(_._1).map(_._4).mkString(" ") }
    val pieceText = Map(1L -> "ab cd ab", 2L -> "cd ab ab ab",
      3L -> "ab x ab cd", 4L -> "ab ab ab ab cd ab", 5L -> "x")
    pieceText.foreach { case (_, t) =>
      assert(streams.values.exists(s => s.contains(t)),
        s"doc stream '$t' not contiguous in any part stream") }
    out.unpersist(): Unit
  }

  test("corpus census counts every doc once and shares sum to ~1e6") {
    val cdocs = Seq(
      (0L, "the cat and the dog of the house went to the garden in peace", "web"),
      (1L, "the quick brown fox and the lazy dog of the farm", "web"),
      (2L, "der hund und die katze das haus nicht hier", "books"),
      (3L, "le chat et les chiens des villes est grand", "books"))
      .toDF("doc_id", "text", "source")
    val rows = Pipelines.corpusCensus(cdocs)
      .orderBy("source", "lang_pred").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 4L)
    val totalToks = rows.map(_.getAs[Long]("total_tokens")).sum
    val ppmSum = rows.map(_.getAs[Long]("share_ppm")).sum
    // integer div floors each stratum, so the sum lands within
    // n_strata of exactly 1e6
    assert(ppmSum > 1000000L - rows.length && ppmSum <= 1000000L,
      s"ppm sum $ppmSum over $totalToks tokens")
    // strata are (source, language) — the de/fr docs must not land in 'en'
    val bySrc = rows.map(r => (r.getAs[String]("source"),
      r.getAs[String]("lang_pred"))).toSet
    assert(bySrc == Set(("web", "en"), ("books", "de"), ("books", "fr")))
  }

  test("partitioned packs never collide across streams and cut at maxTokens") {
    val got = Pipelines.sequencePackPartitioned(docs, maxTokens = 8L).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val part = r.getAs[Int]("part")
      val packFirst = r.getAs[Long]("pack_first")
      val offset = r.getAs[Long]("pack_offset")
      // pack ids live in their stream's namespace, offsets inside a pack
      assert(packFirst >> 40 == part.toLong)
      assert(offset >= 0 && offset < 8)
      assert(r.getAs[Long]("pack_last") >= packFirst)
    }
    // within a stream the layout is gapless: starts are the cumsum of
    // the stream's token counts in md5 order
    got.groupBy(_.getAs[Int]("part")).foreach { case (_, rows) =>
      val starts = rows.map(_.getAs[Long]("start_tok")).sorted
      val total = rows.map(_.getAs[Long]("n_tokens")).sum
      assert(starts.head == 0L)
      assert(starts.zip(rows.sortBy(_.getAs[Long]("start_tok"))
        .map(r => r.getAs[Long]("start_tok") + r.getAs[Long]("n_tokens")))
        .forall { case (_, e) => e <= total })
    }
  }

  test("shard shuffle equals the per-shard global window and is a dense permutation") {
    val corpus = spark.range(0, 300).selectExpr("id AS doc_id", "'x' AS text")
    val got = Pipelines.shardShuffle(corpus, nShards = 4, seed = "s1")
      .orderBy("shard", "pos")
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().toSeq
    // driver-side replay of the straightforward form: one window per
    // shard over the full md5 order — the (shard, digit) decomposition
    // must be bit-identical
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keyed = (0L until 300L).map { id =>
      val k = md5hex(s"s1:$id")
      (id, k, (java.lang.Long.parseLong(k.substring(8, 15), 16) % 4).toInt)
    }
    val expect = keyed.groupBy(_._3).toSeq.flatMap { case (shard, rows) =>
      rows.sortBy { case (id, k, _) => (k, id) }.zipWithIndex
        .map { case ((id, _, _), i) => (id, shard, i.toLong) }
    }.sortBy(r => (r._2, r._3))
    assert(got == expect)
    // dense 0..n-1 positions per shard, every doc exactly once
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted == (0L until rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    assert(got.map(_._1).sorted == (0L until 300L).toSeq)
    // same seed reproduces; a different seed permutes
    val again = Pipelines.shardShuffle(corpus, nShards = 4, seed = "s1")
      .orderBy("shard", "pos")
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().toSeq
    assert(again == got, "same seed must reproduce the layout")
    val other = Pipelines.shardShuffle(corpus, nShards = 4, seed = "s2")
      .orderBy("shard", "pos")
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().toSeq
    assert(other != got, "re-seeding must re-shuffle")
  }

  test("alpha mixture up-weights the tail with the hand-computed thresholds") {
    // counts 9 and 4 have exact integer sqrts, so every step of the
    // q/p/threshold chain is hand-checkable: q = 3/5 vs 2/5, T = 13/2
    // = 6, p_big = 0.6*6/9 = 0.4, p_small = 0.4*6/4 = 0.6
    val corpus = ((1 to 9).map(i => (i.toLong, "big")) ++
      (10 to 13).map(i => (i.toLong, "small")))
      .toDF("doc_id", "lang").withColumn("text", lit("x"))
    val got = Pipelines.alphaMixtureSample(corpus)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h28(id: Long) =
      java.lang.Long.parseLong(md5hex(s"p16:$id").substring(0, 7), 16)
    val expect = ((1 to 9).filter(i => h28(i.toLong) <
        math.floor(0.6 * 6 / 9 * (1L << 28)).toLong).map(i => (i.toLong, "big")) ++
      (10 to 13).filter(i => h28(i.toLong) <
        math.floor(0.4 * 6 / 4 * (1L << 28)).toLong).map(i => (i.toLong, "small")))
      .sortBy(_._1)
    assert(got == expect, s"got $got expected $expect")
    // the temperature flattens: the small stratum's keep RATE is higher
    val rates = got.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    assert(rates.getOrElse("small", 0.0) / 4 > rates.getOrElse("big", 0.0) / 9,
      s"tail not up-weighted: $rates")
  }

  test("epoch repeat emits floor-or-ceil epochs from the integer thresholds") {
    val corpus = (1L to 40L).map(i =>
      (i, Seq("en", "de", "zh", "xx")((i % 4).toInt)))
      .toDF("doc_id", "lang").withColumn("text", lit("x"))
    val got = Pipelines.epochRepeat(corpus)
      .orderBy("doc_id", "epoch").as[(Long, String, Int)].collect().toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h28(id: Long) =
      java.lang.Long.parseLong(md5hex(s"p17:$id").substring(0, 7), 16)
    def epochs(id: Long, num: Int, den: Int): Int =
      num / den + (if (h28(id) < (num % den).toLong * (1L << 28) / den) 1 else 0)
    val expect = (1L to 40L).flatMap { i =>
      val lang = Seq("en", "de", "zh", "xx")((i % 4).toInt)
      val n = lang match {
        case "en" => epochs(i, 3, 2) // 1 or 2
        case "de" => epochs(i, 2, 1) // exactly 2 (no fractional part)
        case "zh" => epochs(i, 1, 2) // 0 or 1
        case _    => 0 // unlisted stratum: dropped entirely
      }
      (0 until n).map(e => (i, lang, e))
    }
    assert(got == expect, s"got $got expected $expect")
    // structure sanity: whole-number strata are exact, fractional ones mix
    assert(got.filter(_._2 == "de").groupBy(_._1).forall(_._2.size == 2))
    assert(got.count(_._2 == "en") > got.map(_._1).distinct
      .count(i => i % 4 == 1), "no en doc drew its extra epoch")
    assert(!got.exists(_._2 == "xx"))
  }

  test("budget selection's two-pass plan equals the global-order cumsum (random corpora)") {
    // the p14 claim: histogram-threshold + per-score parallel cumsum is
    // arithmetically identical to one global-order window — check on
    // random corpora against a driver-side replay of the global form
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val docs = (1L to 60L).map { i =>
        val n = 1 + rnd.nextInt(40)
        (i, Seq.fill(n)(if (rnd.nextBoolean()) "word" else "x,").mkString(" "))
      }.toDF("doc_id", "text")
      val budget = 200L + rnd.nextInt(400)
      val got = Pipelines.budgetSelect(docs, budget)
        .orderBy("doc_id")
        .select("doc_id", "start_tok").as[(Long, Long)].collect().toSeq
      // driver-side global replay with the same score/order definitions
      def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val rows = docs.as[(Long, String)].collect().map { case (id, t) =>
        val toks = t.split(" ", -1)
        val n = toks.length.toLong
        val punct = t.count(",;:!?.".contains(_))
        val keep = if (n >= 10 && n <= 100000 && punct.toDouble / n < 0.2) 1 else 0
        (id, n, keep, md5hex(id.toString))
      }
      var acc = 0L
      val expect = rows.sortBy { case (id, _, sc, ord) => (-sc, ord, id) }
        .flatMap { case (id, n, _, _) =>
          val start = acc; acc += n
          if (start < budget) Some(id -> start) else None
        }.sortBy(_._1).toSeq
      assert(got == expect, s"trial $trial diverged (budget $budget)")
    }
  }

  test("z-order cells are axis-aligned 2048x2048 rectangles (the skip guarantee)") {
    // seeded uniform points over the full 16-bit x 16-bit key space
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(5000)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536) / 100.0))
      .zipWithIndex.map { case ((u, v), i) => (i.toLong, u, v) }
      .toDF("event_id", "user_id", "value")
    val cells = Pipelines.zorderStats(pts).collect()
    assert(cells.length > 500, s"grid barely populated: ${cells.length}")
    cells.foreach { r =>
      val (zc, uMin, uMax) = (r.getAs[Int]("zcell"),
        r.getAs[Long]("u_min"), r.getAs[Long]("u_max"))
      val (cMin, cMax) = (r.getAs[Long]("c_min"), r.getAs[Long]("c_max"))
      assert(uMax - uMin < 2048 && cMax - cMin < 2048,
        s"cell $zc not a 2048-rectangle: u[$uMin,$uMax] c[$cMin,$cMax]")
      // the cell id IS the interleave of the dims' top 5 bits
      def morton5(x: Long, y: Long): Long =
        (0 until 5).map(b => (((x >> b) & 1) << (2 * b + 1)) |
          (((y >> b) & 1) << (2 * b))).sum
      assert(zc == morton5(uMin >> 11, cMin >> 11).toInt,
        s"cell $zc does not match its dims' top bits")
    }
    // a one-cell-wide predicate band on EITHER dimension intersects at
    // most two 32-cell grid rows — ≥93% of cells skip
    val uBand = cells.count(r => r.getAs[Long]("u_max") >= 10000 &&
      r.getAs[Long]("u_min") <= 12047)
    assert(uBand <= 64, s"u-band hits $uBand cells of ${cells.length}")
  }

  test("z-order layout range partitions cover disjoint z-ranges") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(2000)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536) / 100.0))
      .zipWithIndex.map { case ((u, v), i) => (i.toLong, u, v) }
      .toDF("event_id", "user_id", "value")
    val ranges = Pipelines.zorderLayout(pts, partitions = 8)
      .select("z").as[Long]
      .mapPartitions(it => if (it.isEmpty) Iterator.empty else {
        val s = it.toSeq; Iterator((s.min, s.max))
      })
      .collect().sortBy(_._1)
    assert(ranges.length > 1, "layout collapsed to one partition")
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file z-ranges: $aMax > $bMin")
      case _ =>
    }
  }

  test("weighted sample biases toward heavy docs; constant weights degenerate to the uniform hash draw") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(id: Long) =
      java.lang.Long.parseLong(md5hex(s"p19:$id").substring(0, 15), 16)
    // sizes 1..400: token-weighted draw must overshoot the corpus mean
    val corpus = (1L to 400L).map(i => (i, i * 7 % 400 + 1))
      .toDF("doc_id", "n_chars")
    val sel = Pipelines.weightedSample(corpus, k = 100)
      .select("n_chars").as[Long].collect()
    val corpusMean = corpus.agg(avg("n_chars")).as[Double].head()
    assert(sel.sum.toDouble / sel.length > corpusMean * 1.15,
      s"no size bias: sample mean ${sel.sum.toDouble / sel.length} " +
        s"vs corpus $corpusMean")
    // constant weights: the E-S key ln(u)/w is monotone in u alone, so
    // the draw must equal the plain top-K by hash (the p03-style sample)
    val const = (1L to 400L).map((_, 50L)).toDF("doc_id", "n_chars")
    val got = Pipelines.weightedSample(const, k = 25)
      .select("doc_id").as[Long].collect().toSet
    val expect = (1L to 400L).sortBy(id => -h60(id)).take(25).toSet
    assert(got == expect, "constant-weight draw is not the uniform hash draw")
  }
}
