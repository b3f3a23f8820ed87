package graft

import graft.operators.TextAnalysis

/** Repetition signals (the other TextAnalysis operators are pinned by
  * their oracle gates t01-t04; repetition's bigram math is worth a
  * hand-computed fixture too).
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("mixture sampling honors per-stratum quotas and drops unlisted strata") {
    // 4 English docs at rate 1/2 -> ceil(2) kept; the 'und' doc is
    // rated 0/1 -> dropped entirely
    val docs = Seq(
      (1L, "the cat and the dog of the town went to the well"),
      (2L, "the bird and the fish of the sea went to the shore"),
      (3L, "the sun and the moon of the sky went to the hill"),
      (4L, "the king and the queen of the land went to the fair"),
      (5L, "xyzzy qwerty asdf zxcv"))
      .toDF("doc_id", "text")
    val rows = graft.operators.Pipelines.mixtureSample(docs,
        rates = Seq("en" -> (1, 2), "und" -> (0, 1)))
      .orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(rows.length == 2 && rows.forall(_._2 == "en"))
  }

  test("gopher repetition matches hand-computed coverage and keep flags") {
    // doc 1: "a b" x3 then distinct tail — hot bigram half the chars
    // doc 2: "x y z w" x3 — every dup-n window covers the whole doc
    // doc 3: 26 distinct letters — the only doc clean enough to keep
    // doc 4: multi-char tokens — pins CHAR (not token-count) weighting
    val docs = Seq(
      (1L, "a b a b a b c d e f g h"),
      (2L, "x y z w x y z w x y z w"),
      (3L, ('a' to 'z').mkString(" ")),
      (4L, "aa bb aa bb cc"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetition(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Int)]
      .collect().toSeq
    assert(got == Seq(
      // (doc, tok_chars, top2, top3, top4, dup5, dup6, dup7, keep)
      (1L, 12L, 500000L, 500000L, 666666L, 0L, 0L, 0L, 0),
      (2L, 12L, 500000L, 750000L, 1000000L, 1000000L, 1000000L, 1000000L, 0),
      (3L, 26L, 76923L, 115384L, 153846L, 0L, 0L, 0L, 1),
      (4L, 10L, 800000L, 600000L, 800000L, 0L, 0L, 0L, 0)), s"got $got")
  }

  test("gopher repetition on a zero-token-char document: ppm 0, keep 0, " +
      "never a division error or null") {
    // empty and whitespace-only docs have tok_chars = 0 — the raw
    // ratio is undefined and the engines disagree on raw ÷0 (Spark
    // div → null, DuckDB // → null/error), so both sides pin the
    // degenerate convention explicitly
    val docs = Seq((1L, ""), (2L, " "), (3L, ('a' to 'z').mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetition(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Int)]
      .collect().toSeq
    assert(got.length == 3)
    got.take(2).foreach { r =>
      assert(r._2 == 0L && r._3 == 0L && r._8 == 0L && r._9 == 0,
        s"degenerate doc must score (0 ppm, keep 0): $r")
    }
    assert(got(2)._9 == 1, s"normal doc unaffected: ${got(2)}")
  }

  test("gopher dup coverage is a position union, not an occurrence sum") {
    // "p q r s t" appears 3x ADJACENT, so the duplicated 5-grams (11
    // occurrences incl. the rotations) overlap heavily; an
    // occurrence-sum would claim 55 token-chars of 17, the true
    // position union is tokens 1..15 of 17
    val docs = Seq(
      (1L, "p q r s t p q r s t p q r s t u v")).toDF("doc_id", "text")
    val row = TextAnalysis.gopherRepetition(docs)
      .select("dup5_ppm").as[Long].collect().head
    assert(row == 15L * 1000000L / 17L, s"got $row")
  }

  test("bm25 matches the hand-computed score and excludes non-matching docs") {
    // corpus: N=3, avgdl=(4+4+2)/3; "cat" df=2, "dog" df=1; doc 3 has
    // no query term and must not appear
    val docs = Seq(
      (1L, "cat cat dog mouse"),
      (2L, "cat fish bird worm"),
      (3L, "no match here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq("cat", "dog"), k = 10)
      .as[(Long, Double)].collect().toSeq
    val (k1, b) = (TextAnalysis.Bm25K1, TextAnalysis.Bm25B)
    val avgdl = 11.0 / 3
    def term(tf: Long, df: Long, len: Long): BigDecimal =
      BigDecimal(math.log(1.0 + (3L - df + 0.5) / (df + 0.5)) *
        (tf * (k1 + 1.0)) /
        (tf + k1 * (1.0 - b + b * len / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val d1 = (term(2, 2, 4) + term(1, 1, 4)).toDouble
    val d2 = term(1, 2, 4).toDouble
    assert(got == Seq((1L, d1), (2L, d2)), s"got $got expected $d1, $d2")
    // a higher-tf doc outranks; k truncates deterministically
    assert(TextAnalysis.bm25TopK(docs, Seq("cat", "dog"), k = 1)
      .as[(Long, Double)].collect().toSeq == Seq((1L, d1)))
  }

  test("surprisal matches the hand-computed unigram LM and brackets keep") {
    // counts: a=3, b=2, c=1, total=6
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    def s(cnt: Long): BigDecimal =
      BigDecimal(-math.log(cnt / 6.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val sum1 = (s(3) + s(3) + s(2)).toDouble
    val sum2 = (s(3) + s(2) + s(1)).toDouble
    val got = TextAnalysis.surprisalScore(docs, lo = 0.9, hi = 1.1)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, sum1, sum1 / 3, if (sum1 / 3 >= 0.9 && sum1 / 3 <= 1.1) 1 else 0),
      (2L, 3L, sum2, sum2 / 3, if (sum2 / 3 >= 0.9 && sum2 / 3 <= 1.1) 1 else 0)),
      s"got $got")
    // bounds bracket: doc 1 (repetitive, lower surprisal) drops when
    // the lo bound rises above its mean
    val strict = TextAnalysis.surprisalScore(docs, lo = sum1 / 3 + 0.01,
        hi = 10.0)
      .orderBy("doc_id").select("keep").as[Int].collect().toSeq
    assert(strict == Seq(0, 1), s"got $strict")
  }

  test("token rarity computes integer mean frequency and hapax counts") {
    // corpus tokens: a×3, b×1, c×1 → total 5
    // freq ppm: a = 600000, b = c = 200000
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.tokenRarity(docs)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      // doc 1: (600000+600000+200000) div 3 = 466666, hapax {b}
      (1L, 3L, 466666L, 1L),
      // doc 2: (600000+200000) div 2 = 400000, hapax {c}
      (2L, 2L, 400000L, 1L)))
  }

  test("repetition signals count bigram mass exactly") {
    val docs = Seq(
      // bigrams: "a b","b a","a b","b a","a b" -> 5 total, top=3,
      // dup mass = 5 (both bigrams repeat)
      (1L, "a b a b a b"),
      // bigrams all distinct -> top=1, dup=0
      (2L, "v w x y z"),
      // single token -> no bigrams -> absent from output
      (3L, "solo"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionSignals(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      (1L, 5L, 3L, 5L, 600000L, 1000000L),
      (2L, 4L, 1L, 0L, 250000L, 0L)))
  }

  test("subword tokenizer matches greedily, longest piece first") {
    import org.apache.spark.sql.functions.col
    // hand-checkable vocab: "abcd" beats "ab"+"cd" at the same start;
    // "cd" catches the tail the 4-piece leaves; chars are the fallback
    val vocab = Seq("abcd", "abc", "ab", "cd", "xy")
    val docs = Seq(
      (1L, "abcde"),      // abcd|e            -> 2 pieces
      (2L, "abcd abab"),  // abcd + ab|ab      -> 1 + 2
      (3L, "zabcd"),      // z|abcd            -> 2 (no mid-word restart skew)
      (4L, "xyxyq"),      // xy|xy|q           -> 3
      (5L, "q"))          // q                 -> 1
      .toDF("doc_id", "text")
    val rows = TextAnalysis.subwordTokenCounts(docs, vocab)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_pieces")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 1L, 2L), (2L, 2L, 3L), (3L, 1L, 2L),
      (4L, 1L, 3L), (5L, 1L, 1L)))
  }

  test("subword pieces partition every word exactly (random corpus)") {
    import org.apache.spark.sql.functions._
    // for ANY word and vocab, the greedy pieces must concatenate back
    // to the word, and the piece count must agree with the count fold
    val rnd = new scala.util.Random(11)
    val docs = (1L to 40L).map { i =>
      val nw = 1 + rnd.nextInt(6)
      (i, Seq.fill(nw)(rnd.alphanumeric.take(1 + rnd.nextInt(10))
        .mkString.toLowerCase).mkString(" "))
    }.toDF("doc_id", "text")
    val vocab = TextAnalysis.subwordVocab(docs, vocabSize = 16)
    val tokenized = TextAnalysis.subwordTokenize(docs, vocab)
      .orderBy("doc_id").as[(Long, Seq[Seq[String]])].collect().toSeq
    val original = docs.orderBy("doc_id")
      .as[(Long, String)].collect().toMap
    tokenized.foreach { case (id, pieces) =>
      // lossless nested form: outer array = words in order, and each
      // word's pieces concatenate back to the word exactly
      assert(pieces.map(_.mkString) == original(id).split(" ", -1).toSeq,
        s"doc $id pieces don't partition the text")
    }
    val counted = TextAnalysis.subwordTokenCounts(docs, vocab)
      .orderBy("doc_id").select("doc_id", "n_pieces")
      .as[(Long, Long)].collect().toMap
    tokenized.foreach { case (id, pieces) =>
      assert(pieces.map(_.size).sum.toLong == counted(id),
        s"doc $id piece count mismatch")
    }
  }

  test("BPE trainer learns the classic merge sequence on low/lower/lowest") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, nMerges = 4)
    // weighted pair counts: (l,o)=5 ties (o,w)=5 -> lexicographic
    // winner (l,o); then (lo,w)=5, (low,e)=2, then (lowe,r)=1 ties
    // (lowe,s)=1 and (s,t)=1 -> (lowe,r)
    assert(merges == Seq("l" -> "o", "lo" -> "w", "low" -> "e",
      "lowe" -> "r"), s"got $merges")
    // tokenization under those merges: trained words collapse, unseen
    // suffixes fall back to remaining symbols
    val counts = TextAnalysis.bpeTokenCounts(docs, merges)
      .select("doc_id", "n_words", "n_pieces")
      .as[(Long, Long, Long)].collect().toSeq
    // low->[low]x3, lower->[lower]=1 piece? no: lower = lowe|r merged
    // by merge 4 -> [lower] is NOT learned; merges give lowe+r ->
    // merge (lowe,r) IS learned -> [lower]. lowest -> lowe|s|t
    assert(counts == Seq((1L, 5L, 3L * 1 + 1 + 3)), s"got $counts")
  }

  test("BPE pieces partition every word and the trainer is deterministic") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val docs = (1L to 30L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(5))(rnd.alphanumeric.take(1 + rnd.nextInt(8))
        .mkString.toLowerCase).mkString(" "))
    }.toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, nMerges = 32)
    assert(merges == TextAnalysis.bpeMerges(docs, nMerges = 32))
    val kernel = new graft.functions.BpeMerges(merges.toArray)
    docs.select(explode(split(col("text"), " ")).as("w")).distinct()
      .as[String].collect().foreach { w =>
      val pieces = kernel.split(w)
      assert(pieces.mkString == w, s"pieces don't partition '$w'")
    }
    assert(kernel.split("").isEmpty)
  }

  test("quality model scores match the hand-replayed logistic; plan is shuffle-free") {
    // doc 1: 10 tokens, 44 chars, 3 stopwords, 1 punct — every feature
    // integer-exact, so the replay is the same arithmetic
    val docs = Seq(
      (1L, "the cat and the dog ran to a red house."),
      (2L, "zz yy xx ww vv uu tt ss rr qq"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityModelScore(docs).orderBy("doc_id")
      .select("doc_id", "n_tokens", "punct_ppm", "stop_ppm", "mlen_c",
        "z", "score", "keep").collect()
    def replay(n: Long, np: Long, ns: Long, lc: Long) = {
      val (pp, sp, ml) = (np * 1000000 / n, ns * 1000000 / n, lc * 100 / n)
      val z = BigDecimal(TextAnalysis.QmW0 +
        TextAnalysis.QmWLen * math.log(n.toDouble) +
        TextAnalysis.QmWStop * (sp.toDouble / 1000000.0) +
        TextAnalysis.QmWPunct * (pp.toDouble / 1000000.0) +
        TextAnalysis.QmWMlen * (ml.toDouble / 100.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val s = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (pp, sp, ml, z, s, if (s >= 0.5) 1 else 0)
    }
    // "the"×2 + "and" + "to" + "a" = 5 stopword hits in doc 1
    val (pp1, sp1, ml1, z1, s1, k1) = replay(10, 1, 5, 39)
    assert(got(0).getLong(2) == pp1 && got(0).getLong(3) == sp1 &&
      got(0).getLong(4) == ml1)
    assert(got(0).getDouble(5) == z1 && got(0).getDouble(6) == s1 &&
      got(0).getInt(7) == k1)
    // the stopword-free junk doc must score lower
    assert(got(0).getDouble(6) > got(1).getDouble(6))
    val plan = TextAnalysis.qualityModelScore(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in a map-only scorer:\n$plan")
  }

  test("bigram LM surprisal matches the hand-computed interpolation") {
    // corpus: unigrams a=3 b=3 c=1 (N=7); bigrams (a,b)=3 (b,a)=1
    // (b,c)=1; left contexts a=3 b=2 — every probability hand-checkable
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(docs).orderBy("doc_id")
      .select("doc_id", "n_toks", "sum_surprisal").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def s6(p: Double): BigDecimal =
      BigDecimal(-math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lam = TextAnalysis.BigramLambda
    def interp(cvw: Long, cv: Long, cw: Long): Double =
      lam * (cvw.toDouble / cv) + (1.0 - lam) * (cw.toDouble / 7.0)
    val d1 = s6(3.0 / 7) + s6(interp(3, 3, 3)) * 2 + s6(interp(1, 2, 3))
    val d2 = s6(3.0 / 7) + s6(interp(3, 3, 3)) + s6(interp(1, 2, 1))
    assert(got.toSeq == Seq((1L, 4L, d1.toDouble), (2L, 3L, d2.toDouble)),
      s"got ${got.toSeq}")
    // in-context tokens must be cheaper than out-of-context ones:
    // p(b|a)=1 > p(b)=3/7, so the bigram term discounts the surprisal
    assert(s6(interp(3, 3, 3)) < s6(3.0 / 7))
    val plan = TextAnalysis.bigramSurprisal(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in the scoring path:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"no map-side combine on the census:\n$plan")
  }

  test("trigram LM surprisal matches the hand-computed interpolation") {
    // corpus: unigrams a=2 b=3 c=3 (N=8); bigrams (a,b)=2 (b,c)=3, left
    // contexts a=2 b=3; trigrams (a,b,c)=2, left pair (a,b)=2 — every
    // probability hand-checkable
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "b c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.trigramSurprisal(docs).orderBy("doc_id")
      .select("doc_id", "n_toks", "sum_surprisal").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def s6(p: Double): BigDecimal =
      BigDecimal(-math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val (l3, l2, l1) = (TextAnalysis.TrigramL3, TextAnalysis.TrigramL2,
      TextAnalysis.TrigramL1)
    val l23 = TextAnalysis.TrigramL3 + TextAnalysis.TrigramL2
    // doc 1/2: pos1 = -ln p(a); pos2 = collapsed bigram form on (a,b);
    // pos3 = full trigram interpolation on (a,b,c)
    val p2ab = l23 * (2.0 / 2) + l1 * (3.0 / 8)
    val p3abc = l3 * (2.0 / 2) + l2 * (3.0 / 3) + l1 * (3.0 / 8)
    val d12 = s6(2.0 / 8) + s6(p2ab) + s6(p3abc)
    // doc 3: pos1 = -ln p(b); pos2 = collapsed form on (b,c)
    val d3 = s6(3.0 / 8) + s6(l23 * (3.0 / 3) + l1 * (3.0 / 8))
    assert(got.toSeq == Seq((1L, 3L, d12.toDouble), (2L, 3L, d12.toDouble),
      (3L, 2L, d3.toDouble)), s"got ${got.toSeq}")
    // the trigram context is the strongest discount: p(c|a,b) = 1
    // beats both the bigram-collapsed and unigram scores for c
    assert(s6(p3abc) < s6(3.0 / 8))
    val plan = TextAnalysis.trigramSurprisal(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in the scoring path:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"no map-side combine on the census:\n$plan")
  }

  test("ccnet perplexity buckets: value-ordered terciles from sample-trained cutoffs") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = graft.Tables.documents(spark, dir)
    val got = TextAnalysis.perplexityBuckets(docs)
      .select("doc_id", "lang", "s_micro", "bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.length == docs.count())
    val byLang = got.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val bs = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      // every bucket populated, and strictly value-ordered: no head
      // doc scores above any middle doc, no middle above any tail
      assert(Set("head", "middle", "tail").subsetOf(bs.keySet),
        s"$lang missing a bucket: ${bs.keySet}")
      assert(bs("head").max <= bs("middle").min &&
        bs("middle").max <= bs("tail").min, s"$lang buckets out of order")
      // driver replay of the cutoff derivation: the ceil(n/3)-th and
      // ceil(2n/3)-th order statistics of the deterministic ¼ sample
      val samp = rows.filter(_._1 % TextAnalysis.PplSampleMod == 0)
        .map(_._3).sorted
      val (c1, c2) = (samp((samp.length + 2) / 3 - 1),
        samp((2 * samp.length + 2) / 3 - 1))
      rows.foreach { case (id, _, s, b) =>
        val want = if (s <= c1) "head" else if (s <= c2) "middle" else "tail"
        assert(b == want, s"doc $id in $lang: $b != $want (s=$s)")
      }
    }
    // the plan buckets map-side against broadcast cutoffs — no
    // corpus-wide ntile window anywhere
    val plan = TextAnalysis.perplexityBuckets(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in the bucketing path:\n$plan")
  }

  test("dsir scores target-like docs above dissimilar ones and replays driver-side") {
    // target stratum (src0) speaks one vocabulary; raw docs 10-12 echo
    // it, raw docs 20-22 don't — importance weights must separate them
    val docs = Seq(
      (1L, "src0", "the quick brown fox jumps over the lazy dog again"),
      (2L, "src0", "the quick brown fox runs past the sleepy dog today"),
      (10L, "web", "the quick brown fox jumps over the lazy dog now"),
      (11L, "web", "quick brown fox jumps over the dog"),
      (20L, "web", "zzz yyy xxx www vvv uuu ttt sss rrr qqq"),
      (21L, "web", "numbers 111 222 333 444 555 666 777 888 999"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.dsirSelect(docs, "src0", topK = 10)
      .select("doc_id", "score").as[(Long, Double)].collect()
      .map { case (id, s) => id -> s }.toMap
    assert(got(10L) > got(20L) && got(11L) > got(21L),
      s"target-like docs not up-weighted: $got")
    // full driver-side replay of the census/smoothing/scoring chain
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val feats = docs.as[(Long, String, String)].collect().flatMap {
      case (id, src, text) =>
        val t = text.split(" ", -1)
        t.sliding(2).filter(_.length == 2).map(p =>
          (id, src, java.lang.Long.parseLong(
            md5hex(s"t17:${p(0)} ${p(1)}").substring(0, 15), 16) % 1024))
    }
    val ct = feats.filter(_._2 == "src0").groupBy(_._3).view.mapValues(_.length)
    val cr = feats.groupBy(_._3).view.mapValues(_.length)
    val (nt, nr) = (ct.values.sum.toLong, cr.values.sum.toLong)
    def term(b: Long): BigDecimal = BigDecimal(
      math.log((ct.getOrElse(b, 0) + 1.0) / (nt + 1024.0)) -
        math.log((cr(b) + 1.0) / (nr + 1024.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expect = feats.groupBy(_._1).view
      .mapValues(fs => fs.map(f => term(f._3)).sum.toDouble).toMap
    got.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-9,
        s"doc $id: engine $s vs replay ${expect(id)}")
    }
  }

  test("dsir broadcasts the term table and takes top-K without a global sort") {
    val docs = (1L to 50L).map(i =>
      (i, if (i % 5 == 0) "src0" else "web", s"word$i and word${i + 1} go"))
      .toDF("doc_id", "source", "text")
    val plan = TextAnalysis.dsirSelect(docs, topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"term join regressed to a corpus shuffle:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"terms not broadcast:\n$plan")
  }

  test("subword vocab ranks substrings by weighted frequency, ties lexicographic") {
    // "ab" appears in both words of doc 1 (weight 2) and doc 2's word
    // (weight 1); every substring of "ab ab" is "ab" itself
    val docs = Seq((1L, "ab ab"), (2L, "abc")).toDF("doc_id", "text")
    val v = TextAnalysis.subwordVocab(docs, vocabSize = 3)
    // freqs: ab=3 (2 from "ab"×2 + 1 inside "abc"), abc=1, bc=1 —
    // the tie between abc/bc breaks lexicographically
    assert(v == Seq("ab", "abc", "bc"))
  }

  test("PII redaction: counts, replacement, idempotence, shuffle-free plan") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "mail a.b@host.com and c@x.org please"),
      (2L, "from 10.1.2.3 to 10.255.0.1 not 11.1.2.3"),
      (3L, "call 555-1234 or 555-99999 ok"), // 555-99999: \b fails → kept
      (4L, "clean text only")).toDF("doc_id", "text")
    val r = TextAnalysis.piiRedact(docs, col("text"))
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("n_email")).toSeq == Seq(2L, 0L, 0L, 0L))
    assert(r.map(_.getAs[Long]("n_ip")).toSeq == Seq(0L, 2L, 0L, 0L))
    assert(r.map(_.getAs[Long]("n_phone")).toSeq == Seq(0L, 0L, 1L, 0L))
    assert(r(0).getAs[String]("redacted") ==
      "mail <EMAIL> and <EMAIL> please")
    assert(r(1).getAs[String]("redacted") ==
      "from <IP> to <IP> not 11.1.2.3")
    assert(r(2).getAs[String]("redacted") == "call <PHONE> or 555-99999 ok")
    // idempotent: redacting redacted text changes nothing
    val again = TextAnalysis.piiRedact(
      TextAnalysis.piiRedact(docs, col("text"))
        .select(col("doc_id"), col("redacted").as("text")), col("text"))
      .orderBy("doc_id").collect()
    assert(again.map(_.getAs[String]("redacted")).toSeq ==
      r.map(_.getAs[String]("redacted")).toSeq)
    // pure map: no exchange anywhere in the plan
    val plan = TextAnalysis.piiRedact(docs, col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("trained LR quality: partitioning-invariant weights that " +
      "separate the label strata") {
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val w1 = TextAnalysis.trainQualityLr(docs).toSeq
    // decimal gradient sums are order-independent: any partitioning
    // trains the identical model
    val w2 = TextAnalysis.trainQualityLr(docs.repartition(7)).toSeq
    assert(w1 == w2)
    // the trained scores actually separate the positive stratum
    val s = TextAnalysis.lrQualityScore(docs, w1)
      .join(docs.select(col("doc_id"),
        (col("lang") === "en").cast("int").as("y")), "doc_id")
      .groupBy("y").agg(avg("score").as("m")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(s(1) > s(0), s.toString)
  }

  test("production PII classes: broad-TLD emails, general IPv4, E.164 " +
      "and formatted phones, SSNs") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "reach dev+ops_1@corp.technology today"),
      (2L, "hosts 192.168.1.1 and 8.8.8.8 but not 999.1.1.1"),
      (3L, "call +14155552671 or 415-555-2671 or 415.555.2671"),
      (4L, "ssn 123-45-6789 on file"),
      (5L, "version 1.2.3 stays")).toDF("doc_id", "text")
    val r = TextAnalysis.piiRedact(docs, col("text"),
      TextAnalysis.PiiClassesProduction).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("redacted") == "reach <EMAIL> today")
    assert(r(0).getAs[Long]("n_email") == 1L)
    // octet-precise: 999.1.1.1 is not an address and is kept
    assert(r(1).getAs[String]("redacted") ==
      "hosts <IP> and <IP> but not 999.1.1.1")
    assert(r(1).getAs[Long]("n_ip") == 2L)
    assert(r(2).getAs[String]("redacted") ==
      "call <PHONE> or <PHONE> or <PHONE>")
    assert(r(2).getAs[Long]("n_phone") == 3L)
    assert(r(3).getAs[String]("redacted") == "ssn <SSN> on file")
    assert(r(3).getAs[Long]("n_ssn") == 1L)
    // a bare dotted version number is neither an IP (3 parts) nor a
    // phone — precision, not just recall
    assert(r(4).getAs[String]("redacted") == "version 1.2.3 stays")
    // the gate's pinned classes exist for cross-engine hash-pinning,
    // not coverage: none of these general IPs are in its 10.0.0.0/8
    val narrow = TextAnalysis.piiRedact(docs, col("text"))
      .orderBy("doc_id").collect()
    assert(narrow.map(_.getAs[Long]("n_ip")).sum == 0L)
  }
}
