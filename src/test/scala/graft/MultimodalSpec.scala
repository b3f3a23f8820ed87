package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The multimodal decode path: real PNG bytes through the JDK ImageIO
  * decoder, with the stub fallback for non-image payloads.
  */
class MultimodalSpec extends SparkSpec {

  test("pngBytes round-trips through ImageIO with the generated dims and pixel") {
    for (id <- Seq(1L, 4L, 97L, 1000L)) {
      val bytes = Multimodal.pngBytes(
        Multimodal.imgWidth(id), Multimodal.imgHeight(id), Multimodal.imgRgb(id))
      // a real PNG: magic bytes present, decoder agrees with generator
      assert(bytes.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
      val meta = Multimodal.decodeImage(id, bytes).get
      assert(meta.width == Multimodal.imgWidth(id))
      assert(meta.height == Multimodal.imgHeight(id))
      assert(meta.format == "png")
      assert(meta.px.contains(Multimodal.imgRgb(id)))
      assert(meta.byte_len == bytes.length)
    }
  }

  test("payload dedup groups by raw bytes exactly as the triple/text oracle key does") {
    import spark.implicits._
    // ids 1 and 769 differ by lcm(48, 32, 256)·3 = 768: identical
    // (width, height, rgb) triples -> byte-identical PNGs (the
    // injectivity the m05 oracle leans on); id 4 is a png with a
    // different triple; ids 0/3 share text bytes; id 6 is unique text
    assert(Multimodal.imgWidth(1) == Multimodal.imgWidth(769) &&
      Multimodal.imgHeight(1) == Multimodal.imgHeight(769) &&
      Multimodal.imgRgb(1) == Multimodal.imgRgb(769))
    assert(java.util.Arrays.equals(
      Multimodal.pngBytes(Multimodal.imgWidth(1), Multimodal.imgHeight(1),
        Multimodal.imgRgb(1)),
      Multimodal.pngBytes(Multimodal.imgWidth(769), Multimodal.imgHeight(769),
        Multimodal.imgRgb(769))))
    val docs = Seq(
      (0L, "same text"), (3L, "same text"), (6L, "other text"),
      (1L, "png doc a"), (769L, "png doc b"), (4L, "png doc c"))
      .toDF("doc_id", "text")
    val got = Multimodal.payloadDedupGroups(docs)
      .orderBy("keeper").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, "0,3"), (1L, 2L, "1,769"), (4L, 1L, "4"), (6L, 1L, "6")),
      s"got $got")
  }

  test("non-image payloads fall back to the stub, poisoned magic bytes included") {
    val plain = "just some words".getBytes("UTF-8")
    assert(Multimodal.decodeImage(7L, plain).isEmpty)
    // text that *starts with* an image magic prefix (BMP's "BM") must
    // not crash the batch — the choked reader falls back to the stub
    val poisoned = "BM radio text that is not a bitmap".getBytes("UTF-8")
    val meta = Multimodal.decodeImage(9L, poisoned)
      .getOrElse(Multimodal.stubDecode(9L, poisoned))
    assert(meta.px.isEmpty && meta.byte_len == poisoned.length)
  }

  test("decodeMeta dispatches per row: image docs decoded, others stubbed") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta"), (1L, "gamma"), (2L, "delta epsilon"),
      (4L, "zeta")).toDF("doc_id", "text")
    val out = Multimodal.decodeMeta(spark, docs).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(1L).format == "png" &&
      out(1L).px.contains(Multimodal.imgRgb(1L)) &&
      out(1L).width == Multimodal.imgWidth(1L))
    assert(out(4L).format == "png" && out(4L).px.contains(Multimodal.imgRgb(4L)))
    assert(out(0L).format == "jpeg" && out(0L).px.isEmpty)
    assert(out(2L).format == "webp" && out(2L).px.isEmpty)
  }

  test("wavBytes round-trips through the RIFF parser with generated params") {
    for (id <- Seq(2L, 5L, 8L, 11L, 998L)) {
      val (rate, ch, ns) =
        (Multimodal.wavRate(id), Multimodal.wavChannels(id),
          Multimodal.wavSamples(id))
      val bytes = Multimodal.wavBytes(rate, ch, ns, id)
      assert(bytes.take(4).toSeq == "RIFF".getBytes("US-ASCII").toSeq)
      assert(bytes.length == 44 + ns * ch * 2)
      val Some((gotRate, gotCh, gotBits, gotN)) = Multimodal.parseRiffWav(bytes)
      assert(gotRate == rate && gotCh == ch && gotBits == 16 && gotN == ns)
    }
  }

  test("RIFF parser rejects poisoned payloads instead of failing the batch") {
    assert(Multimodal.parseRiffWav("plain words".getBytes("UTF-8")).isEmpty)
    // a RIFF prefix with trash after it must not throw
    val poisoned = "RIFFxxxxWAVEtrash that is not chunks at all padding"
      .getBytes("US-ASCII")
    assert(Multimodal.parseRiffWav(poisoned).isEmpty)
    // truncated real WAV: header promises more data than present
    val real = Multimodal.wavBytes(8000, 1, 100, 3L)
    assert(Multimodal.parseRiffWav(real.take(30)).isEmpty)
    // corrupt chunk size whose Int truncation is negative (0xFFFFFFF8)
    // must terminate, not stall the chunk walk in an infinite loop
    val evil = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
    evil.put("LIST".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
    assert(Multimodal.parseRiffWav(evil.array()).isEmpty)
  }

  test("mp4Bytes round-trips through the BMFF box walk with generated params") {
    for (id <- Seq(0L, 3L, 6L, 9L, 996L)) {
      val bytes = Multimodal.mp4Bytes(
        Multimodal.mp4Timescale(id), Multimodal.mp4DurTicks(id))
      assert(bytes.length == 132)
      assert(new String(bytes, 4, 4, "US-ASCII") == "ftyp")
      val Some((ts, ticks)) = Multimodal.parseIsoBmff(bytes)
      assert(ts == Multimodal.mp4Timescale(id))
      assert(ticks == Multimodal.mp4DurTicks(id))
    }
  }

  test("BMFF walk rejects poisoned payloads instead of spinning or failing") {
    assert(Multimodal.parseIsoBmff("just words not boxes at all!".getBytes).isEmpty)
    // a valid ftyp followed by a zero-size box ("to end of file") must
    // terminate, not loop on a non-advancing offset
    val evil = java.nio.ByteBuffer.allocate(32)
    evil.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    evil.putInt(0).put("free".getBytes("US-ASCII"))
    assert(Multimodal.parseIsoBmff(evil.array()).isEmpty)
    // truncated real mp4: moov promised but cut off
    val real = Multimodal.mp4Bytes(600, 500L)
    assert(Multimodal.parseIsoBmff(real.take(40)).isEmpty)
  }

  test("decodeVideoMeta dispatches per row: mp4 docs parsed, others stubbed") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta"), (1L, "gamma"), (3L, "delta"),
      (5L, "epsilon zeta")).toDF("doc_id", "text")
    val out = Multimodal.decodeVideoMeta(spark, docs).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(0L).src == "bmff" && out(0L).timescale == Multimodal.mp4Timescale(0L)
      && out(0L).dur_ticks == Multimodal.mp4DurTicks(0L) && out(0L).byte_len == 132L)
    assert(out(3L).src == "bmff" && out(3L).timescale == Multimodal.mp4Timescale(3L))
    assert(out(1L).src == "stub" && out(1L).byte_len == "gamma".length.toLong)
    assert(out(5L).src == "stub" && out(5L).timescale == 1000)
  }

  test("decodeAudioMeta dispatches per row: wav docs parsed, others stubbed") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta"), (2L, "gamma"), (5L, "delta"),
      (7L, "epsilon zeta")).toDF("doc_id", "text")
    val out = Multimodal.decodeAudioMeta(spark, docs).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(2L).src == "riff" && out(2L).sample_rate == Multimodal.wavRate(2L)
      && out(2L).n_samples == Multimodal.wavSamples(2L).toLong
      && out(2L).channels == Multimodal.wavChannels(2L) && out(2L).bits == 16)
    assert(out(5L).src == "riff" && out(5L).sample_rate == Multimodal.wavRate(5L))
    assert(out(0L).src == "stub" && out(0L).byte_len == "alpha beta".length.toLong)
    assert(out(7L).src == "stub" && out(7L).sample_rate == 8000)
  }

  /** The m06 oracle formula: dHash recomputed from patCell, bit i =
    * y·8+x packed into a Long — must equal the DECODED-pixels hash.
    */
  private def formulaDhash(id: Long): Long = {
    var hash = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (Multimodal.patCell(id, x, y) > Multimodal.patCell(id, x + 1, y))
        hash |= 1L << (y * 8 + x)
    hash
  }

  test("decoded-pixels dHash equals the formula dHash at both block scales") {
    // every image-branch id in the sf0.001 fixture range, covering
    // k=1 (9×8) and k=2 (18×16) plus all three variants
    val ids = (0L until 500L).filter(_ % 3 == 1)
    assert(ids.exists(Multimodal.patScale(_) == 1) &&
      ids.exists(Multimodal.patScale(_) == 2))
    for (id <- ids) {
      val got = Multimodal.dhash64(Multimodal.patternPngBytes(id))
      assert(got.contains(formulaDhash(id)), s"doc $id")
    }
    // non-image bytes yield no hash instead of poisoning the batch
    assert(Multimodal.dhash64("not an image at all".getBytes("UTF-8")).isEmpty)
  }

  test("a perturbed PNG collides in dHash while its bytes differ (real near-dup)") {
    // ids 1 and 160 share a family (mod 159) as variants v0/v1: the
    // +25 brightness shift changes every pixel byte but no gradient
    assert(Multimodal.patVariant(1L) == 0 && Multimodal.patVariant(160L) == 1
      && Multimodal.patSeed(1L) == Multimodal.patSeed(160L))
    val a = Multimodal.patternPngBytes(1L)
    val b = Multimodal.patternPngBytes(160L)
    assert(!java.util.Arrays.equals(a, b))
    assert(Multimodal.dhash64(a).get == Multimodal.dhash64(b).get)
  }

  test("banded near-dup pairs match brute force and surface hamming>=1 matches") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val got = Multimodal.perceptualNearDupPairs(spark, docs)
      .as[(Long, Long, Int)].collect().toSet
    // brute force over the formula hashes (banding is full-recall at
    // hamming<=3 by pigeonhole, so the sets must be equal)
    val ids = docs.select("doc_id").as[Long].collect().filter(_ % 3 == 1).sorted
    val h = ids.map(id => id -> formulaDhash(id)).toMap
    val brute = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      hm = java.lang.Long.bitCount(h(ids(i)) ^ h(ids(j)))
      if hm <= 3
    } yield (ids(i), ids(j), hm)).toSet
    assert(got == brute)
    assert(got.exists(_._3 == 0) && got.exists(_._3 >= 1),
      s"expected both exact and near matches, got hams ${got.map(_._3)}")
    // byte-different brightness variants land at hamming 0
    assert(got.contains((1L, 160L, 0)))
  }

  /** The m07 oracle formula: 16-bit energy-gradient fingerprint from
    * audAmp — must equal the DECODED-PCM fingerprint.
    */
  private def formulaAfp(id: Long): Int = {
    var fp = 0
    for (f <- 0 until 16)
      if (Multimodal.audAmp(id, f) > Multimodal.audAmp(id, f + 1))
        fp |= 1 << f
    fp
  }

  test("decoded-PCM fingerprint equals the formula fingerprint for every variant") {
    val ids = (0L until 500L).filter(_ % 3 == 2)
    assert((0 to 2).forall(v => ids.exists(Multimodal.audVariant(_) == v)))
    for (id <- ids) {
      val got = Multimodal.audioFp16(Multimodal.audioPatternWav(id))
      assert(got.contains(formulaAfp(id)), s"doc $id")
    }
    // non-audio bytes yield no fingerprint instead of poisoning the batch
    assert(Multimodal.audioFp16("not audio".getBytes("UTF-8")).isEmpty)
    // a stereo/8-bit WAV is skipped too: the kernel only claims PCM16 mono
    assert(Multimodal.audioFp16(
      Multimodal.wavBytes(8000, 2, 100, seed = 5L)).isEmpty)
  }

  test("linear-family probe fixture: distinct envelopes, gate fixture untouched") {
    // the generalized signature with the gate constants is the gate
    // fixture byte-for-byte (oracle/bench behavior pinned)
    for (id <- 2L to 300L by 3L)
      assert(java.util.Arrays.equals(Multimodal.audioPatternWav(id),
        Multimodal.audioPatternWav(id, Multimodal.AudFamilies,
          Multimodal.AudFrames, mixed = false)), s"id $id")
    // the scaled family space carries ~independent envelopes: the
    // mixed amp avoids the gate formula's linear mod-151 progression
    // (which saturates the fp space — measured 470 families → 158
    // distinct 33-frame fps), so true pairs scale with families
    val fams = 470
    val frames = 33
    val reps = (0 until fams by 3).flatMap { s =>
      (0 until 200000).iterator.map(_.toLong)
        .find(id => id % 3 == 2 && id % fams == s &&
          Multimodal.audVariant(id, fams) == 0)
    }
    val fps = reps.map(id => Multimodal.audioFp(
      Multimodal.audioPatternWav(id, fams, frames, mixed = true), frames).get)
    assert(fps.distinct.size == fps.size,
      s"expected all-distinct fps, got ${fps.distinct.size}/${fps.size}")
    val close = (for {
      i <- fps.indices; j <- (i + 1) until fps.size
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 3
    } yield 1).size
    assert(close <= 1, s"cross-family ham<=3 family pairs: $close")
  }

  test("linear-family image fixture: distinct dhashes, gate fixture untouched") {
    for (id <- 1L to 300L by 3L)
      assert(java.util.Arrays.equals(Multimodal.patternPngBytes(id),
        Multimodal.patternPngBytes(id, Multimodal.PatFamilies,
          mixed = false)), s"id $id")
    val fams = 530
    val reps = (0 until fams by 3).flatMap { s =>
      (0 until 200000).iterator.map(_.toLong)
        .find(id => id % 3 == 1 && id % fams == s &&
          Multimodal.patVariant(id, fams) == 0)
    }
    val fps = reps.map(id => Multimodal.dhash64(
      Multimodal.patternPngBytes(id, fams, mixed = true)).get)
    assert(fps.distinct.size == fps.size,
      s"expected all-distinct dhashes, got ${fps.distinct.size}/${fps.size}")
    val close = (for {
      i <- fps.indices; j <- (i + 1) until fps.size
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 3
    } yield 1).size
    assert(close == 0, s"cross-family ham<=3 family pairs: $close")
  }

  test("linear-family video fixture: distinct signatures, gate fixture untouched") {
    // gate byte-identity through the generalized signature
    for (id <- 0L to 300L by 3L)
      assert(java.util.Arrays.equals(Multimodal.videoPatternMp4(id),
        Multimodal.videoPatternMp4(id, Multimodal.VidFamilies,
          mixed = false)), s"id $id")
    // the scaled family space carries ~independent 64-bit signatures:
    // no cross-family ham<=3 collisions even without resolution growth
    val fams = 430
    val reps = (0 until fams by 3).flatMap { s =>
      (0 until 200000).iterator.map(_.toLong)
        .find(id => id % 3 == 0 && id % fams == s &&
          Multimodal.vidVariant(id, fams) == 0)
    }
    val fps = reps.map(id => Multimodal.videoFp(
      Multimodal.videoPatternMp4(id, fams, mixed = true)).get)
    assert(fps.distinct.size == fps.size,
      s"expected all-distinct signatures, got ${fps.distinct.size}/${fps.size}")
    val close = (for {
      i <- fps.indices; j <- (i + 1) until fps.size
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 3
    } yield 1).size
    assert(close == 0, s"cross-family ham<=3 family pairs: $close")
  }

  test("audio banded pairs match brute force; polarity inversion collides at ham 0") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val got = Multimodal.audioNearDupPairs(spark, docs)
      .as[(Long, Long, Int)].collect().toSet
    val ids = docs.select("doc_id").as[Long].collect().filter(_ % 3 == 2).sorted
    val h = ids.map(id => id -> formulaAfp(id)).toMap
    val brute = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      hm = Integer.bitCount(h(ids(i)) ^ h(ids(j)))
      if hm <= 3
    } yield (ids(i), ids(j), hm)).toSet
    assert(got == brute)
    // v0→v1 (polarity inversion): every byte of the data chunk differs,
    // magnitudes don't — hamming 0, invisible to the exact m05 hash
    val fam = ids.filter(id => Multimodal.audSeed(id) == Multimodal.audSeed(2L))
    val v0 = fam.find(Multimodal.audVariant(_) == 0).get
    val v1 = fam.find(Multimodal.audVariant(_) == 1).get
    assert(got.contains((math.min(v0, v1), math.max(v0, v1), 0)))
    assert(!java.util.Arrays.equals(
      Multimodal.audioPatternWav(v0), Multimodal.audioPatternWav(v1)))
    // v0→v2 (single-frame boost) flips at most the two adjacent bits,
    // so the banded join (full recall at ham<=3) always surfaces it
    val v2 = fam.find(Multimodal.audVariant(_) == 2).get
    val p = (math.min(v0, v2), math.max(v0, v2))
    val hm = got.find(g => (g._1, g._2) == p)
    assert(hm.exists(_._3 <= 2), s"v0/v2 pair $p missing or too far: $hm")
    // the resolution knob (the scale probe's m07 mitigation): more
    // frames split collision classes — fewer candidate pairs — while
    // structural collisions survive: polarity inversion has identical
    // magnitudes at ANY resolution, so the v0/v1 pair stays at ham 0
    val hi = Multimodal.audioNearDupPairs(spark, docs, frames = 33)
      .as[(Long, Long, Int)].collect().toSet
    assert(hi.size < got.size,
      s"33 frames did not shrink the pair set: ${hi.size} vs ${got.size}")
    assert(hi.contains((math.min(v0, v1), math.max(v0, v1), 0)),
      "polarity collision lost at higher resolution")
  }

  /** The m08 signature from the fixture formulas alone (no decode):
    * sampled frame j = stored frame 2j; bit 16j+x = colGrad(x).
    */
  private def formulaVfp(id: Long): Long = {
    var sig = 0L
    for (j <- 0 until Multimodal.VidFramesSampled; x <- 0 until 16)
      if (Multimodal.vidCell(id, 2 * j, x) > Multimodal.vidCell(id, 2 * j, x + 1))
        sig |= 1L << (16 * j + x)
    sig
  }

  test("decoded-mdat video signature equals the formula signature per variant") {
    val ids = (0L until 500L).filter(_ % 3 == 0)
    assert((0 to 2).forall(v => ids.exists(Multimodal.vidVariant(_) == v)))
    for (id <- ids) {
      val got = Multimodal.videoFp(Multimodal.videoPatternMp4(id))
      assert(got.contains(formulaVfp(id)), s"doc $id")
    }
    // non-video bytes yield no signature instead of poisoning the batch
    assert(Multimodal.videoFp("not video".getBytes("UTF-8")).isEmpty)
    // a container with too few whole frames is skipped, not mis-hashed
    assert(Multimodal.videoFp(Multimodal.mp4Bytes(1000, 8L)).isEmpty)
  }

  test("video banded pairs match brute force; re-encode collides at ham 0") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val got = Multimodal.videoNearDupPairs(spark, docs)
      .as[(Long, Long, Int)].collect().toSet
    // every pair is video-branch only: the signature exists for no
    // other modality, so cross-modality collisions are impossible
    assert(got.forall(p => p._1 % 3 == 0 && p._2 % 3 == 0))
    val ids = docs.select("doc_id").as[Long].collect().filter(_ % 3 == 0).sorted
    val h = ids.map(id => id -> formulaVfp(id)).toMap
    val brute = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      hm = java.lang.Long.bitCount(h(ids(i)) ^ h(ids(j)))
      if hm <= 3
    } yield (ids(i), ids(j), hm)).toSet
    assert(got == brute)
    // v0→v1 (re-encode: extra `free` box): byte-different container,
    // frame-identical pixels — hamming 0, invisible to the exact m05
    // byte hash
    val fam = ids.filter(id => Multimodal.vidSeed(id) == Multimodal.vidSeed(0L))
    val v0 = fam.find(Multimodal.vidVariant(_) == 0).get
    val v1 = fam.find(Multimodal.vidVariant(_) == 1).get
    assert(got.contains((math.min(v0, v1), math.max(v0, v1), 0)))
    assert(!java.util.Arrays.equals(
      Multimodal.videoPatternMp4(v0), Multimodal.videoPatternMp4(v1)))
    // v0→v2 (single-cell boost in one SAMPLED frame) flips at most the
    // two adjacent bits of that frame's word — the banded join (band =
    // frame word; full recall at ham<=3) always surfaces it
    val v2 = fam.find(Multimodal.vidVariant(_) == 2).get
    val p = (math.min(v0, v2), math.max(v0, v2))
    val hm = got.find(g => (g._1, g._2) == p)
    assert(hm.exists(_._3 <= 2), s"v0/v2 pair $p missing or too far: $hm")
  }
}
