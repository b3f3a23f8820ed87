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
}
