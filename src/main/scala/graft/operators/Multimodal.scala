package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches (the Scala analog of mapInPandas).
  *
  * The image branch is a REAL decode: payloads that sniff as an image
  * (magic-byte detection via `javax.imageio` — part of every JDK, no
  * extra dependency) are decoded with `ImageIO`, and the gated metadata
  * (width / height / format / first pixel) comes from the decoder, not
  * from the payload generator. Non-image payloads (and any byte string
  * a reader chokes on) fall back to a deterministic stub — the honest
  * swap-in point for audio/video codecs this container lacks.
  */
object Multimodal {

  // ImageIO's default ImageInputStream/ImageOutputStream cache spools
  // through temp FILES — per-image disk round-trips that dominate
  // small-image codec work. Memory caching is ~an order of magnitude
  // faster for payloads that already sit in executor memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** A decoded media asset's typed metadata. `px` is the top-left pixel
    * as a 24-bit RGB int — decoder-derived proof of a real decode; None
    * on the stub path.
    */
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
      format: String, checksum: String, px: Option[Int])

  /** A sampled video frame reference. */
  case class FrameRef(doc_id: Long, frame_idx: Int, frame_key: String)

  /** Fixture image parameters, all pure functions of doc_id so the
    * DuckDB oracle can recompute the EXPECTED decode output without a
    * PNG codec: the gate then checks generator formulas == ImageIO's
    * decoded values.
    */
  def imgWidth(id: Long): Int = (id % 48 + 1).toInt
  def imgHeight(id: Long): Int = ((id * 7) % 32 + 1).toInt
  def imgRgb(id: Long): Int =
    ((id % 256) * 65536 + ((id * 7) % 256) * 256 + (id * 13) % 256).toInt

  /** Encode a solid-color PNG via the JDK's ImageIO — real compressed
    * PNG bytes, not a fake header.
    */
  def pngBytes(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic fake decode for non-image payloads: metadata derived
    * from payload size and id. Real deployment: replace the body with
    * an audio/video codec call (e.g. JavaCV) — the signature and batch
    * shape stay.
    */
  def stubDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val fmt = (docId % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    MediaMeta(docId, payload.length,
      width = (payload.length % 640) + 16,
      height = ((payload.length * 7) % 480) + 16,
      fmt,
      checksum = org.apache.commons.codec.digest.DigestUtils.md5Hex(payload),
      px = None)
  }

  /** Sniff + decode an image payload with ImageIO. None when no
    * installed reader recognizes the bytes OR a reader chokes mid-parse
    * (e.g. text that happens to start with a magic prefix like "BM") —
    * callers fall back to [[stubDecode]], so a poisoned payload can
    * never fail the batch.
    */
  def decodeImage(docId: Long, payload: Array[Byte]): Option[MediaMeta] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val img = r.read(0)
            Some(MediaMeta(docId, payload.length,
              img.getWidth, img.getHeight,
              r.getFormatName.toLowerCase(java.util.Locale.ROOT),
              org.apache.commons.codec.digest.DigestUtils.md5Hex(payload),
              px = Some(img.getRGB(0, 0) & 0xffffff)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Attach the opaque binary payload column: every third doc
    * (doc_id % 3 == 1) carries REAL PNG bytes sized/colored by the
    * doc_id formulas above; the rest carry raw text bytes (the
    * non-image branch). A Scala UDF is justified here: PNG encoding is
    * codec work no Catalyst expression expresses, and this column is
    * the fixture boundary, not a hot query path.
    */
  def withPayload(docs: DataFrame): DataFrame = {
    val gen = udf { (id: Long, text: String) =>
      if (id % 3 == 1) pngBytes(imgWidth(id), imgHeight(id), imgRgb(id))
      else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    docs.withColumn("payload", gen(col("doc_id"), col("text")))
  }

  /** Batch-decode the payload column per partition — the mapInPandas
    * analog: one JVM-side iterator pass per partition, no shuffle, and
    * the decode batch size is the parquet row-group/partition size.
    * Image payloads take the real ImageIO path; everything else stubs.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    // Codec work is CPU-bound and embarrassingly parallel, but a small
    // corpus arrives as one parquet split — spread it across cores
    // first (at 100 TB the scan itself yields thousands of splits and
    // AQE keeps this repartition a cheap no-op-sized shuffle; the
    // alternative — one core grinding a whole file's images — is the
    // real cost).
    withPayload(docs.repartition(spark.sparkContext.defaultParallelism))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeImage(id, bytes).getOrElse(stubDecode(id, bytes)) })
  }

  /** Frame sampling for "video" payloads: docs get doc_id%5 frames, each
    * with a deterministic content key — a generator (flatMap) pattern;
    * at scale this is the explode that fans one asset row into its
    * sampled frames without materializing the video twice.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame): Dataset[FrameRef] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].flatMap { id =>
      (0 until (id % 5).toInt).map { f =>
        FrameRef(id, f, org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"$id:$f"))
      }
    }
  }

  type Q = (SparkSession, String) => DataFrame

  /** m01 gates the decode-dependent columns (width/height/format/px are
    * ImageIO output on the image branch); byte_len/checksum stay in the
    * Dataset API but out of the gate — a compressed PNG's length/digest
    * isn't recomputable in an engine without the codec.
    */
  val queries: Map[String, Q] = Map(
    "m01_decode_meta" -> ((s, d) =>
      decodeMeta(s, Tables.documents(s, d)).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("format"), col("px"))
        .orderBy(col("doc_id"))),
    "m02_frame_sample" -> ((s, d) =>
      sampleFrames(s, Tables.documents(s, d)).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))))

  val oracle: Map[String, String] = Map(
    // expected decode output, recomputed from the fixture formulas
    "m01_decode_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 48 + 1 AS INT)
        |      ELSE CAST(octet_length(CAST(text AS BLOB)) % 640 + 16 AS INT) END AS width,
        | CASE WHEN doc_id % 3 = 1 THEN CAST((doc_id * 7) % 32 + 1 AS INT)
        |      ELSE CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 + 16 AS INT) END AS height,
        | CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        | CASE WHEN doc_id % 3 = 1 THEN CAST((doc_id % 256) * 65536
        |      + ((doc_id * 7) % 256) * 256 + (doc_id * 13) % 256 AS INT) END AS px
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m02_frame_sample" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        | md5(CAST(doc_id AS VARCHAR)||':'||CAST(f AS VARCHAR)) AS frame_key
        |FROM documents, LATERAL (SELECT unnest(range(0, CAST(doc_id % 5 AS INT))) AS f)
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
