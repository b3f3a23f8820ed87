package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches (the Scala analog of mapInPandas).
  *
  * The decode step itself is STUBBED — this container has no
  * image/audio codecs — with a deterministic fake that derives metadata
  * from the payload bytes, so the Spark-side plumbing (schema, batch
  * iteration, partitioning, generated frame rows) is real and tested
  * while the codec call is an obvious swap-in point.
  */
object Multimodal {

  /** A decoded media asset's typed metadata. */
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
      format: String, checksum: String)

  /** A sampled video frame reference. */
  case class FrameRef(doc_id: Long, frame_idx: Int, frame_key: String)

  /** Deterministic fake "decode": metadata derived from payload size and
    * id. Real deployment: replace the body with an actual codec call
    * (e.g. TwelveMonkeys/JavaCV) — the signature and batch shape stay.
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
      checksum = org.apache.commons.codec.digest.DigestUtils.md5Hex(payload))
  }

  /** Attach an opaque binary payload column (here synthesized from text
    * bytes; in production this is the raw media column as ingested).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Batch-decode the payload column per partition — the mapInPandas
    * analog: one JVM-side iterator pass per partition, no shuffle, and
    * the decode batch size is the parquet row-group/partition size.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
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

  val queries: Map[String, Q] = Map(
    "m01_decode_meta" -> ((s, d) =>
      decodeMeta(s, Tables.documents(s, d)).toDF().orderBy(col("doc_id"))),
    "m02_frame_sample" -> ((s, d) =>
      sampleFrames(s, Tables.documents(s, d)).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))))

  val oracle: Map[String, String] = Map(
    "m01_decode_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byte_len,
        | CAST(octet_length(CAST(text AS BLOB)) % 640 + 16 AS INT) AS width,
        | CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 + 16 AS INT) AS height,
        | CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        | md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m02_frame_sample" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        | md5(CAST(doc_id AS VARCHAR)||':'||CAST(f AS VARCHAR)) AS frame_key
        |FROM documents, LATERAL (SELECT unnest(range(0, CAST(doc_id % 5 AS INT))) AS f)
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
