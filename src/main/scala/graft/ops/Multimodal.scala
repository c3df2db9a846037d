package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by per-partition batch
  * functions (the Scala analogue of `mapInPandas` — one iterator per
  * partition, so decoder setup cost amortizes across the batch and the
  * planner sees real schemas on both sides).
  *
  * The actual media decoding is STUBBED (this container ships no
  * image/audio codecs): `decodeFeatures`' "decoder" is a deterministic
  * fake over the raw bytes, clearly marked below. Everything around it —
  * binary columns in Parquet, metadata structs, partition-batched UDF
  * shape, frame sampling, feature schema — is real and tested, so a real
  * codec drops into `decodeBytes` without touching the plumbing.
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  case class MediaItem(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, n_bytes: Int, checksum: Long,
                           brightness: Double, histogram: Array[Long])
  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Synthesize a media table from `documents` (payload = utf8 bytes) —
    * the landing-zone shape a real ingest would produce.
    */
  def synthesizeMedia(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 2 === 0, lit("image/png")).otherwise(lit("audio/wav")).as("mime"),
        (col("n_chars") % 1920).cast("int").as("width"),
        (col("n_chars") % 1080).cast("int").as("height"),
        (col("n_chars") * 10).as("durationMs")).as("meta"))
      .as[MediaItem]
  }

  // ---- STUB: deterministic fake decoder ---------------------------------
  // A real implementation would decode the codec here (e.g. PNG → pixel
  // array). The fake derives features purely from the raw bytes so tests
  // and plans are deterministic without any codec dependency.
  private[ops] def decodeBytes(payload: Array[Byte]): (Long, Double, Array[Long]) = {
    var checksum = 0L
    val hist = new Array[Long](16)
    var sum = 0.0
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = checksum * 31 + b
      hist(b % 16) += 1
      sum += b
      i += 1
    }
    (checksum, if (payload.length == 0) 0.0 else sum / payload.length, hist)
  }
  // -----------------------------------------------------------------------

  /** Per-partition batched "decode": the mapInPandas-shaped hot path —
    * decoder initialization happens once per partition, rows stream
    * through the iterator without per-row setup.
    */
  def decodeFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { items =>
      // per-partition decoder setup would go here (once, not per row)
      items.map { m =>
        val (checksum, brightness, hist) = decodeBytes(m.payload)
        MediaFeatures(m.media_id, m.payload.length, checksum, brightness, hist)
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload —
    * the video-keyframe extraction shape (1 input row → N frame rows).
    */
  def sampleFrames(media: Dataset[MediaItem], frameSize: Int, stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (bytes, i) => Frame(m.media_id, i, bytes) }
    }
  }

  /** "Resize": deterministic byte-domain downsample to `targetBytes`
    * (stub for image resize — keeps every ceil(n/target)-th byte).
    */
  def resizePayload(media: Dataset[MediaItem], targetBytes: Int): Dataset[MediaItem] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val n = m.payload.length
      val out = if (n <= targetBytes) m.payload
      else {
        val step = math.ceil(n.toDouble / targetBytes).toInt
        m.payload.indices.collect { case i if i % step == 0 => m.payload(i) }.toArray
      }
      m.copy(payload = out)
    }
  }
}
