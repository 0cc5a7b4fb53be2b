package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside. The
  * Spark-side machinery — schema, partitioning, batch shape, per-
  * partition decode — is real and tested; the actual codec call is a
  * pluggable function because media libraries are not available in this
  * build environment (see [[stubDecode]] / [[fakeDecode]]).
  *
  * Scale shape: decode is per-row work behind `mapPartitions`, so it
  * parallelizes with the scan and never shuffles; [[scatterForDecode]]
  * breaks payload-size clustering so decode tasks stay balanced when
  * sizes are skewed (one 4K video next to thumbnails).
  */
object Multimodal {

  /** Canonical media-record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("byte_len", LongType, nullable = true))), nullable = true)))

  final case class MediaMeta(mime: String, source: String, byte_len: Long)
  final case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class DecodedFeatures(
      media_id: Long,
      byte_len: Long,
      checksum: String,
      width: Int,
      height: Int,
      n_frames: Int)

  implicit val mediaEncoder: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val featEncoder: Encoder[DecodedFeatures] = Encoders.product[DecodedFeatures]

  /** Wrap any table with a string column into media records: payload =
    * UTF-8 bytes of the column. Lets the documents fixture stand in for
    * a binary corpus so the plumbing is exercised end-to-end.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, source: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        lit(source).as("source"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len")).as("meta"))

  /** The real decoder seam: payload bytes → (width, height, frames).
    * STUB — media codecs are not present in this environment; plug a
    * real implementation (JavaCV/ImageIO/ffmpeg) here in deployment.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int) =
    throw new UnsupportedOperationException(
      "media codec not available in this build; use fakeDecode for tests")

  /** Deterministic fake decode for tests: derives plausible dimensions
    * from the payload bytes so downstream logic (resize, frame-sample,
    * feature join) is testable without codecs.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 16 + java.lang.Math.floorMod(h, 4080)
    val ht = 16 + java.lang.Math.floorMod(h >> 12, 2144)
    val frames = 1 + java.lang.Math.floorMod(h >> 22, 240)
    (w, ht, frames)
  }

  /** Per-partition decode + feature extraction. The decode function runs
    * inside executor tasks (mapPartitions batch shape — one JVM call per
    * partition, amortizing any codec init across rows).
    */
  def decodeFeatures(
      media: Dataset[MediaRecord],
      decode: Array[Byte] => (Int, Int, Int) = stubDecode): Dataset[DecodedFeatures] =
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
        val (w, h, f) = decode(bytes)
        val sum = digest.digest(bytes).map("%02x".format(_)).mkString
        digest.reset()
        DecodedFeatures(r.media_id, bytes.length.toLong, sum, w, h, f)
      }
    }

  /** Deterministic frame sampling plan: every `stride`-th frame index up
    * to `maxFrames` — pure expression logic over the decoded frame count.
    */
  def sampleFrameIndexes(nFrames: org.apache.spark.sql.Column, stride: Int, maxFrames: Int) =
    slice(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)), 1, maxFrames)

  /** Break payload clustering before a CPU-bound decode stage: size-
    * ordered inputs (e.g. all 4K videos in one input file) would
    * straggle; hashing each row's id+length scatters big payloads
    * across all partitions so every task sees a similar byte mix.
    */
  def scatterForDecode(
      df: DataFrame, idCol: String, sizeCol: String, parallelism: Int): DataFrame =
    df.repartition(
      parallelism,
      pmod(xxhash64(col(idCol), col(sizeCol)), lit(parallelism)))
}
