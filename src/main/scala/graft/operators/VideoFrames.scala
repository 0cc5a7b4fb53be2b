package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.MediaRecord

/** REAL video frame extraction for the one container+codec pair the
  * JVM can decode without native libraries: MJPEG-in-AVI, where every
  * frame chunk is a complete JPEG that `ImageIO` reads. This upgrades
  * a slice of the video seam from "honest stub" to real — general
  * codecs (H.264 et al.) still route to [[Multimodal.stubDecode]],
  * exactly like audio handles PCM natively and routes compressed
  * codecs to the seam.
  *
  * The RIFF walk mirrors the ISO-BMFF box walk in
  * [[Multimodal.mp4Meta]]: fourcc + little-endian size chunks, LIST
  * containers (`movi` holds the stream; `rec ` groups interleaved
  * frames), word-aligned with a pad byte after odd sizes. Frame
  * chunks are `##dc`/`##db` (compressed/uncompressed stream data).
  *
  * Scale shape: extraction is per-row work behind the usual
  * `mapPartitions` codec seam; each sampled frame is hashed with
  * [[Multimodal.imageAHash]] and the clip becomes (media_id,
  * frame_idx, landmark) rows — the SAME fingerprint contract as
  * [[AudioFingerprint.fingerprints]], so video near-dup matching IS
  * [[AudioFingerprint.nearDupPairs]] (offset-invariant delta
  * histogram) applied to frame hashes.
  */
object VideoFrames {

  /** MJPEG frame payloads of an AVI in stream order, SAMPLED DURING
    * THE WALK: every `stride`-th frame chunk is copied, at most
    * `maxFrames` of them, and the walk stops as soon as the budget is
    * met — a 30-minute clip never materializes 54k frame copies to
    * keep 64. Fails loudly on non-RIFF/non-AVI bytes AND on corrupt
    * chunk sizes (a negative 32-bit size would otherwise stall the
    * cursor — an executor hang, which no Try can catch); zero-length
    * (dropped) frames are skipped without consuming stride positions.
    */
  def aviMjpegFrames(
      payload: Array[Byte],
      stride: Int = 1,
      maxFrames: Int = Int.MaxValue): Vector[Array[Byte]] = {
    require(stride >= 1 && maxFrames >= 1, "stride and maxFrames must be >= 1")
    require(payload.length >= 12, "not an AVI: too short")
    def fourcc(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    require(fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      s"not an AVI: ${fourcc(0)}/${fourcc(8)}")
    val frames = Vector.newBuilder[Array[Byte]]
    var kept = 0
    var seen = 0
    // walk chunks in [from, until); descend into LIST movi / rec
    def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
      var o = from
      while (o + 8 <= until && kept < maxFrames) {
        val id = fourcc(o)
        val size = le32(o + 4).toInt
        require(size >= 0, s"corrupt chunk size at offset $o")
        val dataStart = o + 8
        val dataEnd = math.min(until, dataStart + size)
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(dataStart)
          if (listType == "movi" || listType == "rec ")
            walk(dataStart + 4, dataEnd, inMovi = true)
        } else if (inMovi && size > 0 && id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db"))) {
          if (seen % stride == 0) {
            frames += java.util.Arrays.copyOfRange(payload, dataStart, dataEnd)
            kept += 1
          }
          seen += 1
        }
        // chunks are word-aligned: odd sizes carry one pad byte
        o = dataStart + size + (size & 1)
      }
    }
    walk(12, math.min(payload.length, 8 + le32(4).toInt), inMovi = false)
    frames.result()
  }

  /** Per-clip frame-hash fingerprints: every `stride`-th MJPEG frame
    * (up to `maxFrames`) decoded for real and reduced to its
    * [[Multimodal.imageAHash]] — (media_id, frame_idx, landmark) in
    * sampled order. With the default stride = 1 a trimmed lead-in
    * shifts every index by a constant, exactly what the delta
    * matcher absorbs; a coarser stride trades that robustness for
    * decode cost (only trims divisible by the stride still align).
    *
    * Degradation is PER FRAME: an undecodable frame (truncated final
    * chunk of an interrupted upload) is skipped while every intact
    * frame keeps its sampled index, so the clip still matches on what
    * survived; only a clip whose CONTAINER fails to parse yields no
    * fingerprints (the [[AudioFingerprint.fingerprints]] contract).
    * Uniform frames (black lead-ins, title cards, fades) all hash to
    * the same constant and carry no identifying evidence — they are
    * excluded so two unrelated clips can never "match" on their fade
    * frames.
    */
  def fingerprints(
      media: Dataset[MediaRecord],
      stride: Int = 1,
      maxFrames: Int = 64): DataFrame = {
    require(stride >= 1 && maxFrames >= 1, "stride and maxFrames must be >= 1")
    import media.sparkSession.implicits._
    media
      .filter(m => m.meta != null && m.meta.mime != null &&
        m.meta.mime.startsWith("video/") && m.payload != null)
      .mapPartitions(_.flatMap { m =>
        scala.util.Try(aviMjpegFrames(m.payload, stride, maxFrames))
          .getOrElse(Vector.empty)
          .iterator.zipWithIndex
          .flatMap { case (jpeg, i) =>
            scala.util.Try(Multimodal.imageAHash(jpeg)).toOption
              .filter(_ != 0L) // a flat frame's hash: zero evidence
              .map(h => (m.media_id, i, h))
          }
      })
      .toDF("media_id", "frame_idx", "landmark")
  }

  /** Offset-invariant video near-dup pairs over frame hashes — the
    * audio delta-histogram matcher verbatim (same print schema).
    */
  def nearDupPairs(
      prints: DataFrame,
      minMatches: Int = 4,
      maxBucket: Int = 1000): DataFrame =
    AudioFingerprint.nearDupPairs(prints, minMatches, maxBucket)
}
