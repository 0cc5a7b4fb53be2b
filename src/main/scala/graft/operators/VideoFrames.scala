package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.MediaRecord

/** REAL video frame extraction for the container+codec pairs the JVM
  * can decode without native libraries: MJPEG-in-AVI (every frame
  * chunk is a complete JPEG that `ImageIO` reads), raw YUV4MPEG2
  * / Y4M (uncompressed planar frames — no codec at all), and
  * MJPEG-in-MOV (QuickTime sample tables pointing at complete JPEG
  * samples — the same decoder behind an ISO-BMFF walk). This
  * upgrades a slice of the video seam from "honest stub" to real —
  * general codecs (H.264 et al.) still route to
  * [[Multimodal.stubDecode]], exactly like audio handles PCM natively
  * and routes compressed codecs to the seam.
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

  /** Luma planes of a YUV4MPEG2 (Y4M) stream in order, sampled during
    * the walk exactly like [[aviMjpegFrames]] — the SECOND real
    * container: raw uncompressed frames, the interchange format every
    * encoder toolchain emits, needing no codec at all. Returns
    * `(width, height, yPlane)` per sampled frame; chroma planes are
    * skipped over but never copied (the fingerprint is luma-only,
    * matching the luminance-weighted gray [[Multimodal.imageAHash]]
    * computes from RGB). Fails loudly on non-Y4M bytes, unknown
    * colorspaces, and non-positive dimensions; a truncated final
    * frame (interrupted upload) is dropped, not padded.
    */
  def y4mFrames(
      payload: Array[Byte],
      stride: Int = 1,
      maxFrames: Int = Int.MaxValue): Vector[(Int, Int, Array[Byte])] = {
    require(stride >= 1 && maxFrames >= 1, "stride and maxFrames must be >= 1")
    val magic = "YUV4MPEG2"
    require(payload.length > magic.length + 1 &&
      new String(payload, 0, magic.length,
        java.nio.charset.StandardCharsets.US_ASCII) == magic,
      "not a Y4M stream")
    // -1 = no newline before EOF (a TRUNCATED line, not a corrupt one)
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < payload.length && payload(i) != '\n') i += 1
      if (i < payload.length) i else -1
    }
    val hdrEnd = lineEnd(0)
    require(hdrEnd >= 0, "unterminated Y4M header line")
    val params = new String(payload, 0, hdrEnd,
      java.nio.charset.StandardCharsets.US_ASCII).split(' ').drop(1)
    def tag(t: Char): Option[String] =
      params.collectFirst { case p if p.nonEmpty && p.head == t => p.tail }
    val w = tag('W').map(_.toInt).getOrElse(0)
    val h = tag('H').map(_.toInt).getOrElse(0)
    require(w > 0 && h > 0, s"Y4M needs positive W/H tags, got ${w}x$h")
    // frame size is computed in Int (luma + chroma <= 3*w*h for C444);
    // header-declared dims like W65536 H65536 would wrap w*h to 0 or
    // negative, turning every downstream length check vacuous — fail
    // loudly on the attacker-controlled header instead
    require(w.toLong * h <= Int.MaxValue / 3,
      s"Y4M dims ${w}x$h overflow frame-size arithmetic " +
        s"(w*h must be <= ${Int.MaxValue / 3})")
    val cs = tag('C').getOrElse("420") // spec default
    val lumaLen = w * h
    val chromaLen = cs match {
      case c if c.startsWith("420") => 2 * ((w + 1) / 2) * ((h + 1) / 2)
      case c if c.startsWith("422") => 2 * ((w + 1) / 2) * h
      case c if c.startsWith("444") => 2 * w * h
      case c if c.startsWith("mono") => 0
      case other => throw new IllegalArgumentException(
        s"unsupported Y4M colorspace C$other")
    }
    val frames = Vector.newBuilder[(Int, Int, Array[Byte])]
    var kept = 0
    var seen = 0
    var o = hdrEnd + 1
    while (o < payload.length && kept < maxFrames) {
      // an interrupted upload can cut INSIDE a marker or its parameter
      // line, not just inside pixel data — every incomplete trailing
      // piece is end-of-stream (keep the intact frames), while bytes
      // that are present but not a FRAME marker are corruption and
      // fail loudly
      if (o + 5 > payload.length) {
        o = payload.length // truncated mid-marker: drop the tail
      } else {
        require(new String(payload, o, 5,
            java.nio.charset.StandardCharsets.US_ASCII) == "FRAME",
          s"corrupt Y4M frame marker at offset $o")
        val markerEnd = lineEnd(o) // FRAME line may carry parameters
        if (markerEnd < 0) {
          o = payload.length // truncated mid-parameter-line: drop
        } else {
          val dataStart = markerEnd + 1
          if (dataStart + lumaLen + chromaLen > payload.length) {
            o = payload.length // truncated final frame: drop it
          } else {
            if (seen % stride == 0) {
              frames += ((w, h, java.util.Arrays.copyOfRange(
                payload, dataStart, dataStart + lumaLen)))
              kept += 1
            }
            seen += 1
            o = dataStart + lumaLen + chromaLen
          }
        }
      }
    }
    frames.result()
  }

  /** [[Multimodal.blockAHash]] over a raw luma plane — the Y4M
    * counterpart of [[Multimodal.imageAHash]] (a Y plane already IS
    * the luminance that aHash grays RGB down to).
    */
  def lumaAHash(w: Int, h: Int, yPlane: Array[Byte]): Long = {
    require(yPlane.length >= w * h, "short luma plane")
    Multimodal.blockAHash(w, h, (x, y) => yPlane(y * w + x) & 0xff)
  }

  /** Container dispatch for [[fingerprints]]: `(sampled_idx, hash)`
    * per decodable, non-flat frame. Magic-sniffed, not mime-trusted:
    * RIFF/AVI → per-frame JPEG decode + [[Multimodal.imageAHash]];
    * YUV4MPEG2 → raw luma + [[lumaAHash]].
    */
  /** MJPEG frame payloads of a QuickTime/ISO-BMFF MOV in sample
    * order, sampled during the walk like [[aviMjpegFrames]] — the
    * THIRD real container, reusing the SAME JPEG decoder: QuickTime's
    * classic MJPEG stores each frame as one complete JPEG sample
    * (`stsd` format `jpeg`/`mjpa`), so extraction is pure sample-table
    * arithmetic, no codec.
    *
    * Sample-table walk (the `stbl` contract): `stsd` gates the format,
    * `stsz` carries per-sample sizes, `stco`/`co64` the FILE-ABSOLUTE
    * chunk offsets, and `stsc` maps chunks to samples-per-chunk runs.
    * Fails loudly when no video track carries an MJPEG stsd entry or
    * when a sample lands outside the payload (corrupt offsets — an
    * out-of-range copy must not become a silent empty result);
    * zero-size samples (dropped frames) are skipped without consuming
    * stride positions.
    */
  def movMjpegFrames(
      payload: Array[Byte],
      stride: Int = 1,
      maxFrames: Int = Int.MaxValue): Vector[Array[Byte]] = {
    require(stride >= 1 && maxFrames >= 1, "stride and maxFrames must be >= 1")
    import Multimodal.Bmff
    def kids(b: (String, Int, Int)): Seq[(String, Int, Int)] =
      Bmff.children(payload, b._2, b._3)
    val top = Bmff.children(payload, 0, payload.length)
    val moov = top.collectFirst { case b @ ("moov", _, _) => b }
      .getOrElse(throw new IllegalArgumentException("no moov box: not MP4/MOV"))
    val stbls = kids(moov).collect { case t @ ("trak", _, _) => t }
      .flatMap(t => kids(t).collect { case m @ ("mdia", _, _) => m })
      .flatMap(m => kids(m).collect { case mi @ ("minf", _, _) => mi })
      .flatMap(mi => kids(mi).collect { case st @ ("stbl", _, _) => st })
    val mjpegStbl = stbls.find { st =>
      kids(st).collectFirst { case ("stsd", s, e) => (s, e) }.exists {
        case (s, e) =>
          // ver/flags(4) entry_count(4), then entries: size(4) format(4)
          s + 16 <= e && {
            val fmt = new String(payload, s + 12, 4,
              java.nio.charset.StandardCharsets.US_ASCII)
            fmt == "jpeg" || fmt == "mjpa" || fmt == "mjpb"
          }
      }
    }.getOrElse(throw new IllegalArgumentException(
      "no MJPEG video track (stsd jpeg/mjpa) in MOV"))
    val boxes = kids(mjpegStbl).map(b => b._1 -> (b._2, b._3)).toMap
    def u32(o: Int): Long = Bmff.be32(payload, o)

    val (szS, szE) = boxes.getOrElse("stsz",
      throw new IllegalArgumentException("MOV missing stsz"))
    val uniform = u32(szS + 4)
    val nSamples = u32(szS + 8).toInt
    require(nSamples >= 0 && (uniform != 0 || szS + 12 + 4L * nSamples <= szE),
      "corrupt stsz table")
    def sampleSize(i: Int): Int =
      (if (uniform != 0) uniform else u32(szS + 12 + 4 * i)).toInt

    val (scS, scE) = boxes.getOrElse("stsc",
      throw new IllegalArgumentException("MOV missing stsc"))
    val nStsc = u32(scS + 4).toInt
    require(scS + 8 + 12L * nStsc <= scE, "corrupt stsc table")
    val stsc = (0 until nStsc).map { i =>
      (u32(scS + 8 + 12 * i).toInt, u32(scS + 12 + 12 * i).toInt)
    } // (first_chunk 1-based, samples_per_chunk)

    val offsets: IndexedSeq[Long] = boxes.get("stco").map { case (s, e) =>
      val n = u32(s + 4).toInt
      require(s + 8 + 4L * n <= e, "corrupt stco table")
      (0 until n).map(i => u32(s + 8 + 4 * i))
    }.orElse(boxes.get("co64").map { case (s, e) =>
      val n = u32(s + 4).toInt
      require(s + 8 + 8L * n <= e, "corrupt co64 table")
      (0 until n).map(i => Bmff.be64(payload, s + 8 + 8 * i))
    }).getOrElse(throw new IllegalArgumentException("MOV missing stco/co64"))

    def samplesInChunk(chunk1: Int): Int = {
      // last stsc entry whose first_chunk <= chunk1 governs
      val run = stsc.takeWhile(_._1 <= chunk1).lastOption
      run.map(_._2).getOrElse(0)
    }

    val frames = Vector.newBuilder[Array[Byte]]
    var kept = 0
    var seen = 0 // global sample index across chunks
    var sampleNo = 0
    var chunk = 0
    while (chunk < offsets.length && sampleNo < nSamples && kept < maxFrames) {
      var off = offsets(chunk)
      var inChunk = 0
      val perChunk = samplesInChunk(chunk + 1)
      while (inChunk < perChunk && sampleNo < nSamples && kept < maxFrames) {
        val size = sampleSize(sampleNo)
        require(size >= 0 && off >= 0 && off + size <= payload.length,
          s"corrupt MOV: sample $sampleNo at $off size $size outside payload")
        if (size > 0) {
          if (seen % stride == 0) {
            frames += java.util.Arrays.copyOfRange(
              payload, off.toInt, (off + size).toInt)
            kept += 1
          }
          seen += 1
        }
        off += size
        inChunk += 1
        sampleNo += 1
      }
      chunk += 1
    }
    frames.result()
  }

  private val BmffTopBoxes =
    Set("ftyp", "moov", "mdat", "wide", "free", "skip", "pnot")

  private def frameHashes(
      payload: Array[Byte], stride: Int, maxFrames: Int): Vector[(Int, Long)] =
    if (payload.length >= 9 &&
        new String(payload, 0, 9,
          java.nio.charset.StandardCharsets.US_ASCII) == "YUV4MPEG2")
      y4mFrames(payload, stride, maxFrames).zipWithIndex.flatMap {
        case ((w, h, yp), i) =>
          scala.util.Try(lumaAHash(w, h, yp)).toOption
            .filter(_ != 0L).map(hash => (i, hash))
      }
    else {
      val isBmff = payload.length >= 8 && BmffTopBoxes.contains(
        new String(payload, 4, 4, java.nio.charset.StandardCharsets.US_ASCII))
      val jpegs =
        if (isBmff) movMjpegFrames(payload, stride, maxFrames)
        else aviMjpegFrames(payload, stride, maxFrames)
      jpegs.zipWithIndex.flatMap { case (jpeg, i) =>
        scala.util.Try(Multimodal.imageAHash(jpeg)).toOption
          .filter(_ != 0L).map(hash => (i, hash))
      }
    }

  /** Per-clip frame-hash fingerprints: every `stride`-th frame (up to
    * `maxFrames`) of an MJPEG-AVI or Y4M clip decoded for real and
    * reduced to its aHash — (media_id, frame_idx, landmark) in
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
        scala.util.Try(frameHashes(m.payload, stride, maxFrames))
          .getOrElse(Vector.empty) // unparseable container: no prints
          .iterator
          .map { case (i, h) => (m.media_id, i, h) }
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

  /** CROSS-MODAL provenance: which videos contain a given still image
    * as a frame — a banded Hamming join between an image aHash table
    * ([[Multimodal.imageHashes]]: `(media_id, ahash)`) and a video
    * frame-print table ([[fingerprints]]: `(media_id, frame_idx,
    * landmark)`). Both hash families are the SAME 64-bit
    * block-average construction ([[Multimodal.blockAHash]]), so the
    * comparison is meaningful across modalities; thumbnails,
    * re-encodes and title cards land within a few bits.
    *
    * Scale shape: the pigeonhole band trick from
    * [[Multimodal.imageNearDupPairs]], as an EQUI join — any pair
    * within Hamming distance < `bands` shares at least one exact
    * band, so candidates come from a `(band, value)` join, never an
    * image×frame comparison; a degenerate band value (near-flat
    * frames that survived the zero-hash filter) is capped at
    * `maxBucket` frames on the video side. Exact `bit_count(xor)`
    * then keeps matches within `maxHamming`.
    *
    * Output: (image_id, video_id, frame_idx, hamming), distinct.
    */
  def imageFrameMatches(
      imageHashes: DataFrame,
      framePrints: DataFrame,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64 (and be >= 2), got $bands")
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands, got $maxHamming >= $bands")
    val width = 64 / bands
    def banded(hash: org.apache.spark.sql.Column) = explode(array(
      (0 until bands).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(hash, b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("v"))): _*))
    val imgB = imageHashes.select(col("media_id").as("image_id"),
      col("ahash").as("__ih"), banded(col("ahash")).as("bk"))
      .select(col("image_id"), col("__ih"),
        col("bk.band").as("band"), col("bk.v").as("v"))
    val frmB = framePrints.select(col("media_id").as("video_id"),
      col("frame_idx"), col("landmark").as("__fh"),
      banded(col("landmark")).as("bk"))
      .select(col("video_id"), col("frame_idx"), col("__fh"),
        col("bk.band").as("band"), col("bk.v").as("v"))
    val healthy = frmB.groupBy("band", "v")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select("band", "v")
    imgB
      .join(frmB.join(healthy, Seq("band", "v")), Seq("band", "v"))
      .select(col("image_id"), col("video_id"), col("frame_idx"),
        col("__ih"), col("__fh"))
      .distinct()
      .select(col("image_id"), col("video_id"), col("frame_idx"),
        bit_count(col("__ih").bitwiseXOR(col("__fh"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
