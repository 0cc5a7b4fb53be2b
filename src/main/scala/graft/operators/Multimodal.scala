package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside. The
  * Spark-side machinery — schema, partitioning, batch shape, per-
  * partition decode — is real and tested. The IMAGE codec path is real
  * (JDK ImageIO: PNG/BMP/GIF/JPEG header decode + resize, see
  * [[imageDecode]] / [[resizeImages]]) and so is the AUDIO path (JDK
  * `javax.sound.sampled`: WAV/AIFF/AU header + PCM RMS, see
  * [[audioDecode]]); only video remains a pluggable stub because
  * container codecs are not available in this build environment (see
  * [[stubDecode]] / [[fakeDecode]]).
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

  /** Video decoder seam: payload bytes → (width, height, frames).
    * STUB — video container/codec libraries (ffmpeg et al.) are not
    * present in this environment; plug a real implementation here in
    * deployment. Image and audio payloads do NOT go through this
    * seam — [[imageDecode]] and [[audioDecode]] are real JDK codecs.
    *
    * SCOPE (final): three containers decode for real without this
    * seam — MJPEG-in-AVI, raw Y4M, and MJPEG-in-MOV
    * ([[graft.operators.VideoFrames]]). General compressed codecs
    * (H.264/H.265/VP9/AV1) stay behind this stub PERMANENTLY in the
    * JVM-pure build: entropy-coded bitstream decoding without native
    * libraries is out of scope by design, and the stub failing loudly
    * is the contract (never a silent wrong frame).
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int) =
    // r17: the seam is OPERATIONAL, not just documented — when a
    // deployment carries ffmpeg/ffprobe (PATH or config), general
    // codecs decode through [[FfmpegShim]]; without them this stays
    // the loud contract (the shim's refusal names the knobs), and
    // fakeDecode remains the deterministic test double
    if (FfmpegShim.available) FfmpegShim.probe(payload)
    else throw new UnsupportedOperationException(
      "video codec not available in this build (and no ffmpeg/ffprobe " +
        "shim found — see FfmpegShim for the PATH/config knobs); use " +
        "fakeDecode for tests")

  /** Real image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG readers
    * ship with the JVM — no external dependency). Reads ONLY the header
    * (`ImageReader.getWidth/getHeight` on the stream), never the pixel
    * data, so the per-row cost is parsing a few hundred bytes no matter
    * the image size. Images are single-frame.
    *
    * Throws IllegalArgumentException for payloads no JDK reader claims
    * (video containers, corrupt bytes) — route those to the
    * [[stubDecode]] seam via [[mediaDecode]].
    */
  def imageDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException("no JDK image reader for payload")
      val r = readers.next()
      try {
        r.setInput(iis)
        (r.getWidth(0), r.getHeight(0), 1)
      } finally r.dispose()
    } finally iis.close()
  }

  /** Mime-routing decoder: real JDK ImageIO for image mimes, the stub
    * codec seam for everything else (video/audio).
    */
  def mediaDecode(mime: String): Array[Byte] => (Int, Int, Int) =
    if (mime != null && mime.startsWith("image/")) imageDecode _ else stubDecode _

  /** Real image resize (JDK only): decode, scale the longest side down
    * to `maxDim` preserving aspect ratio, re-encode as PNG. Payloads
    * already within bounds pass through untouched (no re-encode). Runs
    * per-row inside executor tasks — see [[resizeImages]] for the
    * partition-shaped wrapper.
    */
  def resizeImage(payload: Array[Byte], maxDim: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
    if (scale >= 1.0) payload
    else {
      val w = math.max(1, math.round(img.getWidth * scale).toInt)
      val h = math.max(1, math.round(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  /** Partition-shaped image resize: image-mime rows are re-encoded with
    * the longest side capped at `maxDim` (and their byte_len refreshed);
    * non-image rows pass through unchanged.
    */
  def resizeImages(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val isImage = r.meta != null && r.meta.mime != null &&
          r.meta.mime.startsWith("image/") && r.payload != null
        if (isImage) {
          val p = resizeImage(r.payload, maxDim)
          // re-encoded output is PNG; an already-small payload passes
          // through byte-identical and keeps its original mime
          val mime = if (p eq r.payload) r.meta.mime else "image/png"
          MediaRecord(r.media_id, p, MediaMeta(mime, r.meta.source, p.length.toLong))
        } else r
      }
    }

  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_frames: Long,
      duration_sec: Double,
      rms: Double)

  implicit val audioEncoder: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * parsers ship with the JVM — no external dependency, same move as
    * [[imageDecode]]). Parses the container header for format/frame
    * count and streams the PCM payload once for RMS energy (16-bit
    * signed, both endiannesses — the overwhelmingly common PCM shape;
    * other sample widths report RMS = NaN rather than a wrong number).
    *
    * Throws for payloads the JDK cannot parse (compressed codecs,
    * corrupt bytes) — route those to the [[stubDecode]] seam.
    */
  def audioDecode(mediaId: Long, payload: Array[Byte]): AudioFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      val duration =
        if (fmt.getSampleRate > 0 && frames >= 0) frames / fmt.getSampleRate.toDouble
        else Double.NaN
      val rms =
        if (fmt.getSampleSizeInBits == 16 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
          val big = fmt.isBigEndian
          val buf = new Array[Byte](8192)
          var sumSq = 0.0
          var n = 0L
          var read = ais.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              val s =
                if (big) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
              sumSq += s.toDouble * s.toDouble
              n += 1
              i += 2
            }
            read = ais.read(buf)
          }
          if (n > 0) math.sqrt(sumSq / n) / 32768.0 else 0.0
        } else Double.NaN
      AudioFeatures(mediaId, fmt.getSampleRate.toInt, fmt.getChannels,
        fmt.getSampleSizeInBits, frames, duration, rms)
    } finally ais.close()
  }

  /** Partition-shaped audio feature extraction for audio-mime rows
    * (same mapPartitions batch shape as [[decodeFeatures]]). Non-audio
    * rows are filtered out, not errored.
    */
  def audioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] =
    media
      .filter(r => r.meta != null && r.meta.mime != null &&
        r.meta.mime.startsWith("audio/") && r.payload != null)
      .mapPartitions(_.map(r => audioDecode(r.media_id, r.payload)))

  final case class VideoMeta(
      media_id: Long, width: Int, height: Int, duration_sec: Double)

  implicit val videoMetaEncoder: Encoder[VideoMeta] = Encoders.product[VideoMeta]

  /** Real MP4/MOV CONTAINER metadata (dimensions + duration) by
    * walking the ISO-BMFF box structure — pure byte parsing, no codec:
    * `moov/mvhd` carries timescale + duration, `moov/trak/tkhd` the
    * track's 16.16 fixed-point width/height (the first track with a
    * non-zero size wins — that is the video track). FRAME decode still
    * requires a codec and stays behind [[stubDecode]]; header metadata
    * is what pipeline filters (resolution/duration gates) actually
    * need per row.
    *
    * Throws IllegalArgumentException for payloads without a moov box.
    */
  /** ISO-BMFF (MP4/MOV) box-walk primitives, shared by [[mp4Meta]]
    * and [[VideoFrames.movMjpegFrames]].
    */
  private[operators] object Bmff {
    def be32(p: Array[Byte], o: Int): Long =
      ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
        ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    def be64(p: Array[Byte], o: Int): Long = (be32(p, o) << 32) | be32(p, o + 4)
    def boxType(p: Array[Byte], o: Int): String =
      new String(p, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** One box level within [from, until) as (type, bodyStart,
      * bodyEnd). size==1 → 64-bit extended size in the next 8 bytes;
      * size==0 → box extends to the end of the enclosing box
      * (last-box shorthand). Malformed sizes end the walk (the intact
      * prefix is returned) rather than stalling the cursor.
      */
    def children(p: Array[Byte], from: Int, until: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var o = from
      while (o + 8 <= until) {
        val size32 = be32(p, o)
        val (size, hdr) =
          if (size32 == 1) {
            if (o + 16 > until) return out.result()
            (be64(p, o + 8), 16)
          } else if (size32 == 0) ((until - o).toLong, 8)
          else (size32, 8)
        if (size < hdr || size > until - o) return out.result()
        out += ((boxType(p, o), o + hdr, o + size.toInt))
        o += size.toInt
      }
      out.result()
    }
  }

  def mp4Meta(mediaId: Long, payload: Array[Byte]): VideoMeta = {
    def be32(o: Int): Long = Bmff.be32(payload, o)
    def be64(o: Int): Long = Bmff.be64(payload, o)
    def children(from: Int, until: Int): Seq[(String, Int, Int)] =
      Bmff.children(payload, from, until)

    val moov = children(0, payload.length).collectFirst {
      case ("moov", s, e) => (s, e)
    }.getOrElse(throw new IllegalArgumentException("no moov box: not MP4/MOV"))

    val boxes = children(moov._1, moov._2)
    val (timescale, duration) = boxes.collectFirst { case ("mvhd", s, _) =>
      // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
      // v1: ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8)
      // (v1 is standard for post-2040 dates / long durations — reading
      // it with v0 offsets yields silent garbage, so branch on version)
      if ((payload(s) & 0xff) == 1) (be32(s + 20), be64(s + 24))
      else (be32(s + 12), be32(s + 16))
    }.getOrElse((0L, 0L))
    val dims = boxes.collect { case ("trak", s, e) =>
      children(s, e).collectFirst { case ("tkhd", ts, _) =>
        // v0: ver/flags(4) ctime(4) mtime(4) trackid(4) res(4) dur(4)
        // res(8) layer(2) alt(2) vol(2) res(2) matrix(36) w(4) h(4)
        // v1 widens ctime/mtime/dur to 8 bytes → +12 on every later
        // field offset
        val off = if ((payload(ts) & 0xff) == 1) 12 else 0
        val w = (be32(ts + 76 + off) >> 16).toInt
        val h = (be32(ts + 80 + off) >> 16).toInt
        (w, h)
      }
    }.flatten.find { case (w, h) => w > 0 && h > 0 }

    val (w, h) = dims.getOrElse((0, 0))
    val dur = if (timescale > 0) duration.toDouble / timescale else Double.NaN
    VideoMeta(mediaId, w, h, dur)
  }

  /** Partition-shaped video metadata extraction for video-mime rows
    * (mirror of [[audioFeatures]]).
    */
  def videoMeta(media: Dataset[MediaRecord]): Dataset[VideoMeta] =
    media
      .filter(r => r.meta != null && r.meta.mime != null &&
        r.meta.mime.startsWith("video/") && r.payload != null)
      .mapPartitions(_.map(r => mp4Meta(r.media_id, r.payload)))

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

  // ------------------------------------------------------- perceptual hash

  /** 64-bit average-hash (aHash) of an image payload: REAL JDK decode,
    * 8×8 integer block-average grayscale, threshold on the global
    * mean. Bit (8·row + col) is set iff that cell's mean gray exceeds
    * the image mean — the classic perceptual fingerprint: robust to
    * re-encode/resize/small edits, and every step is integer
    * arithmetic over decoded pixels (no Graphics2D rescale, whose
    * filtering is JVM-implementation-dependent), so the hash is
    * deterministic across JVMs and re-runs. Requires both dimensions
    * ≥ 8; undecodable payloads fail loudly.
    */
  def imageAHash(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    blockAHash(img.getWidth, img.getHeight, (x, y) => {
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000
    })
  }

  /** The aHash core over ANY gray-pixel accessor — shared by
    * [[imageAHash]] (decoded RGB → luma) and
    * [[VideoFrames.lumaAHash]] (a raw Y plane IS luma), so hashes
    * from both pixel sources use the identical 8×8 block-average +
    * global-mean-threshold construction.
    */
  private[operators] def blockAHash(
      w: Int, h: Int, gray: (Int, Int) => Int): Long = {
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8 pixels, got ${w}x$h")
    val cells = new Array[Long](64)
    var r = 0
    while (r < 8) {
      val y0 = r * h / 8; val y1 = (r + 1) * h / 8
      var c = 0
      while (c < 8) {
        val x0 = c * w / 8; val x1 = (c + 1) * w / 8
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            sum += gray(x, y)
            x += 1
          }
          y += 1
        }
        cells(r * 8 + c) = sum / ((y1 - y0).toLong * (x1 - x0))
        c += 1
      }
      r += 1
    }
    val mean = cells.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Per-image aHash table (media_id, ahash) — the mapPartitions codec
    * seam (same exception class as [[decodeFeatures]]: a pixel decoder
    * cannot live in an Expression), scattered first so byte-size
    * clustering never straggles the decode stage.
    */
  def imageHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => (m.media_id, imageAHash(m.payload))))
      .toDF("media_id", "ahash")
  }

  /** Near-duplicate image pairs from an aHash table: split the 64-bit
    * hash into `bands` equal bit-bands and bucket-join — by pigeonhole
    * any pair within Hamming distance < bands shares at least one
    * band, so candidate generation never compares all pairs (same
    * maxBucket degeneracy bound as [[Dedup.minHashCandidates]]; a
    * corpus of identical monochrome thumbnails caps instead of
    * exploding). Exact `bit_count(xor)` then keeps pairs within
    * `maxHamming`. Output: (id_a, id_b, hamming), id_a < id_b.
    */
  def imageNearDupPairs(
      hashes: DataFrame,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    require(bands >= 2 && 64 % bands == 0, s"bands must divide 64 (and be >= 2), got $bands")
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands, got $maxHamming >= $bands")
    // materialized once: the bucket build and both hash-lookup joins
    // read this — without it a hashes plan fed straight from
    // [[imageHashes]] re-runs the ImageIO decode three times (the
    // joins key on different columns, so no exchange is reusable).
    // Two longs per image: same cost class as the output itself.
    val hashTable = hashes.localCheckpoint(true)
    val width = 64 / bands
    // mask, not %: a long remainder depends on the sign bit, so two
    // hashes sharing a band's bits could land in different buckets
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("ahash"), b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("v")).as(s"b$b"))
    val buckets = hashTable
      .select(col("media_id").as("id"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.v").as("v"))
    val grouped = buckets
      .groupBy("band", "v")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    grouped
      .select(graft.operators.Dedup.orderedPairs(col("ids")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
      .join(hashTable.select(col("media_id").as("id_a"), col("ahash").as("__ha")), "id_a")
      .join(hashTable.select(col("media_id").as("id_b"), col("ahash").as("__hb")), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
