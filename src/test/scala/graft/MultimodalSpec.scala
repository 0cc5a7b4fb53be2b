package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("fromText wraps documents into the canonical media schema") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.fromText(docs, "doc_id", "text", "docs-fixture")
    assert(media.schema == Multimodal.mediaSchema ||
      media.schema.fieldNames.toSeq == Multimodal.mediaSchema.fieldNames.toSeq)
    val r = media.filter($"media_id" === 0).head()
    val meta = r.getStruct(2)
    assert(meta.getString(0) == "text/plain")
    assert(meta.getLong(2) > 0)
  }

  test("decodeFeatures runs the pluggable decoder per partition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val media = Multimodal.fromText(docs, "doc_id", "text", "t")
      .as[Multimodal.MediaRecord](Multimodal.mediaEncoder)
    val feats = Multimodal.decodeFeatures(media, Multimodal.fakeDecode)
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(f => f.width >= 16 && f.height >= 16 && f.n_frames >= 1))
    assert(rows.forall(_.checksum.length == 64))
    // deterministic: same payload -> same features
    val again = Multimodal.decodeFeatures(media, Multimodal.fakeDecode).collect()
    assert(rows.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  private def encodeImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // deterministic pixel gradient so re-encoded bytes are stable
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, baos), s"no $format writer")
    baos.toByteArray
  }

  test("imageDecode round-trips real PNG and BMP payloads") {
    val media = Seq(
      Multimodal.MediaRecord(1L, encodeImage(123, 45, "png"),
        Multimodal.MediaMeta("image/png", "t", 0L)),
      Multimodal.MediaRecord(2L, encodeImage(7, 9, "bmp"),
        Multimodal.MediaMeta("image/bmp", "t", 0L)))
      .toDS()
    val feats = Multimodal.decodeFeatures(media, Multimodal.imageDecode)
      .collect().sortBy(_.media_id)
    assert(feats.map(f => (f.media_id, f.width, f.height, f.n_frames)).toSeq ==
      Seq((1L, 123, 45, 1), (2L, 7, 9, 1)))
  }

  test("mediaDecode routes images to the real codec and video to the stub") {
    val png = encodeImage(20, 10, "png")
    assert(Multimodal.mediaDecode("image/png")(png) == ((20, 10, 1)))
    intercept[UnsupportedOperationException] {
      Multimodal.mediaDecode("video/mp4")(Array[Byte](1, 2, 3))
    }
    intercept[IllegalArgumentException] {
      Multimodal.mediaDecode("image/png")(Array[Byte](1, 2, 3))
    }
  }

  test("resizeImages caps the longest side and passes small images through") {
    val media = Seq(
      Multimodal.MediaRecord(1L, encodeImage(200, 100, "png"),
        Multimodal.MediaMeta("image/png", "t", 0L)),
      Multimodal.MediaRecord(2L, encodeImage(30, 20, "bmp"),
        Multimodal.MediaMeta("image/bmp", "t", 0L)),
      Multimodal.MediaRecord(3L, Array[Byte](9, 9, 9),
        Multimodal.MediaMeta("video/mp4", "t", 3L)))
      .toDS()
    val out = Multimodal.resizeImages(media, maxDim = 50).collect().sortBy(_.media_id)
    val dims = out.filter(_.meta.mime.startsWith("image/"))
      .map(r => r.media_id -> Multimodal.imageDecode(r.payload)).toMap
    assert(dims(1L) == ((50, 25, 1)), s"got ${dims(1L)}")
    assert(dims(2L) == ((30, 20, 1)), "small image should pass through")
    assert(out.find(_.media_id == 2L).get.meta.mime == "image/bmp",
      "untouched payload must keep its mime")
    assert(out.find(_.media_id == 3L).get.payload.toSeq == Seq[Byte](9, 9, 9),
      "non-image rows must pass through")
  }

  /** 16-bit PCM WAV of a sine wave, built with the same JDK audio
    * stack the decoder uses — a genuine container round-trip.
    */
  private def sineWav(rate: Int, seconds: Double, amplitude: Double): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440.0 * i / rate) * amplitude * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioDecode round-trips a real WAV payload with correct RMS") {
    val wav = sineWav(8000, 0.5, 0.5)
    val f = Multimodal.audioDecode(7L, wav)
    assert(f.sample_rate == 8000 && f.channels == 1 && f.bits == 16)
    assert(f.n_frames == 4000)
    assert(math.abs(f.duration_sec - 0.5) < 1e-6)
    // a sine of amplitude a has RMS a/sqrt(2)
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms was ${f.rms}")
  }

  test("audioFeatures extracts only audio rows, per partition") {
    val wav = sineWav(8000, 0.25, 0.3)
    val media = Seq(
      Multimodal.MediaRecord(1L, wav,
        Multimodal.MediaMeta("audio/wav", "t", wav.length.toLong)),
      Multimodal.MediaRecord(2L, Array[Byte](1, 2, 3),
        Multimodal.MediaMeta("video/mp4", "t", 3L))).toDS()
    val out = Multimodal.audioFeatures(media).collect()
    assert(out.length == 1 && out.head.media_id == 1L)
    assert(out.head.n_frames == 2000)
  }

  /** Minimal valid ISO-BMFF structure: ftyp + moov(mvhd + trak(tkhd)). */
  private def miniMp4(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale.toLong) ++ be32(duration.toLong) ++
        Array.fill[Byte](80)(0))
    val tkhd = box("tkhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(duration.toLong) ++
        Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val ftyp = box("ftyp", "isom0000".getBytes("US-ASCII"))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  test("mp4Meta reads dimensions and duration from the container header") {
    val m = Multimodal.mp4Meta(5L, miniMp4(1920, 1080, 600, 9000))
    assert(m.width == 1920 && m.height == 1080)
    assert(math.abs(m.duration_sec - 15.0) < 1e-9)
    intercept[IllegalArgumentException] {
      Multimodal.mp4Meta(6L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    }
  }

  /** Version-1 variant (64-bit create/modify times + durations —
    * standard for long-duration or post-2040 files) with the moov box
    * carried under a size==1 extended (64-bit) box header.
    */
  private def miniMp4V1(w: Int, h: Int, timescale: Int, duration: Long): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    def box64(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(1L) ++ tpe.getBytes("US-ASCII") ++ be64(payload.length + 16L) ++ payload
    val verFlags = be32(0x01000000L) // version=1, flags=0
    val mvhd = box("mvhd",
      verFlags ++ be64(0) ++ be64(0) ++ be32(timescale.toLong) ++ be64(duration) ++
        Array.fill[Byte](80)(0))
    val tkhd = box("tkhd",
      verFlags ++ be64(0) ++ be64(0) ++ be32(1) ++ be32(0) ++ be64(duration) ++
        Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val ftyp = box("ftyp", "isom0000".getBytes("US-ASCII"))
    ftyp ++ box64("moov", mvhd ++ box("trak", tkhd))
  }

  test("mp4Meta handles version-1 boxes and 64-bit extended sizes") {
    // v0 offsets applied to this payload would read garbage silently
    val m = Multimodal.mp4Meta(7L, miniMp4V1(3840, 2160, 90000, 13500000L))
    assert(m.width == 3840 && m.height == 2160)
    assert(math.abs(m.duration_sec - 150.0) < 1e-9)
  }

  test("videoMeta extracts only video rows, per partition") {
    val mp4 = miniMp4(640, 480, 1000, 2500)
    val media = Seq(
      Multimodal.MediaRecord(1L, mp4,
        Multimodal.MediaMeta("video/mp4", "t", mp4.length.toLong)),
      Multimodal.MediaRecord(2L, Array[Byte](9, 9),
        Multimodal.MediaMeta("text/plain", "t", 2L))).toDS()
    val out = Multimodal.videoMeta(media).collect()
    assert(out.toSeq == Seq(Multimodal.VideoMeta(1L, 640, 480, 2.5)))
  }

  test("stubDecode is a clearly-marked unsupported seam") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(1)
    val media = Multimodal.fromText(docs, "doc_id", "text", "t")
      .as[Multimodal.MediaRecord](Multimodal.mediaEncoder)
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(media).collect()
    }
    assert(ex.getMessage != null)
  }

  test("sampleFrameIndexes picks strided frames up to the cap") {
    val df = Seq(100, 1, 5).toDF("n")
    val got = df.select(Multimodal.sampleFrameIndexes($"n", stride = 10, maxFrames = 4))
      .as[Seq[Long]].collect().toSeq
    assert(got == Seq(Seq(0L, 10L, 20L, 30L), Seq(0L), Seq(0L)))
  }
}
