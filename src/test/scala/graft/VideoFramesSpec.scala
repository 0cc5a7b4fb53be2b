package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.{Multimodal, VideoFrames}
import graft.operators.Multimodal.{MediaMeta, MediaRecord}

class VideoFramesSpec extends SparkSpec {

  private def jpegFrame(invertRow: Int, phase: Int = 0): Array[Byte] = {
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val cellOn = (x / 4 + y / 4 + phase) % 2 == 0
      val inverted = y / 4 == invertRow
      img.setRGB(x, y, if (cellOn ^ inverted) 0xffffff else 0x000000)
    }
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  private def le32(n: Int): Array[Byte] =
    Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    ascii(id) ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  /** Minimal MJPEG AVI: RIFF('AVI ' JUNK LIST('movi' frames…)), with
    * the LAST frame wrapped in a nested LIST('rec ') to exercise
    * interleave groups.
    */
  private def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val (plain, grouped) = frames.splitAt(math.max(0, frames.length - 1))
    val moviBody = ascii("movi") ++
      plain.flatMap(f => chunk("00dc", f)).toArray ++
      grouped.flatMap(f =>
        chunk("LIST", ascii("rec ") ++ chunk("00dc", f))).toArray
    val payload = ascii("AVI ") ++
      chunk("JUNK", Array.fill(13)(0.toByte)) ++ // odd size: pad path
      chunk("LIST", moviBody)
    ascii("RIFF") ++ le32(payload.length) ++ payload
  }

  private def be32(n: Long): Array[Byte] =
    Array((n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte, n.toByte)

  private def box(tp: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ ascii(tp) ++ body

  /** Minimal QuickTime MOV: ftyp + mdat (all JPEG samples contiguous
    * in one chunk) + moov(trak/mdia/minf/stbl(stsd jpeg, stsz table,
    * stsc one-run, stco)). Offsets are file-absolute, as the spec
    * requires.
    */
  private def mov(frames: Seq[Array[Byte]], format: String = "jpeg"): Array[Byte] = {
    val ftyp = box("ftyp", ascii("qt  ") ++ be32(0) ++ ascii("qt  "))
    val mdat = box("mdat", frames.flatten.toArray)
    val mdatDataStart = ftyp.length + 8L
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      box(format, Array.fill(78)(0.toByte)))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames.length) ++
      frames.flatMap(f => be32(f.length)).toArray)
    val stsc = box("stsc", be32(0) ++ be32(1) ++
      be32(1) ++ be32(frames.length) ++ be32(1))
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(mdatDataStart))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
    val moov = box("moov",
      box("trak", box("mdia", box("minf", stbl))))
    ftyp ++ mdat ++ moov
  }

  private val framesA = (0 until 8).map(jpegFrame(_))

  test("the RIFF walk recovers every frame byte-for-byte") {
    val got = VideoFrames.aviMjpegFrames(avi(framesA))
    assert(got.length === 8)
    got.zip(framesA).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("non-AVI bytes fail loudly; fingerprints degrade to empty") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      VideoFrames.aviMjpegFrames("not a riff at all".getBytes)
    }
    val media = Seq(MediaRecord(1L, "junk-bytes-here!".getBytes,
      MediaMeta("video/avi", "t", 16L))).toDS()
    assert(VideoFrames.fingerprints(media).isEmpty)
  }

  test("frame hashes are real decodes: distinct frames, distinct hashes") {
    val prints = framesA.map(Multimodal.imageAHash)
    assert(prints.distinct.length === 8, "every frame must hash distinctly")
  }

  test("near-dup: a lead-trimmed copy matches at a consistent delta; a phase-flipped clip does not") {
    import spark.implicits._
    def rec(id: Long, bytes: Array[Byte]) =
      MediaRecord(id, bytes, MediaMeta("video/avi", "t", bytes.length.toLong))
    val media = Seq(
      rec(1L, avi(framesA)),
      rec(2L, avi(framesA.drop(2))), // first two frames trimmed
      rec(3L, avi((0 until 8).map(jpegFrame(_, phase = 1))))).toDS()
    val prints = VideoFrames.fingerprints(media)
    val pairs = VideoFrames.nearDupPairs(prints, minMatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)), s"got ${pairs.toSeq}")
    assert(pairs.head._3 === 6L, "six shared frames at delta 2")
  }

  test("stride and maxFrames bound the sampled fingerprint set") {
    import spark.implicits._
    val media = Seq(MediaRecord(1L, avi(framesA),
      MediaMeta("video/avi", "t", 1L))).toDS()
    assert(VideoFrames.fingerprints(media, stride = 2).count() === 4L)
    assert(VideoFrames.fingerprints(media, maxFrames = 3).count() === 3L)
    // sampling happens IN the walk: the budget stops the copy early
    assert(VideoFrames.aviMjpegFrames(avi(framesA), maxFrames = 2).length === 2)
  }

  test("a corrupt negative chunk size fails loudly instead of hanging the walk") {
    val bytes = avi(framesA)
    // the JUNK chunk's size field lives at offset 16 (RIFF hdr 12 + id 4)
    bytes(16) = 0xf8.toByte; bytes(17) = 0xff.toByte
    bytes(18) = 0xff.toByte; bytes(19) = 0xff.toByte
    val e = intercept[IllegalArgumentException] {
      VideoFrames.aviMjpegFrames(bytes)
    }
    assert(e.getMessage.contains("corrupt chunk size"))
  }

  test("a truncated final frame is skipped; intact frames keep matching") {
    import spark.implicits._
    val whole = avi(framesA)
    // leave only 10 bytes of the final frame's JPEG — not even a
    // complete marker segment, so the decoder genuinely fails (JPEG
    // readers tolerate shallow tail truncation by padding gray)
    val truncated = java.util.Arrays.copyOfRange(
      whole, 0, whole.length - framesA.last.length + 10)
    val media = Seq(
      MediaRecord(1L, avi(framesA), MediaMeta("video/avi", "t", 1L)),
      MediaRecord(2L, truncated, MediaMeta("video/avi", "t", 1L))).toDS()
    val prints = VideoFrames.fingerprints(media)
    assert(prints.filter("media_id = 2").count() === 7L,
      "7 intact frames must survive the torn 8th")
    val pairs = VideoFrames.nearDupPairs(prints, minMatches = 4).collect()
    assert(pairs.length === 1 && pairs(0).getLong(2) === 7L)
  }

  test("flat frames carry no evidence: fade-heavy unrelated clips do not match") {
    import spark.implicits._
    def flat(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, rgb)
      val baos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    assert(Multimodal.imageAHash(flat(0x000000)) === 0L)
    val blackLead = Seq.fill(5)(flat(0x000000))
    val clipX = avi(blackLead ++ framesA.take(2))
    val clipY = avi(blackLead ++ (0 until 2).map(jpegFrame(_, phase = 1)))
    val media = Seq(
      MediaRecord(1L, clipX, MediaMeta("video/avi", "t", 1L)),
      MediaRecord(2L, clipY, MediaMeta("video/avi", "t", 1L))).toDS()
    assert(VideoFrames.nearDupPairs(
      VideoFrames.fingerprints(media), minMatches = 4).isEmpty,
      "shared black lead-ins must not count as a match")
  }

  // --------------------------------------------------------------- Y4M

  /** 16×16 C420 luma pattern `p`: same checkerboard family as
    * [[jpegFrame]] but written directly into a Y plane.
    */
  private def lumaPlane(invertRow: Int, phase: Int = 0): Array[Byte] = {
    val y = new Array[Byte](16 * 16)
    for (r <- 0 until 16; c <- 0 until 16) {
      val cellOn = (c / 2 + r / 2 + phase) % 2 == 0
      val inverted = r / 2 == invertRow
      y(r * 16 + c) = if (cellOn ^ inverted) 0xff.toByte else 0x00.toByte
    }
    y
  }

  private def y4m(lumas: Seq[Array[Byte]], cs: String = "420jpeg",
      frameParams: String = ""): Array[Byte] = {
    val chroma = new Array[Byte](2 * 8 * 8) // C420 at 16x16
    val chromaLen = cs match {
      case c if c.startsWith("mono") => 0
      case c if c.startsWith("444") => 2 * 16 * 16
      case _ => chroma.length
    }
    ascii(s"YUV4MPEG2 W16 H16 F30:1 Ip A1:1 C$cs\n") ++
      lumas.flatMap(y =>
        ascii(s"FRAME$frameParams\n") ++ y ++ new Array[Byte](chromaLen)).toArray
  }

  private val lumasA = (0 until 8).map(lumaPlane(_))

  test("y4m: the walk recovers every luma plane byte-for-byte") {
    val got = VideoFrames.y4mFrames(y4m(lumasA))
    assert(got.length === 8)
    got.zip(lumasA).foreach { case ((w, h, y), b) =>
      assert(w === 16 && h === 16)
      assert(y.sameElements(b))
    }
    // colorspace variants change only the skip distance, never the luma
    for (cs <- Seq("mono", "444", "420mpeg2")) {
      val v = VideoFrames.y4mFrames(y4m(lumasA, cs = cs))
      assert(v.length === 8, cs)
      v.zip(lumasA).foreach { case ((_, _, y), b) => assert(y.sameElements(b)) }
    }
    // FRAME lines may carry parameters; the payload starts after '\n'
    val p = VideoFrames.y4mFrames(y4m(lumasA, frameParams = " Xparam"))
    assert(p.length === 8)
    p.zip(lumasA).foreach { case ((_, _, y), b) => assert(y.sameElements(b)) }
  }

  test("y4m: non-y4m bytes, bad colorspace, missing dims fail loudly") {
    intercept[IllegalArgumentException] {
      VideoFrames.y4mFrames("MPEG4 something".getBytes)
    }
    intercept[IllegalArgumentException] {
      VideoFrames.y4mFrames(ascii("YUV4MPEG2 W16 H16 C999\nFRAME\n"))
    }
    intercept[IllegalArgumentException] {
      VideoFrames.y4mFrames(ascii("YUV4MPEG2 F30:1\nFRAME\n"))
    }
  }

  test("y4m: truncated final frame dropped; stride and maxFrames bound the walk") {
    val whole = y4m(lumasA)
    val truncated = java.util.Arrays.copyOfRange(whole, 0, whole.length - 50)
    assert(VideoFrames.y4mFrames(truncated).length === 7)
    assert(VideoFrames.y4mFrames(whole, stride = 2).length === 4)
    assert(VideoFrames.y4mFrames(whole, maxFrames = 3).length === 3)
  }

  test("y4m: a cut inside a marker or its line is end-of-stream, not corruption") {
    val one = y4m(lumasA.take(1))
    // payload ends 3 bytes into the next frame's marker ("FRA")
    val midMarker = one ++ ascii("FRA")
    assert(VideoFrames.y4mFrames(midMarker).length === 1,
      "the intact frame must survive a mid-marker cut")
    // payload ends inside the FRAME parameter line (no newline yet)
    val midLine = one ++ ascii("FRAME Xinterrupted")
    assert(VideoFrames.y4mFrames(midLine).length === 1,
      "the intact frame must survive a mid-parameter-line cut")
    // present-but-wrong marker bytes are still loud corruption
    intercept[IllegalArgumentException] {
      VideoFrames.y4mFrames(one ++ ascii("JUNK!\n") ++ new Array[Byte](400))
    }
  }

  test("y4m fingerprints match a lead-trimmed copy cross-container-style") {
    import spark.implicits._
    def rec(id: Long, bytes: Array[Byte]) =
      MediaRecord(id, bytes, MediaMeta("video/x-y4m", "t", bytes.length.toLong))
    val media = Seq(
      rec(1L, y4m(lumasA)),
      rec(2L, y4m(lumasA.drop(2))), // first two frames trimmed
      rec(3L, y4m((0 until 8).map(lumaPlane(_, phase = 1))))).toDS()
    val prints = VideoFrames.fingerprints(media)
    assert(prints.filter("media_id = 1").count() === 8L)
    val pairs = VideoFrames.nearDupPairs(prints, minMatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)), s"got ${pairs.toSeq}")
    assert(pairs.head._3 === 6L, "six shared frames at delta 2")
  }

  test("y4m: a flat luma frame hashes to zero evidence, like a flat jpeg") {
    assert(VideoFrames.lumaAHash(16, 16, new Array[Byte](256)) === 0L)
  }

  // --------------------------------------------------- MOV (ISO-BMFF)

  test("the MOV sample-table walk recovers every frame byte-for-byte") {
    val got = VideoFrames.movMjpegFrames(mov(framesA))
    assert(got.length === 8)
    got.zip(framesA).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("MOV stride and maxFrames bound the walk") {
    val got = VideoFrames.movMjpegFrames(mov(framesA), stride = 2, maxFrames = 3)
    assert(got.length === 3)
    got.zip(Seq(0, 2, 4)).foreach { case (f, i) =>
      assert(f.sameElements(framesA(i)))
    }
  }

  test("a MOV without an MJPEG track, or with corrupt offsets, fails loudly") {
    intercept[IllegalArgumentException] {
      VideoFrames.movMjpegFrames(mov(framesA, format = "avc1"))
    }
    // point stco past the payload end: out-of-range sample must throw
    val m = mov(framesA)
    val stcoIdx = {
      var i = m.length - 8
      while (!(m(i + 4) == 's' && m(i + 5) == 't' && m(i + 6) == 'c' && m(i + 7) == 'o')) i -= 1
      i
    }
    val off = stcoIdx + 8 + 8 // body + ver/flags + count
    val bad = m.clone()
    bad(off) = 0x7f.toByte // absurd offset high byte
    intercept[IllegalArgumentException] {
      VideoFrames.movMjpegFrames(bad)
    }
  }

  test("the same clip in AVI and MOV near-dup matches cross-container") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, avi(framesA), MediaMeta("video/avi", "t", 1L)),
      MediaRecord(2L, mov(framesA), MediaMeta("video/quicktime", "t", 1L))).toDS()
    val prints = VideoFrames.fingerprints(media)
    assert(prints.filter("media_id = 2").count() === 8L)
    val pairs = VideoFrames.nearDupPairs(prints, minMatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 8L)),
      s"identical frames must match on all 8, got ${pairs.toSeq}")
  }

  // ------------------------------------------------- cross-modal match

  test("an image is found inside the video that contains it as a frame") {
    import spark.implicits._
    // image 100 = frame 2 of the clip BYTE-FOR-BYTE (same JPEG, same
    // hash); image 101 is the phase-flipped pattern — no frame match
    val images = Seq(
      Multimodal.MediaRecord(100L, framesA(2), MediaMeta("image/jpeg", "t", 1L)),
      Multimodal.MediaRecord(101L, jpegFrame(2, phase = 1),
        MediaMeta("image/jpeg", "t", 1L))).toDS()
    val videos = Seq(
      MediaRecord(1L, avi(framesA), MediaMeta("video/avi", "t", 1L))).toDS()
    val got = VideoFrames.imageFrameMatches(
      Multimodal.imageHashes(images), VideoFrames.fingerprints(videos))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === Seq((100L, 1L, 2, 0)),
      s"expected exactly the planted frame match, got ${got.toSeq}")
  }

  test("cross-modal match tolerates small hash drift via banding") {
    import spark.implicits._
    // flip one low bit of the image hash by hand: still within
    // maxHamming = 3 and still sharing 3 of 4 bands
    val h = Multimodal.imageAHash(framesA(5))
    val images = Seq((100L, h ^ 1L)).toDF("media_id", "ahash")
    val videos = Seq(
      MediaRecord(1L, avi(framesA), MediaMeta("video/avi", "t", 1L))).toDS()
    val got = VideoFrames.imageFrameMatches(
      images, VideoFrames.fingerprints(videos))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === Seq((100L, 1L, 5, 1)))
  }
}
