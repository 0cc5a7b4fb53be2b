package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRecord}

class ImageHashSpec extends SparkSpec {

  /** Deterministic 32×32 RGB test image: pixel (x,y) from a supplied
    * function, PNG-encoded through the real JDK writer.
    */
  private def png(f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, f(x, y))
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  // strong light/dark checker on an 8x8 grid — every aHash cell is
  // uniform, so the hash is exactly the checker pattern
  private val checker = png((x, y) =>
    if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0x000000)
  // same checker with a few pixels flipped — a near-duplicate
  private val checkerDented = png((x, y) =>
    if (x < 2 && y < 2) 0x808080
    else if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0x000000)
  // opposite phase — maximally different cells
  private val antiChecker = png((x, y) =>
    if ((x / 4 + y / 4) % 2 == 1) 0xffffff else 0x000000)

  test("aHash is deterministic and matches the drawn cell pattern") {
    val h1 = Multimodal.imageAHash(checker)
    assert(h1 === Multimodal.imageAHash(checker))
    // cell (r,c) bright iff (r+c) even -> bit (8r+c) set
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if ((r + c) % 2 == 0) want |= 1L << (r * 8 + c)
    assert(h1 === want)
  }

  test("small edits stay within a few bits; opposite images are far") {
    val base = Multimodal.imageAHash(checker)
    val dent = Multimodal.imageAHash(checkerDented)
    val anti = Multimodal.imageAHash(antiChecker)
    assert(java.lang.Long.bitCount(base ^ dent) <= 3)
    assert(java.lang.Long.bitCount(base ^ anti) >= 32)
  }

  test("undecodable and too-small payloads fail loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.imageAHash(Array[Byte](1, 2, 3))
    }
    val tiny = {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      val baos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val e = intercept[IllegalArgumentException] {
      Multimodal.imageAHash(tiny)
    }
    assert(e.getMessage.contains("8x8"))
  }

  test("near-dup pairs: banded buckets find the dent, not the anti") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, checker, MediaMeta("image/png", "t", checker.length.toLong)),
      MediaRecord(2L, checkerDented, MediaMeta("image/png", "t", checkerDented.length.toLong)),
      MediaRecord(3L, antiChecker, MediaMeta("image/png", "t", antiChecker.length.toLong))
    ).toDS()
    val hashes = Multimodal.imageHashes(media)
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 === java.lang.Long.bitCount(
      Multimodal.imageAHash(checker) ^ Multimodal.imageAHash(checkerDented)))
  }

  test("hamming filter is exact: distance just past the bound is dropped") {
    import spark.implicits._
    // synthetic hash table, no decode: 0 vs 4 bits apart, bands = 4
    val hashes = Seq((1L, 0L), (2L, 0x0F0L)).toDF("media_id", "ahash")
    assert(Multimodal.imageNearDupPairs(hashes, maxHamming = 3).isEmpty)
    // 3 bits apart passes
    val close = Seq((1L, 0L), (2L, 0x070L)).toDF("media_id", "ahash")
    val got = Multimodal.imageNearDupPairs(close, maxHamming = 3).collect()
    assert(got.length === 1 && got(0).getInt(2) === 3)
  }

  test("negative hashes (bit 63 set) bucket by bits, not by remainder") {
    import spark.implicits._
    // identical low bands, one hash negative: must still pair up
    val hashes = Seq(
      (1L, 0x8000000000000001L), (2L, 0x0000000000000001L))
      .toDF("media_id", "ahash")
    val got = Multimodal.imageNearDupPairs(hashes, maxHamming = 1).collect()
    assert(got.length === 1 && got(0).getInt(2) === 1)
  }
}
