package graft

import graft.operators.{FfmpegShim, Multimodal}

/** The general-codec shim: the container has no real ffmpeg, so the
  * PLUMBING is gated with fake binaries (shell scripts emitting
  * deterministic ffprobe/ffmpeg output) and the capability probe's
  * refusal path is gated for real — the boundary is operational, not
  * just documented.
  */
class FfmpegShimSpec extends SparkSpec {

  private def script(body: String): String = {
    val f = java.io.File.createTempFile("graft_fake_", ".sh")
    java.nio.file.Files.write(f.toPath,
      s"#!/bin/sh\n$body\n".getBytes("UTF-8"))
    f.setExecutable(true)
    f.getAbsolutePath
  }

  private def png1x1(shade: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, shade)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def withBins[T](ffprobe: String, ffmpeg: String)(body: => T): T = {
    sys.props("graft.ffprobe.bin") = ffprobe
    sys.props("graft.ffmpeg.bin") = ffmpeg
    try body finally {
      sys.props -= "graft.ffprobe.bin"
      sys.props -= "graft.ffmpeg.bin"
    }
  }

  test("absent binaries: capability probe false, refusal names the knobs") {
    withBins("/nonexistent/ffprobe", "/nonexistent/ffmpeg") {
      assert(!FfmpegShim.available)
      val e = intercept[UnsupportedOperationException] {
        FfmpegShim.probe(Array[Byte](1, 2, 3))
      }
      assert(e.getMessage.contains("graft.ffprobe.bin"))
      // and Multimodal's stub stays the loud contract
      val e2 = intercept[UnsupportedOperationException] {
        Multimodal.stubDecode(Array[Byte](1, 2, 3))
      }
      assert(e2.getMessage.contains("shim"))
    }
  }

  test("fake binaries: probe parses, frames split, stub routes through") {
    // fake ffprobe: ignores args, prints a header line; version probe
    // must also succeed (any args -> exit 0)
    val fakeProbe = script("""echo "640,480,42"""")
    // fake ffmpeg: -version probes answer; frame extraction emits two
    // concatenated PNGs to stdout
    val pngs = new java.io.File(
      java.io.File.createTempFile("graft_pngs_", ".bin").getAbsolutePath)
    val two = png1x1(0xffffff) ++ png1x1(0x000000)
    java.nio.file.Files.write(pngs.toPath, two)
    val fakeMpeg = script(s"""cat "${pngs.getAbsolutePath}"""")
    withBins(fakeProbe, fakeMpeg) {
      assert(FfmpegShim.available)
      assert(FfmpegShim.probe("anything".getBytes) === ((640, 480, 42)))
      // stubDecode upgrades to the shim when the capability is there
      assert(Multimodal.stubDecode("anything".getBytes) === ((640, 480, 42)))
      val frames = FfmpegShim.sampleFrames("anything".getBytes,
        everyNth = 2, maxFrames = 4)
      assert(frames.length === 2, s"PNG splitter found ${frames.length}")
      // each split payload is an intact, decodable PNG
      frames.foreach { f =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f))
        assert(img != null && img.getWidth === 1 && img.getHeight === 1)
      }
      assert(frames(0).toSeq !== frames(1).toSeq, "frames must be distinct")
    }
  }

  test("a failing binary surfaces its stderr, not a silent wrong answer") {
    val bad = script("""echo "boom: unsupported codec" >&2; exit 1""")
    val okProbe = script("""echo "1,1,1"""")
    withBins(okProbe, bad) {
      assert(FfmpegShim.available === false || {
        // -version also exits 1 for `bad`, so available is false and
        // sampleFrames refuses via the capability probe
        true
      })
      intercept[UnsupportedOperationException] {
        FfmpegShim.sampleFrames(Array[Byte](1))
      }
    }
    // available but the DECODE fails: the error carries stderr
    val probeOk = script("""case "$1" in -version) echo x;; *) echo "9,9,9";; esac""")
    val mpegFail = script(
      """case "$1" in -version) echo x;; *) echo "boom: bad nal" >&2; exit 1;; esac""")
    withBins(probeOk, mpegFail) {
      assert(FfmpegShim.available)
      val e = intercept[java.io.IOException] {
        FfmpegShim.sampleFrames(Array[Byte](1))
      }
      assert(e.getMessage.contains("bad nal"), e.getMessage)
    }
  }
}
