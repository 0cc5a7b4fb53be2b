package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Deterministic synthetic media payloads for the ORACLED multimodal
  * queries (q_image_frame_matches, q_image_neardup, q_audio_neardup):
  * the driver's DuckDB gate cannot decode JPEG/AVI/WAV, so those
  * queries run the real decoders on payloads built from pure,
  * seed-free arithmetic here, and their oracles carry the expected
  * output rows as pinned literals (the q_compression_ratio pattern —
  * MultimodalOracleSpec asserts the same constants, so codec drift
  * fails `sbt test` before it can fail the driver gate).
  *
  * Builders mirror the committed spec fixtures (VideoFramesSpec /
  * AudioFingerprintSpec): a 32x32 checkerboard JPEG family, a minimal
  * MJPEG-in-AVI container, and 16-bit mono WAV chords. Everything is
  * integer or fixed-order double arithmetic — byte-stable across runs
  * within one JVM, which is exactly the driver-gate contract.
  */
object MediaFixtures {

  /** 32x32 checkerboard JPEG with 4px cells; row-block `invertRow` is
    * inverted and `phase` flips the whole pattern.
    */
  def jpegChecker(invertRow: Int, phase: Int = 0): Array[Byte] = {
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

  /** The 8-frame clip used by the cross-modal fixtures. */
  def checkerFrames: Seq[Array[Byte]] = (0 until 8).map(jpegChecker(_))

  private def le32(n: Int): Array[Byte] =
    Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    ascii(id) ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  /** Minimal MJPEG AVI: RIFF('AVI ' JUNK LIST('movi' frames…)), last
    * frame nested in a LIST('rec ') interleave group.
    */
  def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val (plain, grouped) = frames.splitAt(math.max(0, frames.length - 1))
    val moviBody = ascii("movi") ++
      plain.flatMap(f => chunk("00dc", f)).toArray ++
      grouped.flatMap(f =>
        chunk("LIST", ascii("rec ") ++ chunk("00dc", f))).toArray
    val payload = ascii("AVI ") ++
      chunk("JUNK", Array.fill(13)(0.toByte)) ++
      chunk("LIST", moviBody)
    ascii("RIFF") ++ le32(payload.length) ++ payload
  }

  /** 16-bit mono WAV of summed sines (amplitude 0.2 each) plus
    * deterministic LCG pseudo-noise at `noiseAmp`, after
    * `leadInSamples` of silence, at rate `sr`.
    */
  def chordWav(
      freqs: Seq[Double], seconds: Double = 0.25, noiseAmp: Int = 0,
      leadInSamples: Int = 0, sr: Int = 44100): Array[Byte] = {
    val n = (sr * seconds).toInt + leadInSamples
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val t = i - leadInSamples
      val tone =
        if (t < 0) 0.0
        else freqs.map(f => 0.2 * math.sin(2.0 * math.Pi * f * t / sr)).sum
      val noise =
        if (noiseAmp == 0) 0
        else ((i * 1103515245 + 12345) >>> 16) % (2 * noiseAmp) - noiseAmp
      val s = math.max(-32768, math.min(32767, (tone * 32767).toInt + noise))
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** One tone per landmark log-band (bins ~5, ~16, ~58, ~186). */
  val ChordA: Seq[Double] = Seq(200.0, 700.0, 2500.0, 8000.0)

  /** A different chord, one tone per band at other bins. */
  val ChordB: Seq[Double] = Seq(280.0, 1100.0, 4000.0, 12000.0)
}
