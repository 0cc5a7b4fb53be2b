package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.operators.{AudioFingerprint, Multimodal}
import graft.operators.Multimodal.{MediaMeta, MediaRecord}

class AudioFingerprintSpec extends SparkSpec {

  private val Sr = 44100

  /** 16-bit mono WAV of a sum of sines (amplitude 0.2 each) plus
    * deterministic pseudo-noise at `noiseAmp` (0..32767 scale),
    * optionally preceded by `leadInSamples` of silence, at rate `sr`.
    */
  private def wav(
      freqs: Seq[Double], seconds: Double = 0.25, noiseAmp: Int = 0,
      leadInSamples: Int = 0, sr: Int = Sr): Array[Byte] = {
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

  // one tone per landmark band: bins ~5, ~16, ~58, ~186
  private val ChordA = Seq(200.0, 700.0, 2500.0, 8000.0)
  // a different chord: one tone per band again, but at other bins
  private val ChordB = Seq(280.0, 1100.0, 4000.0, 12000.0)

  test("fft: impulse is flat, pure bin-frequency sine peaks at its bin") {
    val n = 1024
    val re = new Array[Double](n); val im = new Array[Double](n)
    re(0) = 1.0
    AudioFingerprint.fft(re, im)
    for (k <- 0 until n) assert(math.abs(re(k) - 1.0) < 1e-9 && math.abs(im(k)) < 1e-9)
    // sine exactly on bin 37
    val re2 = Array.tabulate(n)(i => math.sin(2.0 * math.Pi * 37 * i / n))
    val im2 = new Array[Double](n)
    AudioFingerprint.fft(re2, im2)
    val mags = Array.tabulate(n / 2)(k => re2(k) * re2(k) + im2(k) * im2(k))
    assert(mags.indexOf(mags.max) === 37)
  }

  test("landmarks put a 440 Hz tone's peak at the right band bin") {
    val (samples, sr) = AudioFingerprint.monoSamples(wav(Seq(440.0)))
    assert(sr.toInt === Sr)
    val lms = AudioFingerprint.landmarks(samples)
    assert(lms.nonEmpty)
    // bin = 440 * 1024 / 44100 ~ 10.2 -> 10, inside band 1 (8..32)
    val band1Peak = ((lms.head._2 >> 10) & 0x3ff).toInt
    assert(band1Peak === 10, s"got bin $band1Peak")
  }

  test("fingerprints are deterministic and noise-stable; chords differ") {
    val clean = AudioFingerprint.landmarks(
      AudioFingerprint.monoSamples(wav(ChordA))._1)
    val again = AudioFingerprint.landmarks(
      AudioFingerprint.monoSamples(wav(ChordA))._1)
    assert(clean === again)
    val noisy = AudioFingerprint.landmarks(
      AudioFingerprint.monoSamples(wav(ChordA, noiseAmp = 150))._1)
    val matches = clean.toSet.intersect(noisy.toSet).size
    assert(matches >= clean.length * 3 / 4,
      s"noise moved too many peaks: $matches of ${clean.length}")
    val other = AudioFingerprint.landmarks(
      AudioFingerprint.monoSamples(wav(ChordB))._1)
    assert(clean.toSet.intersect(other.toSet).isEmpty)
  }

  test("near-dup pairs: noisy, offset, and resampled copies match; a different chord does not") {
    import spark.implicits._
    def rec(id: Long, bytes: Array[Byte]) =
      MediaRecord(id, bytes, MediaMeta("audio/wav", "t", bytes.length.toLong))
    val media = Seq(
      rec(1L, wav(ChordA)),
      rec(2L, wav(ChordA, noiseAmp = 150)),
      rec(3L, wav(ChordB)),
      // the same chord 3 hops late — only a consistent frame DELTA
      // matches it (absolute frame keys would share zero buckets)
      rec(4L, wav(ChordA, leadInSamples = 3 * 512)),
      // the same chord transcoded to 22.05 kHz — only the canonical-
      // rate resample puts its peaks on the same bins and frames
      rec(5L, wav(ChordA, sr = 22050))).toDS()
    val prints = AudioFingerprint.fingerprints(media)
    val pairs = AudioFingerprint.nearDupPairs(prints, minMatches = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 2L), (1L, 4L), (1L, 5L)).subsetOf(pairs), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"chord B matched: $pairs")
  }

  test("non-PCM16 audio degrades to no fingerprints, never a job failure") {
    import spark.implicits._
    // an 8-bit WAV parses fine but is not 16-bit signed PCM
    val n = 1000
    val pcm8 = Array.tabulate(n)(i => (128 + 100 * math.sin(i / 10.0)).toByte)
    val fmt = new AudioFormat(Sr.toFloat, 8, 1, false, false)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm8), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val media = Seq(
      MediaRecord(1L, baos.toByteArray, MediaMeta("audio/wav", "t", 1L)),
      MediaRecord(2L, wav(ChordA), MediaMeta("audio/wav", "t", 1L))).toDS()
    val prints = AudioFingerprint.fingerprints(media)
    assert(prints.filter("media_id = 1").isEmpty)
    assert(!AudioFingerprint.fingerprints(media).filter("media_id = 2").isEmpty)
  }

  test("degenerate landmark buckets cap instead of exploding") {
    import spark.implicits._
    val silent = wav(Seq.empty)
    val media = (1L to 5L).map(i =>
      MediaRecord(i, silent, MediaMeta("audio/wav", "t", silent.length.toLong))).toDS()
    val prints = AudioFingerprint.fingerprints(media)
    // 5 identical silent clips put ~105 observations in one landmark
    // bucket; a tight bound drops them all
    assert(AudioFingerprint.nearDupPairs(prints, minMatches = 1, maxBucket = 50).isEmpty)
    // with the bound relaxed they all pair up (C(5,2) = 10)
    assert(AudioFingerprint.nearDupPairs(prints, minMatches = 1, maxBucket = 500)
      .count() === 10L)
  }
}
