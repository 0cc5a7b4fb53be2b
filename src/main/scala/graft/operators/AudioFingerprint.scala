package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.MediaRecord

/** Audio near-duplicate detection by spectral landmark hashing — the
  * audio counterpart of [[Multimodal.imageAHash]]/[[imageNearDupPairs]]
  * and the simplified form of the published constellation approach
  * (Wang 2003, "An Industrial-Strength Audio Search Algorithm"):
  * frame the PCM stream, FFT each frame (pure-JVM radix-2 — no native
  * dependency), keep the PEAK BIN PER LOG-BAND (peak positions survive
  * re-encoding and additive noise that destroys raw sample equality),
  * and pack the per-frame peaks into one 64-bit landmark.
  *
  * Scale shape: fingerprinting is per-row work behind the same
  * `mapPartitions` codec seam as every other decoder (an Expression
  * cannot host javax.sound); matching is a landmark-bucket equi-join
  * with the [[Dedup.minHashCandidates]] degeneracy bound (a corpus of
  * identical silence caps instead of exploding), then a count of
  * co-occurring frames per pair — never an all-pairs comparison.
  *
  * Determinism: the FFT is fixed-order IEEE double arithmetic on
  * integer-exact PCM inputs, so fingerprints are bit-stable across
  * re-runs and partitionings.
  */
object AudioFingerprint {

  /** In-place iterative radix-2 Cooley–Tukey FFT (re/im arrays, length
    * a power of two). Deterministic op order.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    require(im.length == n, "re/im length mismatch")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blockStart = 0
      while (blockStart < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blockStart + k
          val b = a + len / 2
          val vr = re(b) * cr - im(b) * ci
          val vi = re(b) * ci + im(b) * cr
          re(b) = re(a) - vr
          im(b) = im(a) - vi
          re(a) += vr
          im(a) += vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blockStart += len
      }
      len <<= 1
    }
  }

  /** Decode 16-bit PCM to mono doubles in [-1, 1] (channel-averaged);
    * the same JDK parser as [[Multimodal.audioDecode]].
    */
  def monoSamples(payload: Array[Byte]): (Array[Double], Float) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"fingerprint needs 16-bit signed PCM, got $fmt")
      val big = fmt.isBigEndian
      val ch = fmt.getChannels
      val bytes = ais.readAllBytes()
      val frames = bytes.length / (2 * ch)
      val out = new Array[Double](frames)
      var f = 0
      while (f < frames) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val i = (f * ch + c) * 2
          val s =
            if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
            else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
          acc += s / 32768.0
          c += 1
        }
        out(f) = acc / ch
        f += 1
      }
      (out, fmt.getSampleRate)
    } finally ais.close()
  }

  /** Landmark config: 1024-sample Hann frames, hop 512; log-spaced
    * peak bands over the positive spectrum. Four peaks × 10 bits +
    * the frame's band-energy ordering make the 64-bit landmark.
    */
  val FrameSize = 1024
  val Hop = 512
  val Bands: Array[(Int, Int)] = Array((1, 8), (8, 32), (32, 128), (128, 512))

  /** Per-frame spectral landmarks of one clip: (frame_idx, landmark).
    * Frames shorter than [[FrameSize]] are zero-padded; a clip shorter
    * than one hop yields one frame.
    */
  def landmarks(samples: Array[Double]): Array[(Int, Long)] = {
    val nFrames = math.max(1, (samples.length + Hop - 1) / Hop - 1)
    val out = new Array[(Int, Long)](nFrames)
    val re = new Array[Double](FrameSize)
    val im = new Array[Double](FrameSize)
    var f = 0
    while (f < nFrames) {
      java.util.Arrays.fill(im, 0.0)
      var i = 0
      while (i < FrameSize) {
        val idx = f * Hop + i
        val w = 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (FrameSize - 1)))
        re(i) = if (idx < samples.length) samples(idx) * w else 0.0
        i += 1
      }
      fft(re, im)
      var lm = 0L
      var b = 0
      while (b < Bands.length) {
        val (lo, hi) = Bands(b)
        var peak = lo
        var best = -1.0
        var k = lo
        while (k < hi) {
          val mag = re(k) * re(k) + im(k) * im(k)
          if (mag > best) { best = mag; peak = k }
          k += 1
        }
        lm |= (peak.toLong & 0x3ffL) << (b * 10)
        b += 1
      }
      out(f) = (f, lm)
      f += 1
    }
    out
  }

  /** Fingerprint table for audio-mime rows: (media_id, frame_idx,
    * landmark) — the thing a pipeline PERSISTS next to the corpus so
    * matching never re-decodes (same contract as the minhash signature
    * store). Non-audio rows are filtered, not errored.
    */
  def fingerprints(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(m => m.meta != null && m.meta.mime != null &&
        m.meta.mime.startsWith("audio/") && m.payload != null)
      .mapPartitions(_.flatMap { m =>
        landmarks(monoSamples(m.payload)._1)
          .map { case (f, lm) => (m.media_id, f, lm) }
      })
      .toDF("media_id", "frame_idx", "landmark")
  }

  /** Near-duplicate clip pairs: landmark-bucket join (bounded; buckets
    * past `maxBucket` ids are dropped as degenerate, the
    * [[Dedup.minHashCandidates]] rule) then a per-pair count of
    * matching (frame, landmark) observations; pairs with at least
    * `minMatches` co-occurring frames survive. Output: (id_a, id_b,
    * n_matches), id_a < id_b.
    */
  def nearDupPairs(
      prints: DataFrame,
      minMatches: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    val byLandmark = prints
      .groupBy("frame_idx", "landmark")
      .agg(sort_array(collect_set(col("media_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    byLandmark
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .agg(count(lit(1)).as("n_matches"))
      .filter(col("n_matches") >= minMatches)
  }
}
