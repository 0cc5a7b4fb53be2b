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

  /** The canonical fingerprint rate: every clip is linear-resampled
    * here before framing, so the same audio at 22.05/48/96 kHz lands
    * on the same frequency bins AND the same frame boundaries (frames
    * are fixed sample counts — without rate canonicalization a
    * transcode shifts every peak bin and halves/doubles frame
    * indices, and nothing ever matches).
    */
  val CanonicalRate = 44100.0

  /** Deterministic linear resampling (sufficient for peak-bin
    * detection; interpolation error is far below the band-peak
    * decision margin).
    */
  def resampleLinear(samples: Array[Double], from: Double, to: Double): Array[Double] = {
    if (from == to || samples.isEmpty) return samples
    val n = math.max(1, math.round(samples.length * to / from).toInt)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val pos = i * from / to
      val lo = math.min(samples.length - 1, pos.toInt)
      val hi = math.min(samples.length - 1, lo + 1)
      val frac = pos - lo
      out(i) = samples(lo) * (1.0 - frac) + samples(hi) * frac
      i += 1
    }
    out
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
    * peak bands over the positive spectrum. The landmark is the four
    * peak bins at 10 bits each — 40 discriminating bits (the top 24
    * are zero).
    */
  val FrameSize = 1024
  val Hop = 512
  val Bands: Array[(Int, Int)] = Array((1, 8), (8, 32), (32, 128), (128, 512))

  // the window is a constant — recomputing cos() per sample per frame
  // put ~5M transcendental calls per minute of audio on the hot path
  private val HannWindow: Array[Double] = Array.tabulate(FrameSize)(i =>
    0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (FrameSize - 1))))

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
        re(i) = if (idx < samples.length) samples(idx) * HannWindow(i) else 0.0
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
    * landmark) at the canonical rate — the thing a pipeline PERSISTS
    * next to the corpus so matching never re-decodes (same contract
    * as the minhash signature store). Non-audio rows are filtered;
    * audio the JDK parses but that is not 16-bit PCM yields NO
    * fingerprints instead of failing the job — the same graceful
    * degradation as [[Multimodal.audioFeatures]]' NaN RMS (an
    * unfingerprinted clip is simply unmatchable).
    */
  def fingerprints(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(m => m.meta != null && m.meta.mime != null &&
        m.meta.mime.startsWith("audio/") && m.payload != null)
      .mapPartitions(_.flatMap { m =>
        scala.util.Try {
          val (samples, sr) = monoSamples(m.payload)
          landmarks(resampleLinear(samples, sr.toDouble, CanonicalRate))
            .map { case (f, lm) => (m.media_id, f, lm) }
        }.getOrElse(Array.empty[(Long, Int, Long)])
      })
      .toDF("media_id", "frame_idx", "landmark")
  }

  /** Near-duplicate clip pairs, OFFSET-INVARIANT: bucket by landmark
    * VALUE only, pair the (id, frame) observations inside each bucket,
    * and score a pair by its best frame-delta — `n_matches` is the
    * number of co-occurring landmarks at ONE CONSISTENT time offset
    * (the Wang 2003 delta-histogram idea), so a trimmed lead-in or
    * codec padding shifts every frame index and still matches, while
    * coincidental single-landmark collisions scatter across deltas
    * and never accumulate. Buckets past `maxBucket` observations drop
    * as degenerate ([[Dedup.minHashCandidates]] rule — silence is the
    * audio equivalent of an all-identical corpus). Output: (id_a,
    * id_b, n_matches), id_a < id_b.
    */
  def nearDupPairs(
      prints: DataFrame,
      minMatches: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    val byLandmark = prints
      .groupBy("landmark")
      .agg(sort_array(collect_list(struct(col("media_id").as("id"),
        col("frame_idx").as("f")))).as("obs"))
      .filter(size(col("obs")).between(2, maxBucket))
    byLandmark
      .select(Dedup.orderedPairs(col("obs")).as("p"))
      .filter(col("p.a.id") < col("p.b.id"))
      .groupBy(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        (col("p.a.f") - col("p.b.f")).as("__delta"))
      .agg(count(lit(1)).as("n_matches"))
      .groupBy("id_a", "id_b")
      .agg(max("n_matches").as("n_matches"))
      .filter(col("n_matches") >= minMatches)
  }
}
