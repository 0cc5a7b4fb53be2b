package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.functions.TextFunctions

/** Split from the monolithic Queries.scala registry (round 11);
  * registered via [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object MultimodalQueries {

  /** Binary-payload plumbing: documents as opaque binary media, with
    * expression-level feature extraction (deterministic fake decode —
    * real codec path is [[graft.operators.Multimodal.decodeFeatures]],
    * exercised in tests).
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val h = TextFunctions.portableHash32(col("text"))
    t(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
      sha2(encode(col("text"), "UTF-8"), 256).as("checksum"),
      (lit(16) + pmod(h, lit(4080L))).cast("long").as("width"),
      (lit(16) + pmod(floor(h / lit(4096.0)).cast("long"), lit(2144L))).cast("long").as("height"))
  }

  val multimodalFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  sha256(text) AS checksum,
      |  CAST(16 + CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) % 4080 AS BIGINT) AS width,
      |  CAST(16 + CAST(floor(CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) / 4096.0) AS BIGINT) % 2144 AS BIGINT) AS height
      |FROM documents""".stripMargin

  // ------------------------- oracled binary matchers (pinned-row gates)
  //
  // DuckDB cannot decode JPEG/AVI/WAV, so these three run the REAL
  // decoders on [[graft.operators.MediaFixtures]] payloads in-plan and
  // their oracles carry the expected rows as pinned literals — the
  // q_compression_ratio pattern. MultimodalOracleSpec asserts the same
  // constants locally, so codec drift fails `sbt test` first.

  import graft.operators.{AudioFingerprint, MediaFixtures, Multimodal, VideoFrames}
  import graft.operators.Multimodal.{MediaMeta, MediaRecord}

  /** Cross-modal provenance gate: image 100 is BYTE-IDENTICAL to frame
    * 2 of video 1 (match at hamming 0, adjudicating that the JPEG
    * still-decode and the AVI frame-decode agree bit-for-bit on the
    * same pixels); image 101 is the phase-flipped pattern (no match).
    */
  def imageFrameMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frames = MediaFixtures.checkerFrames
    val images = Seq(
      MediaRecord(100L, frames(2), MediaMeta("image/jpeg", "fixture", 1L)),
      MediaRecord(101L, MediaFixtures.jpegChecker(2, phase = 1),
        MediaMeta("image/jpeg", "fixture", 1L))).toDS()
    val videos = Seq(
      MediaRecord(1L, MediaFixtures.mjpegAvi(frames),
        MediaMeta("video/avi", "fixture", 1L))).toDS()
    VideoFrames.imageFrameMatches(
      Multimodal.imageHashes(images), VideoFrames.fingerprints(videos))
      .select(col("image_id").cast("long").as("image_id"),
        col("video_id").cast("long").as("video_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("hamming").cast("long").as("hamming"))
  }

  val imageFrameMatchSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(100 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT))
      |) AS t(image_id, video_id, frame_idx, hamming)""".stripMargin

  /** Image near-dup gate: two byte-identical decoded JPEGs pair at
    * hamming 0 (the decode is in-plan), a phase-flipped third does
    * not; two synthetic hashes 2 bits apart pair through the banded
    * join (the band/bit arithmetic is adjudicated exactly).
    */
  def imageNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val images = Seq(
      MediaRecord(1L, MediaFixtures.jpegChecker(2), MediaMeta("image/jpeg", "fixture", 1L)),
      MediaRecord(2L, MediaFixtures.jpegChecker(2), MediaMeta("image/jpeg", "fixture", 1L)),
      MediaRecord(3L, MediaFixtures.jpegChecker(2, phase = 1),
        MediaMeta("image/jpeg", "fixture", 1L))).toDS()
    val synthetic = Seq(
      (10L, 0x7777777777777777L), (11L, 0x7777777777777774L))
      .toDF("media_id", "ahash")
    Multimodal.imageNearDupPairs(
      Multimodal.imageHashes(images).unionByName(synthetic))
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"),
        col("hamming").cast("long").as("hamming"))
  }

  val imageNearDupSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
      |  (CAST(10 AS BIGINT), CAST(11 AS BIGINT), CAST(2 AS BIGINT))
      |) AS t(id_a, id_b, hamming)""".stripMargin

  /** Audio near-dup gate: the spectral-landmark matcher on the chord
    * fixtures — a noisy copy, a 3-hop-late copy (delta alignment), and
    * a 22.05 kHz transcode (canonical-rate resample) all match the
    * original; a different chord matches nothing.
    */
  def audioNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def rec(id: Long, bytes: Array[Byte]) =
      MediaRecord(id, bytes, MediaMeta("audio/wav", "fixture", bytes.length.toLong))
    val media = Seq(
      rec(1L, MediaFixtures.chordWav(MediaFixtures.ChordA)),
      rec(2L, MediaFixtures.chordWav(MediaFixtures.ChordA, noiseAmp = 150)),
      rec(3L, MediaFixtures.chordWav(MediaFixtures.ChordB)),
      rec(4L, MediaFixtures.chordWav(MediaFixtures.ChordA, leadInSamples = 3 * 512)),
      rec(5L, MediaFixtures.chordWav(MediaFixtures.ChordA, sr = 22050))).toDS()
    AudioFingerprint.nearDupPairs(
      AudioFingerprint.fingerprints(media), minMatches = 8)
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"),
        col("n_matches").cast("long").as("n_matches"))
  }

  // all four ChordA variants (original, +noise, +3-hop offset, 22.05 kHz
  // transcode) pair with each other at the full 21 co-occurring frames;
  // ChordB (id 3) pairs with nothing
  val audioNearDupSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(21 AS BIGINT)),
      |  (CAST(1 AS BIGINT), CAST(4 AS BIGINT), CAST(21 AS BIGINT)),
      |  (CAST(1 AS BIGINT), CAST(5 AS BIGINT), CAST(21 AS BIGINT)),
      |  (CAST(2 AS BIGINT), CAST(4 AS BIGINT), CAST(21 AS BIGINT)),
      |  (CAST(2 AS BIGINT), CAST(5 AS BIGINT), CAST(21 AS BIGINT)),
      |  (CAST(4 AS BIGINT), CAST(5 AS BIGINT), CAST(21 AS BIGINT))
      |) AS t(id_a, id_b, n_matches)""".stripMargin
}
