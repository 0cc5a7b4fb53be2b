package graft

/** Local twin of the pinned-row oracles for the binary multimodal
  * matchers (q_image_frame_matches / q_image_neardup / q_audio_neardup):
  * asserts the exact rows the VALUES oracles carry, so any JPEG/WAV
  * codec or FFT drift fails `sbt test` before it can fail the driver
  * gate — the q_compression_ratio / NativeNormSpec pattern.
  */
class MultimodalOracleSpec extends SparkSpec {
  import spark.implicits._

  private def rows(q: String): Set[Seq[Long]] =
    Queries.all(q)(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq.map(_.asInstanceOf[Long])).toSet

  test("q_image_frame_matches: exactly the planted frame, hamming 0") {
    assert(rows("q_image_frame_matches") === Set(Seq(100L, 1L, 2L, 0L)))
  }

  test("q_image_neardup: identical decodes at 0, synthetic pair at 2") {
    assert(rows("q_image_neardup") ===
      Set(Seq(1L, 2L, 0L), Seq(10L, 11L, 2L)))
  }

  test("q_audio_neardup: all ChordA variants pair at 21 frames; ChordB never") {
    assert(rows("q_audio_neardup") === Set(
      Seq(1L, 2L, 21L), Seq(1L, 4L, 21L), Seq(1L, 5L, 21L),
      Seq(2L, 4L, 21L), Seq(2L, 5L, 21L), Seq(4L, 5L, 21L)))
  }
}
