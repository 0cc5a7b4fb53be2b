package graft

import org.apache.spark.sql.functions._

import graft.operators.Anomaly

/** Hand-computed control-chart fixtures: the 3-sigma boundary, the
  * zero-filled silent hour, the flat-series std=0 guard, and the
  * additive FromCounts parity a live monitor relies on.
  */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private val hourCol = timestamp_seconds(lit(1700000000L) + col("h") * 3600L)

  test("z-scores and the 3-sigma flag match the hand-computed moments") {
    // type a: nine hours of 1 plus one hour of 21 — mean 3,
    // var = (9·1 + 441)/10 − 9 = 36, std 6, z(21) = 3.0 EXACTLY (the
    // inclusive flag boundary), z(1) = −1/3; type b flat at 4 →
    // std 0 → z pinned to 0, never flagged
    val counts = ((0 until 9).map(h => ("a", h, 1L)) :+ (("a", 9, 21L))) ++
      (0 until 10).map(h => ("b", h, 4L))
    val df = counts.toDF("event_type", "h", "__c")
      .select(col("event_type"), hourCol.as("bucket_ts"), col("__c"))
    val got = Anomaly.rateAnomalyFromCounts(df, "event_type")
      .orderBy("event_type", "bucket_ts")
      .select("event_type", "n_events", "z_score", "anomaly")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.length == 20)
    val a = got.filter(_._1 == "a")
    assert(a.take(9).forall(_ == ("a", 1L, -0.333333, false)))
    assert(a.last == ("a", 21L, 3.0, true))
    assert(got.filter(_._1 == "b").forall(_ == ("b", 4L, 0.0, false)))
  }

  test("silent hours are zero-filled — a dead producer gets flagged") {
    // type a fires 10 events in each of hours 0..8, then goes dark in
    // hour 9 while type b (constant 1/hour) keeps the grid spanning
    val events =
      (for (h <- 0 until 9; i <- 0 until 10) yield ("a", h * 3600 + i)) ++
        (0 until 10).map(h => ("b", h * 3600))
    val df = events.toDF("event_type", "s")
      .select(col("event_type"),
        timestamp_seconds(lit(1700000000L) + col("s")).as("ts"))
    val got = Anomaly.rateAnomaly(df, "event_type", "ts")
    assert(got.count() == 20) // 2 types × 10 hours, silent hour included
    val dark = got.filter(col("event_type") === "a" && col("n_events") === 0)
      .collect()
    assert(dark.length == 1)
    // mean 9, var = (9·100)/10 − 81 = 9, std 3 → z(0) = −3: flagged
    assert(dark.head.getAs[Double]("z_score") == -3.0)
    assert(dark.head.getAs[Boolean]("anomaly"))
  }

  test("FromCounts is additive: split-and-sum equals one-pass") {
    val events = (for (h <- 0 until 6; i <- 0 to h) yield ("a", h * 3600 + i))
      .toDF("event_type", "s")
      .select(col("event_type"),
        timestamp_seconds(lit(1700000000L) + col("s")).as("ts"))
    val onePass = Anomaly.rateAnomaly(events, "event_type", "ts")
      .collect().map(_.toString).sorted.toSeq
    // fold two halves' count tables, then sum — the live monitor's path
    val half1 = events.filter(col("ts") < timestamp_seconds(lit(1700000000L + 3 * 3600L)))
    val half2 = events.filter(col("ts") >= timestamp_seconds(lit(1700000000L + 3 * 3600L)))
    def cnt(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("bucket_ts"))
        .agg(count(lit(1)).as("__c"))
    val merged = cnt(half1).unionAll(cnt(half2))
      .groupBy("event_type", "bucket_ts").agg(sum("__c").as("__c"))
    val folded = Anomaly.rateAnomalyFromCounts(merged, "event_type")
      .collect().map(_.toString).sorted.toSeq
    assert(folded === onePass)
  }

  test("argument guards") {
    val df = Seq(("a", 0)).toDF("event_type", "s")
      .select(col("event_type"), timestamp_seconds(col("s")).as("ts"))
    intercept[IllegalArgumentException](
      Anomaly.rateAnomaly(df, "event_type", "ts", zThreshold = 0.0))
  }
}
