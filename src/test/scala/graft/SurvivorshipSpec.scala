package graft

import org.apache.spark.sql.functions._

import graft.operators.Survivorship
import graft.operators.Survivorship._

/** Hand-computed survivorship fixtures: modal ties break to the
  * lowest value, recency wins with id tie-break, nulls never win a
  * rule but still count members, and the counted representation
  * serves the identical golden record.
  */
class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  // entity 1: name tie (ann/bob 1:1 -> ann), nation mode 7,
  //           balance null on one member
  // entity 2: single member, all nulls except id-ish fields
  private lazy val recs = Seq(
    (1L, 10L, "ann", Some(7L), Some(100.0), 5L),
    (1L, 11L, "bob", Some(7L), None, 9L),
    (1L, 12L, "bob", Some(3L), Some(40.0), 7L),
    (1L, 13L, "ann", Some(7L), Some(60.0), 1L),
    (2L, 20L, null, None, None, 4L))
    .toDF("entity_id", "rec_id", "name", "nation", "bal", "seen")

  private val rules = Seq(
    MostFrequent("name", "name"),
    MostFrequent("nation", "nation"),
    MaxOf("bal", "best_bal"),
    MinOf("bal", "worst_bal"))

  test("goldenRecord: modal ties to lowest, extremes skip nulls, nulls still counted") {
    val got = Survivorship.goldenRecord(recs, "entity_id", rules)
      .orderBy("entity_id").collect()
    val e1 = got(0)
    assert(e1.getLong(0) === 1L)
    assert(e1.getAs[Long]("n_records") === 4L)
    assert(e1.getAs[String]("name") === "ann") // 2-2 tie -> lowest
    assert(e1.getAs[Long]("nation") === 7L) // clear mode
    assert(e1.getAs[Double]("best_bal") === 100.0)
    assert(e1.getAs[Double]("worst_bal") === 40.0)
    val e2 = got(1)
    assert(e2.getAs[Long]("n_records") === 1L) // all-null member counts
    assert(e2.isNullAt(e2.fieldIndex("name")))
    assert(e2.isNullAt(e2.fieldIndex("best_bal")))
  }

  test("LatestBy: greatest (order, id) wins deterministically") {
    // entity 1 max seen = 9 -> bob; add a seen tie where ids decide
    val withTie = recs.union(Seq(
      (3L, 30L, "old", Option(1L), Option.empty[Double], 5L),
      (3L, 31L, "new", Option(2L), Option.empty[Double], 5L)).toDF(recs.columns: _*))
    val got = Survivorship.goldenRecord(withTie, "entity_id",
      Seq(LatestBy("name", "seen", "rec_id", "name")))
      .orderBy("entity_id").collect()
    assert(got(0).getAs[String]("name") === "bob") // seen=9
    assert(got(2).getAs[String]("name") === "new") // seen tie, id 31 > 30
  }

  test("goldenRecordFromCounts equals the row path (casts aside)") {
    val counts = Survivorship.countRecords(
      recs, "entity_id", Seq("name", "nation", "bal"))
    val got = Survivorship.goldenRecordFromCounts(counts, Seq(
      MostFrequent("name", "name"),
      MostFrequent("nation", "nation"),
      MaxOf("bal", "best_bal"),
      MinOf("bal", "worst_bal")))
      .select(col("entity_id"), col("n_records"), col("name"),
        col("nation").cast("long").as("nation"),
        col("best_bal"), col("worst_bal"))
    val want = Survivorship.goldenRecord(recs, "entity_id", rules)
    assert(got.collect().map(_.toString).sorted.toSeq
      === want.collect().map(_.toString).sorted.toSeq)
  }

  test("countRecords is additive: split folds sum to the one-pass counts") {
    val a = recs.filter(col("rec_id") < 12L)
    val b = recs.filter(col("rec_id") >= 12L)
    val merged = Survivorship.countRecords(a, "entity_id", Seq("name", "bal"))
      .unionByName(Survivorship.countRecords(b, "entity_id", Seq("name", "bal")))
      .groupBy("entity_id", "attr", "value").agg(sum("n").as("n"))
    val whole = Survivorship.countRecords(recs, "entity_id", Seq("name", "bal"))
    assert(merged.collect().map(_.toString).sorted.toSeq
      === whole.collect().map(_.toString).sorted.toSeq)
  }

  test("property: count path equals row path on randomized fixtures (6 seeds)") {
    (1 to 6).foreach { seed =>
      val df = spark.range(800).select(
        (col("id") % 37).as("entity_id"),
        col("id").as("rec_id"),
        when(pmod(hash(col("id"), lit(seed)), lit(11)) === 0,
          lit(null).cast("string"))
          .otherwise(concat(lit("v"),
            pmod(hash(col("id"), lit(seed)), lit(5)).cast("string"))).as("name"),
        pmod(hash(col("id"), lit(seed + 1)), lit(13)).cast("long").as("nation"),
        when(pmod(hash(col("id"), lit(seed + 2)), lit(7)) === 0,
          lit(null).cast("double"))
          .otherwise(pmod(hash(col("id"), lit(seed + 2)), lit(1000))
            .cast("double") / 10.0).as("bal"))
      val propRules = Seq(
        MostFrequent("name", "name"),
        MostFrequent("nation", "nation", tieCast = "long"),
        MaxOf("bal", "best_bal"),
        MinOf("bal", "worst_bal"))
      val viaCounts = Survivorship.goldenRecordFromCounts(
        Survivorship.countRecords(df, "entity_id", Seq("name", "nation", "bal")),
        propRules)
        .select(col("entity_id"), col("n_records"), col("name"),
          col("nation").cast("long").as("nation"),
          col("best_bal"), col("worst_bal"))
      val viaRows = Survivorship.goldenRecord(df, "entity_id", propRules)
      assert(viaCounts.collect().map(_.toString).sorted.toSeq
        === viaRows.collect().map(_.toString).sorted.toSeq, s"seed $seed")
    }
  }

  test("guards: empty rules, duplicate outputs, LatestBy off the count path") {
    intercept[IllegalArgumentException](
      Survivorship.goldenRecord(recs, "entity_id", Seq.empty))
    intercept[IllegalArgumentException](
      Survivorship.goldenRecord(recs, "entity_id",
        Seq(MaxOf("bal", "x"), MinOf("bal", "x"))))
    intercept[IllegalArgumentException](
      Survivorship.goldenRecordFromCounts(
        Survivorship.countRecords(recs, "entity_id", Seq("name")),
        Seq(LatestBy("name", "seen", "rec_id", "name"))))
  }

  test("latestRecords fails LOUDLY on a non-numeric idCol") {
    // a silent null-cast would make equal-ord ties nondeterministic
    val strIds = Seq((1L, "rec-a", "2024-01-01", "x"))
      .toDF("entity_id", "rec_id", "seen", "name")
    val e = intercept[Exception] {
      Survivorship.latestRecords(strIds, "entity_id",
        Seq(LatestBy("name", "seen", "rec_id", "name"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must be numeric")), e.getMessage)
    // numeric-typed and numeric-string ids both pass
    val numStr = strIds.withColumn("rec_id", lit("42"))
    val ok = Survivorship.latestRecords(numStr, "entity_id",
      Seq(LatestBy("name", "seen", "rec_id", "name"))).collect()
    assert(ok.head.getAs[Long]("tie_id") === 42L)
  }
}
