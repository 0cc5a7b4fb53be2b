package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: one hot source with 1500 rows, a tail of small ones
  private def corpus = {
    val rows =
      (0 until 1500).map(i => (i.toLong, "hot", (i % 97).toDouble)) ++
      (0 until 40).map(i => (10000L + i, "mid", i.toDouble)) ++
      Seq((20000L, "tiny", 5.0))
    rows.toDF("id", "src", "score")
  }

  test("bounded formulation matches the window truth exactly (skew + ties)") {
    val w = Curation.sourceCapsWindow(corpus, "src", "id", "score", cap = 10)
      .select("id", "src", "score", "src_rank")
    val b = Curation.sourceCaps(corpus, "src", "id", "score", cap = 10)
      .select("id", "src", "score", "src_rank")
    val wSet = w.collect().map(_.toSeq).toSet
    val bSet = b.collect().map(_.toSeq).toSet
    assert(wSet == bSet,
      s"diff: ${(wSet -- bSet).take(5)} / ${(bSet -- wSet).take(5)}")
  }

  test("cap respected per source; under-cap sources keep everything") {
    val out = Curation.sourceCaps(corpus, "src", "id", "score", cap = 10)
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("hot") == 10L)
    assert(counts("mid") == 10L)
    assert(counts("tiny") == 1L)
  }

  test("kept rows are the best-scored; ties break by id ascending") {
    val kept = Curation.sourceCaps(corpus, "src", "id", "score", cap = 10)
      .filter(col("src") === "hot").orderBy("src_rank").collect()
    // hot scores cycle 0..96; the top-10 are score 96 (ids 96, 193, ...)
    assert(kept.forall(_.getDouble(2) == 96.0))
    val ids = kept.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted), "tie-break must be id asc")
    assert(ids.head == 96L)
  }

  // ----------------------------------------------- calibrateQuality

  test("calibration keeps each source's best half regardless of raw scale") {
    import org.apache.spark.sql.functions.col
    // source a scores 1..4 (low scale), source b scores 11..14: a raw
    // global cut at the median would drop ALL of a; calibration keeps
    // the top half of each
    val docs = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0),
      (5L, "b", 11.0), (6L, "b", 12.0), (7L, "b", 13.0), (8L, "b", 14.0))
      .toDF("doc_id", "source", "q")
    val r = graft.operators.Curation
      .calibrateQuality(docs, "doc_id", "source", col("q"), keepFraction = 0.5)
    val kept = r.filter(col("keep")).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L, 7L, 8L), s"got $kept")
  }

  test("a single-document source keeps its one document") {
    import org.apache.spark.sql.functions.col
    // the rank-based rule exists for exactly this: percent_rank of a
    // 1-row partition is 0, so a `pct_rank >= 1 - keepFraction`
    // threshold would eliminate every lone-document source
    val docs = Seq(
      (1L, "solo", 0.1),
      (2L, "big", 1.0), (3L, "big", 2.0), (4L, "big", 3.0), (5L, "big", 4.0))
      .toDF("doc_id", "source", "q")
    val r = graft.operators.Curation
      .calibrateQuality(docs, "doc_id", "source", col("q"), keepFraction = 0.5)
    val solo = r.filter(col("source") === "solo").collect()
    assert(solo.length == 1)
    assert(solo.head.getAs[Boolean]("keep"), "the lone document must be kept")
  }

  test("percent ranks are dense, tie-broken by id, and partition-independent") {
    import org.apache.spark.sql.functions.col
    val docs = (1 to 40).map(i => (i.toLong, s"s${i % 3}", (i % 7).toDouble))
      .toDF("doc_id", "source", "q")
    val one = graft.operators.Curation
      .calibrateQuality(docs, "doc_id", "source", col("q"))
      .orderBy("source", "doc_id").collect().toSeq
    val many = graft.operators.Curation
      .calibrateQuality(docs.repartition(9), "doc_id", "source", col("q"))
      .orderBy("source", "doc_id").collect().toSeq
    assert(one == many)
    one.foreach { r =>
      val p = r.getDouble(3)
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  // --------------------------------------------- curateCorpus (e2e)

  test("curate pipeline: kept per source equals min(quota, survivors), budget respected") {
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    val r = Queries.all("q_curate_corpus")(spark, "/root/testdata/sf0.001").cache()
    val perSource = r.groupBy("source").agg(
      sum(col("kept").cast("long")).as("n_kept"),
      max("quota").as("quota"),
      count(lit(1)).as("n_gated")).collect()
    perSource.foreach { x =>
      assert(x.getLong(1) == math.min(x.getLong(2), x.getLong(3)),
        s"${x.getString(0)}: kept ${x.getLong(1)} != min(quota ${x.getLong(2)}, gated ${x.getLong(3)})")
    }
    val totalKept = r.filter(col("kept")).count()
    assert(totalKept <= 1000L, s"budget exceeded: $totalKept")
    // quotas sum exactly to the budget (largest remainder), so when
    // every source has enough survivors the kept total IS the budget
    val quotaSum = perSource.map(_.getLong(2)).sum
    assert(quotaSum == 1000L, s"quota apportionment must sum to 1000, got $quotaSum")
  }

  test("curate pipeline drops exact duplicates before gating") {
    import org.apache.spark.sql.functions.col
    val r = Queries.all("q_curate_corpus")(spark, "/root/testdata/sf0.001")
    val ids = r.select("doc_id").as[Long].collect()
    assert(ids.length == ids.distinct.length, "one row per surviving doc")
  }

  test("registered calibrated-quality query keeps about half per source") {
    import org.apache.spark.sql.functions.{avg, col}
    val r = Queries.all("q_quality_calibrated")(spark, "/root/testdata/sf0.001")
    val fracs = r.groupBy("source")
      .agg(avg(col("keep").cast("double")).as("f"))
      .select("f").as[Double].collect()
    assert(fracs.nonEmpty && fracs.forall(f => f > 0.3 && f < 0.7), fracs.toSeq)
  }
}
