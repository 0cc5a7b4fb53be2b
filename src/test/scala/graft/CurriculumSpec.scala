package graft

import org.apache.spark.sql.functions._
import graft.operators.Curriculum

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // 3 strata with distinct score shapes; ids unique across strata
    val rows = for {
      (lang, n, f) <- Seq(
        ("en", 400, (i: Int) => i * 0.5),
        ("de", 97, (i: Int) => math.sin(i) * 100),
        ("fr", 1, (i: Int) => 42.0))
      i <- 0 until n
    } yield (lang.hashCode.toLong * 100000 + i, lang, f(i))
    rows.toDF("doc_id", "lang", "score")
  }

  test("exactBins: ntile sizes differ by at most one and cover [1, bins]") {
    val out = Curriculum.exactBins(corpus, "lang", "score", "doc_id", 4)
    val sizes = out.groupBy("lang", "bin").count()
      .groupBy("lang").agg(min("count").as("lo"), max("count").as("hi"),
        countDistinct("bin").as("nb"))
      .collect()
    sizes.foreach { r =>
      val (lang, lo, hi, nb) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hi - lo <= 1, s"$lang bucket sizes uneven: $lo..$hi")
      if (lang == "fr") assert(nb == 1L) // 1 row -> single bucket
      else assert(nb == 4L, s"$lang has $nb buckets")
    }
  }

  test("exactBins: bins are monotone in score within a stratum") {
    val out = Curriculum.exactBins(corpus, "lang", "score", "doc_id", 4)
      .filter(col("lang") === "en").collect()
    val byScore = out.sortBy(r => (r.getDouble(2), r.getLong(0)))
    val bins = byScore.map(_.getLong(3))
    assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    val pct = byScore.map(_.getDouble(4))
    assert(pct.zip(pct.tail).forall { case (a, b) => a <= b })
    assert(pct.head == 0.0 && math.abs(pct.last - 1.0) < 1e-9)
  }

  test("sketchBins: every row binned; disagreement with exact bounded by sketch rank error") {
    val exact = Curriculum.exactBins(corpus, "lang", "score", "doc_id", 4)
      .select(col("doc_id"), col("bin").as("exact_bin"))
    val sketch = Curriculum.sketchBins(corpus, "lang", "score", 4, accuracy = 10000)
      .select(col("doc_id"), col("bin").as("sketch_bin"))
    val joined = exact.join(sketch, "doc_id").collect()
    assert(joined.length == corpus.count())
    // high accuracy at this size => sketch boundaries are exact ranks;
    // bins can differ only where exact scores tie across a boundary
    val off = joined.count(r => math.abs(r.getLong(1) - r.getLong(2)) > 1)
    assert(off == 0, s"$off rows off by more than one bin")
    val diff = joined.count(r => r.getLong(1) != r.getLong(2))
    assert(diff <= joined.length / 100,
      s"$diff/${joined.length} rows disagree with exact bins")
  }

  test("sketchBins: plan broadcasts the cut points (no per-stratum sort of the corpus)") {
    val plan = Curriculum.sketchBins(corpus, "lang", "score", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in:\n$plan")
    assert(!plan.contains("WindowExec"), "scale path must not window-sort the corpus")
  }
}
