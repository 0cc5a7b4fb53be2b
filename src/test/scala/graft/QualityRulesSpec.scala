package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.QualityRules

class QualityRulesSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // 44 diverse words with function words: clears every rule
  private val good =
    "the quick brown fox jumps over a lazy dog near winding river bank today " +
    "while bright autumn leaves drift slowly down is that calm water for every " +
    "keen walker it seems of gentle morning light and distant hills glow warm " +
    "under pale blue skies"

  test("signals computes exact hand-checked values") {
    val df = docs((1L, "the cat sat on a mat")) // 6 words
    val r = QualityRules.signals(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_words") === 6L)
    // chars: the(3)+cat(3)+sat(3)+on(2)+a(1)+mat(3) = 15 -> 2.5
    assert(r.getAs[Double]("mean_word_len") === 2.5)
    // stopwords: the, a -> 2/6
    assert(r.getAs[Double]("stop_frac") === math.rint(2.0 / 6.0 * 1e6) / 1e6)
    assert(r.getAs[Double]("distinct_frac") === 1.0)
    // every word unique -> mode count 1
    assert(r.getAs[Double]("top_frac") === math.rint(1.0 / 6.0 * 1e6) / 1e6)
    assert(!r.getAs[Boolean]("pass")) // too short
  }

  test("each rule fails the document built to violate it") {
    val short = "the cat sat on a mat"                          // n_words < 20
    val repeated = ("spam " * 40).trim + " the a of it is in"   // top_frac high
    val noStops = (1 to 30).map(i => s"word$i").mkString(" ")   // stop_frac 0
    val df = docs((1L, good), (2L, short), (3L, repeated), (4L, noStops))
    val byId = QualityRules.signals(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("pass")).toMap
    assert(byId(1L), "well-formed doc must pass")
    assert(!byId(2L) && !byId(3L) && !byId(4L))
  }

  test("passes() agrees with signals().pass on real data") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaSignals = QualityRules.signals(df, "doc_id", "text")
      .filter(col("pass")).select(col("id")).collect().map(_.getLong(0)).toSet
    val viaFilter = QualityRules.filterDocs(df, "text")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(viaSignals === viaFilter)
    assert(viaFilter.nonEmpty && viaFilter.size < df.count())
  }

  test("the filter is a zero-shuffle map-only plan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = QualityRules.filterDocs(df, "text")
      .queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e
    }.isEmpty, "quality gate must fuse into the scan")
  }

  test("null text null-propagates through every signal and the gate") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]),
      (2L, "the quick brown fox jumps over the lazy dog again and again now"))
      .toDF("doc_id", "text")
    val rows = QualityRules.signals(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2) && rows(0).isNullAt(6),
      "null text -> null signals and null pass")
    assert(!rows(1).isNullAt(1) && !rows(1).isNullAt(6))
  }
}
