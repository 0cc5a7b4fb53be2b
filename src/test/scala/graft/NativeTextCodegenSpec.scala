package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.functions._

import graft.plans.NativeText

/** The NativeText expressions implement real `doGenCode` (not
  * CodegenFallback), so the text-dedup projections stay INSIDE
  * whole-stage codegen — fallback expressions are excluded from fusion
  * and would split the hottest per-row stage out of the generated
  * loop. Two invariants:
  *
  *   1. every ProjectExec in the dedup hash pipeline sits under a
  *      WholeStageCodegenExec (structural: the fusion actually happens);
  *   2. the generated path computes byte-identical values to the
  *      interpreted path (wholeStage off) — both call the same static
  *      evaluators, but the marshalling differs, so this pins it.
  */
class NativeTextCodegenSpec extends SparkSpec {

  private def hashPipeline(): DataFrame = {
    NativeText.register(spark, Seq(32))
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        NativeText.shingleHash32(
          split(lower(col("text")), " "), 3).as("h"))
      .select(col("doc_id"),
        NativeText.minHashSig(col("h"), 32).as("sig"),
        NativeText.simHash32(col("h")).as("simhash"))
      .select(col("doc_id"), col("simhash"),
        NativeText.bandHashes(col("sig"), 8, 4).as("bands"))
  }

  test("dedup hash projections stay inside whole-stage codegen") {
    val plan = hashPipeline().queryExecution.executedPlan
    val all = plan.collect { case p: ProjectExec => p }
    val fused = plan
      .collect { case w: WholeStageCodegenExec => w }
      .flatMap(_.collect { case p: ProjectExec => p })
    assert(all.nonEmpty, s"expected projections in:\n$plan")
    assert(all.size == fused.size,
      s"${all.size - fused.size} projection(s) fell out of whole-stage " +
        s"codegen — a NativeText expression regressed to fallback:\n$plan")
  }

  test("generated and interpreted paths agree value-for-value") {
    def rows() = hashPipeline()
      .select(col("doc_id"), col("simhash"), to_json(col("bands")).as("bands"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)

    val gen = rows()
    withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = rows()
      assert(gen.sameElements(interp))
    }
  }

  // --- TextRepetitionStats: the single-pass replacement for the HOF
  // dupNgramFraction formulation (which re-evaluated an interpreted
  // shingle transform per reference and dominated the bench) ---

  private def repetitionNative(): DataFrame = {
    NativeText.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), NativeText.textRepetitionStats(col("text")).as("r"))
      .select(col("doc_id"),
        col("r.n_words").as("n_words"),
        round(col("r.dup_word_frac"), 6).as("f1"),
        round(col("r.dup_bigram_frac"), 6).as("f2"),
        round(col("r.dup_trigram_frac"), 6).as("f3"))
  }

  private def collectRep(df: DataFrame): Array[(Long, Long, Double, Double, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))).sortBy(_._1)

  test("TextRepetitionStats matches the HOF formulation on real documents") {
    import graft.functions.TextFunctions
    val hof = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        size(split(TextFunctions.normalizeText(col("text")), " "))
          .cast("long").as("n_words"),
        round(TextFunctions.dupNgramFraction(col("text"), 1), 6).as("f1"),
        round(TextFunctions.dupNgramFraction(col("text"), 2), 6).as("f2"),
        round(TextFunctions.dupNgramFraction(col("text"), 3), 6).as("f3"))
    assert(collectRep(repetitionNative()).sameElements(collectRep(hof)))
  }

  test("TextRepetitionStats edge cases (empty, null, short, repetitive)") {
    NativeText.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "one"),                       // single word
      (2L, ""),                          // empty -> [''] -> n_words 1
      (3L, "  \t \n "),                  // whitespace-only -> same as empty
      (4L, "a a a a"),                   // total repetition
      (5L, "A  a\tb b"),                 // case-fold + collapse: a a b b
      (6L, null.asInstanceOf[String]))   // null text
      .toDF("doc_id", "text")
      .select(col("doc_id"), NativeText.textRepetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words"), col("r.dup_word_frac"),
        col("r.dup_bigram_frac"), col("r.dup_trigram_frac"))
    val got = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(got(0) == ((1L, 1L, 0.0, 0.0, 0.0)))
    assert(got(1) == ((2L, 1L, 0.0, 0.0, 0.0)))
    assert(got(2) == ((3L, 1L, 0.0, 0.0, 0.0)))
    // "a a a a": words 4 dups 3; bigrams "a a"x3 dups 2; trigrams x2 dups 1
    assert(got(3) == ((4L, 4L, 0.75, 2.0 / 3, 0.5)))
    // "a a b b": 2 dup words of 4; bigrams "a a","a b","b b" distinct; trigrams distinct
    assert(got(4) == ((5L, 4L, 0.5, 0.0, 0.0)))
    assert(got(5) == ((6L, -1L, 0.0, 0.0, 0.0))) // null text: null n_words, 0.0 fracs
  }

  test("TextRepetitionStats projection stays inside whole-stage codegen") {
    val plan = repetitionNative().queryExecution.executedPlan
    val all = plan.collect { case p: ProjectExec => p }
    val fused = plan
      .collect { case w: WholeStageCodegenExec => w }
      .flatMap(_.collect { case p: ProjectExec => p })
    assert(all.nonEmpty && all.size == fused.size,
      s"TextRepetitionStats fell out of whole-stage codegen:\n$plan")
  }

  test("TextRepetitionStats generated and interpreted paths agree") {
    val gen = collectRep(repetitionNative())
    withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(gen.sameElements(collectRep(repetitionNative())))
    }
  }

  private def withSqlConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
