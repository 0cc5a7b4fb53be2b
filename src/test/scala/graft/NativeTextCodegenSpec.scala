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
