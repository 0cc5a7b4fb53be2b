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
}
