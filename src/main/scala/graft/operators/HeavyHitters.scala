package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.NativeSketch

/** Count-min-sketch heavy-hitter counting: estimated occurrence counts
  * for a candidate item set without ever materializing the full item
  * dictionary — the corpus reduces to ONE sketch of width×depth
  * counters (a few KB) that merges map-side, so a 100 TB token stream
  * costs a single scan with KB-sized partials, versus the exact
  * groupBy's shuffle of every distinct item.
  *
  * Guarantees (one-sided, the classic CM bound): estimate >= true
  * count always; estimate <= true count + eps·N with probability
  * `confidence`, N = total items. With a fixed seed the sketch's hash
  * rows are deterministic, so the whole report is replayable.
  */
object HeavyHitters {

  /** `items` + (`cms_est`, `cms_slack`) — the estimated count of each
    * item's `itemCol` under a sketch of `corpus(corpusCol)`, and the
    * ceil(eps·N) additive error budget. Driver state is the serialized
    * sketch (bounded by eps/confidence, independent of data size).
    */
  def withEstimates(
      items: DataFrame,
      itemCol: String,
      corpus: DataFrame,
      corpusCol: String,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 17): DataFrame = {
    require(eps > 0 && eps < 1 && confidence > 0 && confidence < 1,
      s"bad sketch params: eps=$eps confidence=$confidence")
    val row = corpus.agg(
      count_min_sketch(col(corpusCol), lit(eps), lit(confidence), lit(seed))
        .as("sk"),
      count(col(corpusCol)).as("n")).head()
    val sketch = row.getAs[Array[Byte]](0)
    val slack = math.ceil(eps * row.getLong(1)).toLong
    items
      .withColumn("cms_est", NativeSketch.cmsEstimate(sketch, col(itemCol)))
      .withColumn("cms_slack", lit(slack))
  }
}
