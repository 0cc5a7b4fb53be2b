package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextClassifier

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def labeled = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .withColumn("label", TextFunctions.qualityScore(col("text")) >= 0.5)

  private def logLoss(model: TextClassifier.Model): Double =
    labeled
      .select(col("label").cast("double").as("y"),
        TextClassifier.logit(labeled, col("text"), model).as("z"))
      .select((lit(1.0) / (lit(1.0) + exp(-col("z")))).as("p"), col("y"))
      .select((-(col("y") * log(greatest(col("p"), lit(1e-12))) +
        (lit(1.0) - col("y")) *
          log(greatest(lit(1.0) - col("p"), lit(1e-12))))).as("l"))
      .agg(avg("l")).as[Double].head()

  test("gradient descent reduces log-loss over the dyadic prior") {
    val df = labeled
    val init = TextClassifier.Model(TextClassifier.initWeights(512))
    val trained = TextClassifier.train(df, "text", "label",
      numFeatures = 512, iters = 5, learningRate = 1.0)
    val before = logLoss(init)
    val after = logLoss(trained)
    assert(after < before,
      f"5 GD iterations must reduce log-loss: $after%.4f vs $before%.4f")
  }

  test("trained classifier beats the untrained prior on accuracy") {
    val df = labeled
    def accuracy(model: TextClassifier.Model): Double =
      TextClassifier.classify(df, "doc_id", "text", model)
        .join(df.select(col("doc_id").as("id"), col("label")), "id")
        .select(avg((col("predicted") === col("label")).cast("double")))
        .as[Double].head()
    val init = accuracy(TextClassifier.Model(TextClassifier.initWeights(512)))
    val trained = accuracy(TextClassifier.train(df, "text", "label",
      numFeatures = 512, iters = 5, learningRate = 1.0))
    assert(trained > init && trained > 0.6,
      f"training must beat the random prior: trained=$trained%.2f init=$init%.2f")
  }

  test("untrained logits are exact dyadic sums (order-independent)") {
    // every init weight is k/1024; partial sums never round, so the
    // logit is independent of accumulation order — the property the
    // DuckDB oracle relies on
    val w = TextClassifier.initWeights(512)
    assert(w.forall(x => x * 1024.0 == math.rint(x * 1024.0)))
    assert(w.exists(_ != 0.0))
    val df = labeled
    val model = TextClassifier.Model(w)
    val a = TextClassifier.classify(df, "doc_id", "text", model)
      .collect().map(_.toSeq).toSet
    val b = TextClassifier.classify(df.repartition(7), "doc_id", "text", model)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("a logit Column keeps its model across later logit calls") {
    // regression: logit() used to bind weights through one shared
    // temp-function name resolved at analysis time — a Column obtained
    // for model A but analyzed after logit(modelB) silently scored
    // with B's weights
    val df = labeled
    val a = TextClassifier.Model(TextClassifier.initWeights(512))
    val b = TextClassifier.Model(a.weights.map(_ + 1.0))
    val zA = TextClassifier.logit(df, col("text"), a)
    TextClassifier.logit(df, col("text"), b) // re-bind attempt
    val rows = df
      .select(zA.as("lateA"),
        TextClassifier.logit(df, col("text"), a).as("freshA"),
        TextClassifier.logit(df, col("text"), b).as("freshB"))
      .filter(col("lateA") =!= col("freshA") ||
        col("lateA") === col("freshB"))
    assert(rows.count() == 0L,
      "Column from logit(modelA) must score with A's weights even when analyzed after logit(modelB)")
  }

  test("hash-weight-sum kernel is total on negative hashes") {
    // floorMod: arbitrary array<long> input (outside hash32's
    // non-negative range) must index weights safely, not throw
    import org.apache.spark.sql.classic.GraftPlanApi
    import graft.plans.HashWeightSum
    val w = Array(1.0, 10.0, 100.0)
    val c = GraftPlanApi.column(HashWeightSum(
      GraftPlanApi.expression(col("hs")), w))
    val out = Seq(Seq(-1L, -3L, 5L)).toDF("hs").select(c.as("s"))
      .as[Double].head()
    // floorMod(-1,3)=2, floorMod(-3,3)=0, floorMod(5,3)=2
    assert(out == 100.0 + 1.0 + 100.0)
  }

  test("training touches the driver only through the weight vector") {
    // the gradient reduce must group into at most F rows — a training
    // pass that collects per-document state would not survive 100 TB
    val df = labeled.limit(50)
    val m = TextClassifier.train(df, "text", "label",
      numFeatures = 64, iters = 1, learningRate = 0.1)
    assert(m.weights.length == 64)
  }
}
