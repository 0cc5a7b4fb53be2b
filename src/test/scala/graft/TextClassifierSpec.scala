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

  test("training touches the driver only through the weight vector") {
    // the gradient reduce must group into at most F rows — a training
    // pass that collects per-document state would not survive 100 TB
    val df = labeled.limit(50)
    val m = TextClassifier.train(df, "text", "label",
      numFeatures = 64, iters = 1, learningRate = 0.1)
    assert(m.weights.length == 64)
  }
}
