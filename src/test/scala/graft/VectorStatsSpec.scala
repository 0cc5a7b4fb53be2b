package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorStats

/** Hand-computed oracles for embedding distribution statistics. */
class VectorStatsSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  // ----------------------------------------------------- dimProfile

  test("per-dimension moments match the closed form") {
    val d = df(Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(3.0f, 0.0f)),
      (3L, Seq(5.0f, 0.0f))))
    val r = VectorStats.dimProfile(d, "embedding").orderBy("dim").collect()
    assert(r.length == 2)
    val d1 = r(0)
    assert(d1.getLong(0) == 1L && d1.getLong(1) == 3L)
    assert(d1.getDouble(2) == 3.0) // mean
    // population std of {1,3,5} = sqrt(8/3)
    assert(math.abs(d1.getDouble(3) - math.sqrt(8.0 / 3.0)) < 1e-5)
    assert(d1.getDouble(4) == 1.0 && d1.getDouble(5) == 5.0)
    val d2 = r(1)
    assert(d2.getDouble(2) == 0.0 && d2.getDouble(3) == 0.0)
  }

  test("profile is partitioning-independent (exact grid sums)") {
    val rows = (1 to 50).map(i => (i.toLong, Seq(i * 0.137f, -i * 0.029f)))
    val one = VectorStats.dimProfile(df(rows), "embedding")
      .orderBy("dim").collect().toSeq
    val many = VectorStats.dimProfile(df(rows).repartition(11), "embedding")
      .orderBy("dim").collect().toSeq
    assert(one == many)
  }

  // ---------------------------------------------------- standardize

  test("standardized dimensions have zero mean and unit spread") {
    val d = df(Seq(
      (1L, Seq(1.0f, 7.0f)), (2L, Seq(3.0f, 7.0f)), (3L, Seq(5.0f, 7.0f))))
    val z = VectorStats.standardize(d, "vec_id", "embedding")
      .orderBy("vec_id")
      .select($"z"(0), $"z"(1)).as[(Double, Double)].collect()
    val want0 = Seq(-math.sqrt(3.0 / 2.0), 0.0, math.sqrt(3.0 / 2.0))
    z.map(_._1).zip(want0).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-4, s"$got vs $want") }
    // zero-deviation dimension maps to 0, not NaN
    assert(z.map(_._2).toSeq == Seq(0.0, 0.0, 0.0))
  }

  // ----------------------------------------------- centroidOutliers

  test("the off-cluster vector ranks as its label's top outlier") {
    val d = Seq(
      (1L, 0, Seq(1.0f, 0.0f, 0.0f)),
      (2L, 0, Seq(0.9f, 0.1f, 0.0f)),
      (3L, 0, Seq(0.0f, 0.0f, 1.0f)), // off-cluster
      (4L, 1, Seq(0.0f, 1.0f, 0.0f)),
      (5L, 1, Seq(0.1f, 0.9f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val r = VectorStats.centroidOutliers(d, "vec_id", "label", "embedding", topK = 1)
      .orderBy("label").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(0, 1))
    assert(r(0).getLong(2) == 3L, "vector 3 is label 0's outlier")
    assert(r(0).getDouble(3) > r(1).getDouble(3),
      "the genuinely off-cluster vector is farther than in-cluster noise")
  }

  test("ranks are dense per label and distances are in [0, 2]") {
    val rows = (1 to 30).map(i =>
      (i.toLong, i % 3, Seq(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat)))
    val d = rows.toDF("vec_id", "label", "embedding")
    val r = VectorStats.centroidOutliers(d, "vec_id", "label", "embedding", topK = 4)
    val byLabel = r.groupBy("label").agg(
      count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .collect()
    byLabel.foreach { x =>
      assert(x.getLong(1) == 4L && x.getLong(2) == 4L && x.getLong(3) == 1L) }
    val ds = r.select("cos_dist").as[Double].collect()
    assert(ds.forall(x => x >= 0.0 && x <= 2.0))
  }

  test("outliers are partitioning-independent") {
    val rows = (1 to 40).map(i =>
      (i.toLong, i % 2, Seq((i * 0.31 % 1.7).toFloat, (i * 0.17 % 1.3).toFloat)))
    val d = rows.toDF("vec_id", "label", "embedding")
    val one = VectorStats.centroidOutliers(d, "vec_id", "label", "embedding")
      .orderBy("label", "rank").collect().toSeq
    val many = VectorStats.centroidOutliers(
      d.repartition(13), "vec_id", "label", "embedding")
      .orderBy("label", "rank").collect().toSeq
    assert(one == many)
  }

  // --------------------------------------------------- centroidShift

  test("identical slices have zero shift and cosine 1") {
    val rows = (1 to 20).map(i =>
      (i.toLong, i % 2, Seq(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat)))
    val d = rows.toDF("vec_id", "label", "embedding")
    val r = VectorStats.centroidShift(d, d, "label", "embedding")
      .orderBy("label").collect()
    assert(r.length == 2)
    r.foreach { x =>
      assert(x.getDouble(3) == 0.0, s"shift ${x.getDouble(3)}")
      assert(math.abs(x.getDouble(4) - 1.0) < 1e-6)
    }
  }

  test("a translated slice reports the translation as L2 shift") {
    val ref = Seq((1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(3.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val cur = Seq((3L, 0, Seq(1.0f, 4.0f)), (4L, 0, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "label", "embedding")
    val r = VectorStats.centroidShift(ref, cur, "label", "embedding").collect().head
    // centroids (2,0) and (2,4): shift 4
    assert(math.abs(r.getDouble(3) - 4.0) < 1e-4, s"${r.getDouble(3)}")
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
  }

  test("one-sided labels are excluded; result is partition-independent") {
    val ref = Seq((1L, 0, Seq(1.0f)), (2L, 7, Seq(1.0f)))
      .toDF("vec_id", "label", "embedding")
    val cur = Seq((3L, 0, Seq(2.0f)))
      .toDF("vec_id", "label", "embedding")
    val r = VectorStats.centroidShift(ref, cur, "label", "embedding")
    assert(r.select("label").as[Int].collect().toSeq == Seq(0))
    val rows = (1 to 40).map(i => (i.toLong, i % 3, Seq(i * 0.1f, -i * 0.05f)))
    val a = rows.toDF("vec_id", "label", "embedding")
    val one = VectorStats.centroidShift(
      a.filter($"vec_id" % 2 === 0), a.filter($"vec_id" % 2 === 1),
      "label", "embedding").orderBy("label").collect().toSeq
    val many = VectorStats.centroidShift(
      a.repartition(7).filter($"vec_id" % 2 === 0),
      a.repartition(11).filter($"vec_id" % 2 === 1),
      "label", "embedding").orderBy("label").collect().toSeq
    assert(one == many)
  }

  test("registered embedding-drift query emits one row per shared label") {
    val r = Queries.all("q_embedding_drift")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(r.length == 10) // 10 labels, both parities populated
    r.foreach { x =>
      assert(x.getDouble(3) >= 0.0)
      assert(math.abs(x.getDouble(4)) <= 1.0 + 1e-9)
    }
  }

  test("empty corpora yield empty results, not crashes") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(VectorStats.dimProfile(empty, "embedding").isEmpty)
    assert(VectorStats.standardize(empty, "vec_id", "embedding").isEmpty)
    val emptyLbl = Seq.empty[(Long, Int, Seq[Float])]
      .toDF("vec_id", "label", "embedding")
    assert(VectorStats.centroidOutliers(
      emptyLbl, "vec_id", "label", "embedding").isEmpty)
  }

  test("registered queries produce sane rows on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val prof = Queries.all("q_dim_profile")(spark, dir).collect()
    assert(prof.length == 64)
    prof.foreach { r =>
      assert(r.getDouble(3) >= 0.0) // std
      assert(r.getDouble(4) <= r.getDouble(5)) // min <= max
    }
    val out = Queries.all("q_centroid_outliers")(spark, dir)
    assert(out.count() > 0)
  }
}
