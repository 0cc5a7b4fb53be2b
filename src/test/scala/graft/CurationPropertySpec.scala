package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Curriculum, Sampling, Sharding}

/** Randomized invariants for the curation/export operators, checked
  * independently of their window/aggregate implementations (fixed
  * seeds, the repo's hand-rolled generator style).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def genCorpus(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val nSrc = 2 + rnd.nextInt(6)
    val rows = (0 until 300 + rnd.nextInt(700)).map { i =>
      // negative and widely-spaced ids; skewed sources; tied scores
      val id = (if (rnd.nextBoolean()) 1L else -1L) * (i * 7919L + rnd.nextInt(3))
      (id, s"src${rnd.nextInt(nSrc) * rnd.nextInt(nSrc + 1) % nSrc}",
        (rnd.nextInt(8) * 0.125))
    }.distinct
    rows.toDF("id", "src", "score").dropDuplicates("id")
  }

  test("split: partition of the corpus for random seeds (total, disjoint, stable)") {
    val fr = Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)
    for (seed <- 1 to 5) {
      val df = genCorpus(seed)
      val n = df.count()
      val out = Sampling.split(df, "id", seed * 31L, fr)
      assert(out.count() == n) // total: every row tagged exactly once
      assert(out.groupBy("id").count().filter(col("count") > 1).count() == 0)
      val again = Sampling.split(df.repartition(5), "id", seed * 31L, fr)
      assert(out.select("id", "split").except(again.select("id", "split")).isEmpty)
    }
  }

  test("shardAssign: (shard, pos) is a bijection onto dense per-shard ranges") {
    for (seed <- 1 to 5) {
      val df = genCorpus(seed)
      val out = Sharding.shardAssign(df, "id", 1 + seed, seed.toLong).cache()
      try {
        assert(out.count() == df.count())
        val bad = out.groupBy("shard")
          .agg(count(lit(1)).as("n"), min("shard_pos").as("lo"),
            max("shard_pos").as("hi"), count_distinct(col("shard_pos")).as("d"))
          .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("d") =!= col("n"))
        assert(bad.isEmpty, bad.collect().mkString(","))
      } finally out.unpersist()
    }
  }

  test("sourceCaps bounded == window truth on skewed random corpora") {
    for (seed <- 1 to 5) {
      val df = genCorpus(seed)
      val w = Curation.sourceCapsWindow(df, "src", "id", "score", cap = 7)
        .select("id", "src_rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = Curation.sourceCaps(df, "src", "id", "score", cap = 7)
        .select("id", "src_rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(w == b, s"seed $seed: ${(w -- b).take(3)} / ${(b -- w).take(3)}")
    }
  }

  test("exactBins: bins partition each stratum in score order, sizes within one") {
    for (seed <- 1 to 5) {
      val df = genCorpus(seed)
      val out = Curriculum.exactBins(df, "src", "score", "id", bins = 3)
        .select("src", "score", "id", "bin").collect()
      out.groupBy(_.getString(0)).foreach { case (_, rows) =>
        val sorted = rows.sortBy(r => (r.getDouble(1), r.getLong(2)))
        val bins = sorted.map(_.getLong(3))
        assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
        val sizes = bins.groupBy(identity).values.map(_.length)
        assert(sizes.max - sizes.min <= 1)
      }
    }
  }
}
