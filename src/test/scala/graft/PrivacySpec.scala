package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** Hand-computed k-anonymity / l-diversity fixtures: a below-k class,
  * a k-sized-but-homogeneous class (the leak l-diversity exists to
  * catch), and the suppression view's row-level flags.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (zip, gender, diagnosis): class A = 3 rows homogeneous,
  // class B = 2 rows diverse, class C = 1 row
  private lazy val rows = Seq(
    ("02138", "f", "flu"), ("02138", "f", "flu"), ("02138", "f", "flu"),
    ("02139", "m", "flu"), ("02139", "m", "cold"),
    ("02140", "f", "rare")).toDF("zip", "gender", "dx")

  test("kAnonymity sizes, flags and risk are exact") {
    val got = Privacy.kAnonymity(rows, Seq("zip", "gender"), k = 3L)
      .orderBy("zip")
      .select("zip", "group_n", "k_anonymous", "reident_risk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("02138", 3L, true, 0.333333),
      ("02139", 2L, false, 0.5),
      ("02140", 1L, false, 1.0)))
  }

  test("lDiversity catches the k-anonymous homogeneous class") {
    val got = Privacy.lDiversity(rows, Seq("zip", "gender"), "dx", k = 3L, l = 2L)
      .orderBy("zip")
      .select("zip", "sensitive_l", "k_anonymous", "l_diverse")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    // 02138 is k-anonymous yet l=1: the release would disclose "flu"
    // for every member; 02139 is diverse but below k
    assert(got.toSeq == Seq(
      ("02138", 1L, true, false),
      ("02139", 2L, false, true),
      ("02140", 1L, false, false)))
  }

  test("suppressionView tags every row with its class flag") {
    val v = Privacy.suppressionView(rows, Seq("zip", "gender"), k = 3L)
    assert(v.count() == 6)
    assert(v.filter(col("k_anonymous")).count() == 3)
    assert(v.filter(!col("k_anonymous")).select("zip").as[String]
      .collect().toSet == Set("02139", "02140"))
  }

  test("tCloseness EMD is exact on the hand-computed fixture") {
    // ordered domain: cold < flu < rare; global counts 1/4/1, N=6,
    // cumulative global probs 1/6, 5/6, 1
    //  02138 (n=3, all flu): cum probs 0,1,1   -> EMD=(1/6+1/6+0)/2=1/6
    //  02139 (n=2, cold+flu): cum .5,1,1       -> EMD=(1/3+1/6+0)/2=1/4
    //  02140 (n=1, rare):     cum 0,0,1        -> EMD=(1/6+5/6+0)/2=1/2
    val got = Privacy.tCloseness(rows, Seq("zip", "gender"), "dx", t = 0.3)
      .orderBy("zip")
      .select("zip", "group_n", "emd", "t_close")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("02138", 3L, 0.166667, true),
      ("02139", 2L, 0.25, true),
      ("02140", 1L, 0.5, false)))
  }

  test("tCloseness flags the skewed-but-diverse leak l-diversity misses") {
    // a group with TWO distinct sensitive values (l=2 "diverse") whose
    // distribution is still far from the global one
    val skew = Seq.tabulate(90)(i => ("a", if (i < 89) "sick" else "well")) ++
      Seq.tabulate(90)(_ => ("b", "well"))
    val df = {
      import spark.implicits._
      skew.toDF("zip", "dx")
    }
    val r = Privacy.tCloseness(df, Seq("zip"), "dx", t = 0.2)
      .filter(col("zip") === "a").collect().head
    assert(r.getAs[Double]("emd") > 0.4 && !r.getAs[Boolean]("t_close"))
    val l = Privacy.lDiversity(df, Seq("zip"), "dx", k = 5L, l = 2L)
      .filter(col("zip") === "a").collect().head
    assert(l.getAs[Boolean]("l_diverse")) // l-diversity says fine
  }

  test("dpRelease is deterministic, never emits true counts, suppresses small groups") {
    val a = Privacy.dpRelease(rows, Seq("zip", "gender"),
      epsilon = 1.0, releaseThreshold = 2.0, seed = 7L, epoch = 1L)
    val b = Privacy.dpRelease(rows, Seq("zip", "gender"),
      epsilon = 1.0, releaseThreshold = 2.0, seed = 7L, epoch = 1L)
    val ra = a.orderBy("zip").collect().map(_.toSeq)
    assert(ra.sameElements(b.orderBy("zip").collect().map(_.toSeq)))
    assert(a.columns.toSeq == Seq("zip", "gender", "noisy_n"))
    // every released noisy count clears the threshold and sits within
    // the Laplace(1) 99.9% envelope of its true count (|noise| <= ~7)
    val truth = Map(("02138", "f") -> 3.0, ("02139", "m") -> 2.0, ("02140", "f") -> 1.0)
    a.collect().foreach { r =>
      val noisy = r.getAs[Double]("noisy_n")
      assert(noisy >= 2.0)
      assert(math.abs(noisy - truth((r.getString(0), r.getString(1)))) < 8.0)
    }
    // a different seed moves the noise
    val c = Privacy.dpRelease(rows, Seq("zip", "gender"),
      epsilon = 1.0, releaseThreshold = 2.0, seed = 8L, epoch = 1L)
    assert(!ra.map(_.toString).sameElements(c.orderBy("zip").collect().map(_.toSeq.toString)))
  }

  test("dpRelease draws fresh noise per epoch — serial releases don't leak deltas") {
    // release the SAME store at two epochs: per-key noise must differ,
    // otherwise release(t2) - release(t1) = exact true-count delta and
    // serial monitoring has no privacy (the r12 advisory's attack)
    def rel(epoch: Long): Map[(String, String), Double] =
      Privacy.dpRelease(rows, Seq("zip", "gender"),
        epsilon = 1.0, releaseThreshold = -100.0, seed = 7L, epoch = epoch)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("noisy_n"))
        .toMap
    val e1 = rel(1L)
    val e2 = rel(2L)
    assert(e1.keySet == e2.keySet)
    // every key's noise moved between epochs (3 keys, continuous noise —
    // a collision would mean the epoch isn't in the hash)
    e1.keys.foreach(k => assert(e1(k) != e2(k), s"epoch-fixed noise for $k"))
    // replaying the SAME epoch is still exact (audit contract)
    assert(rel(2L) == e2)
  }

  test("tCloseness EMD is bounded in [0, 1] and t only moves the flag") {
    // randomized-ish (hash-derived, deterministic) wide fixture: many
    // classes, skewed sensitive values
    val wide = spark.range(2000).selectExpr(
      "cast(id % 17 as string) as zip",
      "cast(id % 3 as string) as gender",
      "cast(conv(substring(sha2(cast(id as string), 256), 1, 4), 16, 10) % 7 as string) as dx")
    val loose = Privacy.tCloseness(wide, Seq("zip", "gender"), "dx", t = 0.9)
      .collect().map(r => (r.getAs[Double]("emd"), r.getAs[Boolean]("t_close")))
    assert(loose.nonEmpty)
    loose.foreach { case (e, _) =>
      assert(e >= 0.0 && e <= 1.0, s"EMD out of bounds: $e")
    }
    val tight = Privacy.tCloseness(wide, Seq("zip", "gender"), "dx", t = 0.01)
      .collect().map(r => (r.getAs[Double]("emd"), r.getAs[Boolean]("t_close")))
    // same EMDs, only the flag moves; tightening t never flags FEWER
    assert(loose.map(_._1).sorted.toSeq == tight.map(_._1).sorted.toSeq)
    assert(tight.count(_._2) <= loose.count(_._2))
  }

  test("tCloseness excludes NULL sensitive mass (no rank on the ordered domain)") {
    // null dx rows must not shift any group's EMD, and an all-null
    // class must vanish from the report entirely
    val withNulls = rows
      .union(Seq(("02138", "f", null), ("02139", "m", null)).toDF("zip", "gender", "dx"))
      .union(Seq(("02141", "m", null), ("02141", "m", null)).toDF("zip", "gender", "dx"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("zip").collect().map(_.toSeq).toSeq
    assert(canon(Privacy.tCloseness(withNulls, Seq("zip", "gender"), "dx", t = 0.3))
      === canon(Privacy.tCloseness(rows, Seq("zip", "gender"), "dx", t = 0.3)))
    assert(Privacy.tCloseness(withNulls, Seq("zip", "gender"), "dx", t = 0.3)
      .filter(col("zip") === "02141").count() === 0)
  }

  test("lDiversity never counts NULL as a sensitive value") {
    val withNulls = rows
      .union(Seq(("02141", "m", null), ("02141", "m", null), ("02141", "m", null))
        .toDF("zip", "gender", "dx"))
    val r = Privacy.lDiversity(withNulls, Seq("zip", "gender"), "dx", k = 3L, l = 2L)
      .filter(col("zip") === "02141").collect().head
    // all-NULL class: k-anonymous by size, but zero diversity evidence
    assert(r.getAs[Long]("group_n") === 3L)
    assert(r.getAs[Long]("sensitive_l") === 0L)
    assert(!r.getAs[Boolean]("l_diverse"))
  }

  test("dpRelease noise shrinks as epsilon grows") {
    // same seed => same unit hash u per group; noise scales by 1/eps
    def maxErr(eps: Double): Double =
      Privacy.dpRelease(rows, Seq("zip", "gender"), eps,
        releaseThreshold = -100.0, seed = 7L, epoch = 1L)
        .collect().map { r =>
          val truth = Map(("02138", "f") -> 3.0, ("02139", "m") -> 2.0,
            ("02140", "f") -> 1.0)
          math.abs(r.getAs[Double]("noisy_n") - truth((r.getString(0), r.getString(1))))
        }.max
    assert(maxErr(10.0) < maxErr(1.0))
  }

  test("argument guards") {
    intercept[IllegalArgumentException](
      Privacy.kAnonymity(rows, Seq.empty, k = 3L))
    intercept[IllegalArgumentException](
      Privacy.kAnonymity(rows, Seq("zip"), k = 1L))
    intercept[IllegalArgumentException](
      Privacy.lDiversity(rows, Seq("zip"), "dx", k = 3L, l = 0L))
    intercept[IllegalArgumentException](
      Privacy.tCloseness(rows, Seq("zip"), "dx", t = 1.5))
    intercept[IllegalArgumentException](
      Privacy.dpRelease(rows, Seq("zip"), epsilon = 0.0,
        releaseThreshold = 1.0, seed = 1L, epoch = 1L))
    // a single-valued sensitive domain has no measurable closeness
    intercept[IllegalArgumentException](
      Privacy.tCloseness(rows.withColumn("one", lit("x")),
        Seq("zip"), "one", t = 0.2))
  }
}
