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

  test("argument guards") {
    intercept[IllegalArgumentException](
      Privacy.kAnonymity(rows, Seq.empty, k = 3L))
    intercept[IllegalArgumentException](
      Privacy.kAnonymity(rows, Seq("zip"), k = 1L))
    intercept[IllegalArgumentException](
      Privacy.lDiversity(rows, Seq("zip"), "dx", k = 3L, l = 0L))
  }
}
