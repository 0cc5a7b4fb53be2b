package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The scale-generator invariants the soak gate leans on — above all
  * the r12 advisory's finding: customer replication must NOT grow the
  * record-linkage blocks (`substring(c_name, 15, 4)`), or the soaked
  * linkage measures either a quadratic blow-up or a silently
  * `maxBlock`-truncated join instead of the constant-selectivity
  * claim.
  */
class SoakGenSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def blockSizes(df: DataFrame): DataFrame =
    df.groupBy(substring(col("c_name"), 15, 4).as("b"))
      .agg(count(lit(1)).as("n"))

  test("customer replicas keep linkage block sizes EXACTLY base-sized") {
    val base = spark.read.parquet(s"$sf/customer.parquet")
    val scaled = (0 until 7).map(SoakGen.replica(base, "customer", _))
      .reduce(_ unionByName _)
    val baseMax = blockSizes(base).agg(max("n")).collect().head.getLong(0)
    val Array(row) = blockSizes(scaled)
      .agg(max("n").as("mx"), count(lit(1)).as("blocks")).collect()
    // disjoint per-replica key spaces: block COUNT multiplies by the
    // factor, block SIZE does not move at all
    assert(row.getLong(0) === baseMax,
      s"scaled max block ${row.getLong(0)} != base $baseMax — replicas collide")
    assert(row.getLong(1) ===
      7L * blockSizes(base).count(), "block keys collided across replicas")
  }

  test("the block recode is injective: (replica, last4) recoverable, length fixed") {
    val base = spark.read.parquet(s"$sf/customer.parquet")
    val scaled = (0 until 3).map(SoakGen.replica(base, "customer", _))
      .reduce(_ unionByName _)
    // every name keeps the 18-char layout the linkage substr()s assume
    assert(scaled.filter(length(col("c_name")) =!= 18).count() === 0)
    // c_custkey still decodes the block: base36(key%10^4 + replica·10^4)
    val bad = scaled.filter(
      substring(col("c_name"), 15, 4) =!=
        lpad(lower(conv(((col("c_custkey") % SoakGen.IdOffset) % 10000L +
          (col("c_custkey") / SoakGen.IdOffset) * 10000L).cast("string"),
          10, 36)), 4, "0")).count()
    assert(bad === 0)
  }

  test("replica 0 is recoded too — raw digit blocks would collide with base36") {
    // 46656 = "1000" in base36: an r>=1 code CAN be all-digit, so raw
    // replica-0 digits are not a safe disjoint space
    import spark.implicits._
    val demo = Seq((46656L % 10000L, 4L)).toDF("last4", "r")
      .select(lpad(lower(conv((col("last4") + col("r") * 10000L).cast("string"),
        10, 36)), 4, "0").as("code")).collect().head.getString(0)
    assert(demo === "1000")
    val base = spark.read.parquet(s"$sf/customer.parquet")
    val r0 = SoakGen.replica(base, "customer", 0)
    assert(r0.filter(substring(col("c_name"), 15, 4) =!=
      lpad(lower(conv((col("c_custkey") % 10000L).cast("string"), 10, 36)),
        4, "0")).count() === 0)
  }
}
