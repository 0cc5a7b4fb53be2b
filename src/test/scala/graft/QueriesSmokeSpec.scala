package graft

/** Every registered query runs at sf0.001 and yields rows; every query
  * with an oracle has matching column names (the driver's compare sorts
  * columns by name, so a mismatch is an automatic hash fail).
  */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  Queries.all.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a query") {
    val missing = Queries.oracles.keySet -- Queries.all.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
