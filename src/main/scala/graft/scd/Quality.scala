package graft.scd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-time data-quality gates, mirroring the reference's `test_DF`
  * (/root/reference/jobs/create_employee_all.py:158-180):
  *
  *   1. exact schema equality vs the profile, INCLUDING nullability;
  *   2. non-empty result;
  *   3. key uniqueness (groupBy(keys).count > 1 must be empty).
  *
  * Unlike the reference — which re-executes the full plan for each gate
  * and again for the write — callers should `cache()` the DataFrame once
  * before gating (see [[EmployeeDimJob]]); the two count actions and the
  * write then reuse the materialized data.
  */
object Quality {

  def check(df: DataFrame, profile: TableProfile): Unit = {
    if (df.schema != profile.schema)
      throw new DataQualityException(
        s"Schemas don't match.\n  got:      ${df.schema.treeString}\n  expected: ${profile.schema.treeString}")
    // Single pass: total count and duplicate-key count in one aggregation
    // over the cached data (the reference runs two separate jobs).
    val stats = df
      .groupBy(profile.keys.map(col): _*)
      .count()
      .agg(
        coalesce(sum("count"), lit(0L)).as("rows"),
        count(when(col("count") > 1, 1)).as("dup_keys"))
      .head()
    if (stats.getLong(0) == 0L)
      throw new DataQualityException("Zero rows")
    if (stats.getLong(1) > 0L)
      throw new DataQualityException(
        s"Key uniqueness violated on (${profile.keys.mkString(", ")}): ${stats.getLong(1)} duplicate keys")
  }
}
