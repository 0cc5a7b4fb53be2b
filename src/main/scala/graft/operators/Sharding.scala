package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic global shuffle + shard assignment — the export step
  * that turns a curated corpus into training shards read sequentially
  * by data loaders.
  *
  * Training wants examples in an order that is (a) pseudo-random —
  * no source/time runs, (b) reproducible — the same seed yields the
  * same order on any cluster layout or engine, and (c) addressable —
  * (shard, position) identifies an example forever. `orderBy(rand())`
  * fails (b); zipWithIndex after a sort fails (c) under retries.
  *
  * Here order IS the portable sha-256 hash of (seed, id)
  * ([[TextFunctions.portableHash32]] — the same construction the
  * sampling and minhash families use): `shard = hash mod numShards`,
  * `position = row_number` within the shard ordered by (hash, id).
  * One shuffle on the shard key; each shard sorts independently
  * (~N/numShards rows), so the sort never concentrates. Re-seeding
  * re-shuffles globally; the DuckDB oracle replays every assignment.
  */
object Sharding {

  /** Assign `shard` and 1-based `shard_pos` to every row. The (hash,
    * id) ordering is total (id unique ⇒ ties broken), so positions
    * are deterministic even across hash collisions.
    */
  def shardAssign(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      seed: Long): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    // 32 uniform non-negative bits, so plain mod is already in range.
    val h = TextFunctions.portableHash32(
      concat_ws(":", lit(seed), col(idCol).cast("string")))
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % numShards).cast("long"))
      .withColumn("shard_pos",
        row_number().over(
          Window.partitionBy("shard").orderBy(col("__h"), col(idCol)))
          .cast("long"))
      .drop("__h")
  }

  /** Write-side companion: repartition to exactly one output file per
    * shard with rows in shard order, ready for
    * `write.partitionBy("shard")`. Kept separate from [[shardAssign]]
    * so the assignment stays a pure, oracle-checkable projection.
    */
  def shardLayout(assigned: DataFrame): DataFrame =
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))

  /** Export an assigned corpus as `outDir/corpus/shard=N` plus a
    * one-file `outDir/manifest` — the index a data loader reads before
    * touching any shard: per shard its row count, max position
    * (== row count iff positions are contiguous), optional token
    * total, and an order-independent id checksum (sum of the portable
    * id hashes, overflow-wrapping — layout changes can't move it,
    * corpus changes can't keep it). The whole tree stages through
    * [[graft.sources.AtomicDir]]: a crash mid-export or a concurrent
    * reader never sees a corpus without its manifest or a manifest for
    * a half-written corpus.
    */
  def writeShards(
      assigned: DataFrame,
      idCol: String,
      outDir: String,
      tokenCountCol: Option[String] = None): Unit = {
    import graft.sources.AtomicDir
    val spark = assigned.sparkSession
    val dest = new org.apache.hadoop.fs.Path(outDir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = AtomicDir.tmpPath(dest)
    fs.delete(tmp, true)
    shardLayout(assigned).write.mode("overwrite").partitionBy("shard")
      .parquet(new org.apache.hadoop.fs.Path(tmp, "corpus").toString)
    val tokenAgg = tokenCountCol
      .map(c => sum(col(c)).cast("long"))
      .getOrElse(lit(null).cast("long"))
    assigned
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        max("shard_pos").as("max_pos"),
        tokenAgg.as("n_tokens"),
        sum(TextFunctions.portableHash32(col(idCol).cast("string")))
          .cast("long").as("id_checksum"))
      .coalesce(1) // numShards rows by construction
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(tmp, "manifest").toString)
    AtomicDir.commit(fs, dest)
  }

  /** Load a [[writeShards]] export: (corpus, manifest). Repairs an
    * interrupted export first.
    */
  def readShards(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    import graft.sources.AtomicDir
    val dest = new org.apache.hadoop.fs.Path(dir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicDir.recover(fs, dest)
    (spark.read.parquet(new org.apache.hadoop.fs.Path(dest, "corpus").toString),
      spark.read.parquet(new org.apache.hadoop.fs.Path(dest, "manifest").toString))
  }
}
