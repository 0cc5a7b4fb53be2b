package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-enforced JSONL ingestion with corrupt-record quarantine.
  *
  * The CSV path ([[CsvSnapshots]]) FAILFASTs: one bad row aborts the
  * load, correct for curated snapshot drops. Web-scale document feeds
  * invert the tradeoff — a 100 TB crawl WILL contain malformed lines,
  * and neither aborting (lose the batch) nor PERMISSIVE-with-nulls
  * (silently corrupt the corpus) is acceptable. This reader parses in
  * PERMISSIVE mode, splits on the corrupt-record marker, quarantines
  * the raw bad lines (verbatim, with source-file provenance) to a side
  * sink for offline inspection/replay, and returns only rows that
  * parsed against the declared schema.
  *
  * One scan feeds both outputs (the split is a cached filter, not a
  * re-read); quarantine writes are append-mode so repeated batches
  * accumulate an audit trail.
  */
object JsonLines {

  final case class QuarantineResult(good: DataFrame, quarantined: Long)

  val CorruptCol = "_corrupt_record"

  /** @param schema declared schema of valid rows (do NOT include the
    *               corrupt-record column; it is managed here)
    * @param quarantineDir where raw bad lines land (parquet: raw_line,
    *                      source_file), append-mode
    */
  def readWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType,
      quarantineDir: String): QuarantineResult = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol")
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      // Spark refuses a filter on only the corrupt column over a lazy
      // scan (it could prune the data columns the parser needs); cache
      // materializes the parse once for both branches
      .cache()
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(
        col(CorruptCol).as("raw_line"),
        input_file_name().as("source_file"))
    val quarantined = bad.count()
    if (quarantined > 0) {
      bad.write.mode(SaveMode.Append).parquet(quarantineDir)
    }
    // `good` keeps referencing the cache (LRU-evicted when unused);
    // callers doing repeated loads can unpersist once consumed
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    QuarantineResult(good, quarantined)
  }
}
