package graft

import java.nio.file.Files
import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sources.AtomicDir
import graft.streaming.StreamingEnrich

class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("each micro-batch joins against the freshest atomically-swapped dimension") {
    implicit val sql = spark.sqlContext
    val dimPath = Files.createTempDirectory("enrich").toString + "/dim"
    val fs = new Path(dimPath).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def publishDim(rows: Seq[(Long, String)]): Unit = {
      // the batch SCD job's contract: write tmp, atomic swap
      rows.toDF("user_id", "segment").coalesce(1)
        .write.mode("overwrite").parquet(AtomicDir.tmpPath(new Path(dimPath)).toString)
      AtomicDir.commit(fs, new Path(dimPath))
    }

    publishDim(Seq((1L, "bronze"), (2L, "silver")))

    val mem = MemoryStream[(Long, Long)]
    val events = mem.toDF().toDF("event_id", "user_id")
    val seen = mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = StreamingEnrich.enrichedWriter(
      events, dimPath, Seq("user_id"),
      (batch, _) => seen.synchronized {
        seen ++= batch.select("event_id", "user_id", "segment")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      }).start()
    try {
      mem.addData((100L, 1L))
      q.processAllAvailable()
      // dimension updates between batches
      publishDim(Seq((1L, "gold"), (2L, "silver")))
      mem.addData((101L, 1L), (102L, 3L))
      q.processAllAvailable()
    } finally q.stop()

    val bySeen = seen.toSeq.sortBy(_._1)
    assert(bySeen == Seq(
      (100L, 1L, "bronze"), // batch 1: old dimension
      (101L, 1L, "gold"),   // batch 2: swapped dimension
      (102L, 3L, null)))    // left join: unknown user passes through
  }
}
