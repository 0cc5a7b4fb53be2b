package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for the registered
  * queries (usage: runMain graft.Explain [queryName ...]).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      Queries.all(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
