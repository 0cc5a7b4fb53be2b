package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Measurement tooling for the optimization rounds (guide §1): runs one
  * or more SparkEntry queries under a listener that attributes wall
  * time to Spark JOBS (with their call sites) and aggregates stage-level
  * shuffle/input metrics, so "this query takes 4 s" decomposes into
  * "23 jobs, of which the stats scan is 1.1 s and the merge join 0.9 s".
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.QueryProfiler q_table_partition'
  *
  * Output (stderr): per-job lines `jobId elapsed callSite`, then a
  * summary: total job time vs wall time (the gap = driver-side work),
  * shuffle bytes, peak stage task counts.
  */
object QueryProfiler {

  final case class JobRec(id: Int, desc: String, site: String,
      var started: Long = 0L, var finished: Long = 0L,
      var stages: Int = 0)

  final case class StageRec(id: Int, name: String, var tasks: Int = 0,
      var runMs: Long = 0L, var gcMs: Long = 0L, var cpuMs: Long = 0L,
      var deserMs: Long = 0L, var wall: Long = 0L)

  private class L extends SparkListener {
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stages = mutable.LinkedHashMap.empty[Int, StageRec]
    var shuffleRead = 0L
    var shuffleWrite = 0L
    var inputBytes = 0L
    var tasks = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val site = j.stageInfos.lastOption.map(_.name.linesIterator.next()
        .take(70)).getOrElse("")
      val desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs(j.jobId) = JobRec(j.jobId, desc, site,
        started = j.time, stages = j.stageIds.size)
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      jobs.get(j.jobId).foreach(_.finished = j.time)
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val si = s.stageInfo
      val rec = stages.getOrElseUpdate(si.stageId,
        StageRec(si.stageId, si.name.linesIterator.next().take(70)))
      rec.wall = (for {a <- si.completionTime; b <- si.submissionTime}
        yield a - b).getOrElse(0L)
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks += 1
      val rec = stages.getOrElseUpdate(t.stageId, StageRec(t.stageId, "?"))
      rec.tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        rec.runMs += m.executorRunTime
        rec.gcMs += m.jvmGCTime
        rec.cpuMs += m.executorCpuTime / 1000000L
        rec.deserMs += m.executorDeserializeTime
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        inputBytes += m.inputMetrics.bytesRead
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_scan_filter_project")
    val spark = Bench.buildSession()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm pass: JIT, footer caches — mirrors the bench's min-of-N
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val l = new L
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // let straggling listener events drain before reading: poll until
      // every started job has its end event (fixed sleeps undercount on
      // a loaded machine), with a bounded timeout
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (l.jobs.values.exists(_.finished == 0L) &&
          System.nanoTime() < deadline)
        Thread.sleep(20)
      spark.sparkContext.removeSparkListener(l)
      val err = System.err
      err.println(f"== $name wall=$wall%.3f s jobs=${l.jobs.size} tasks=${l.tasks}")
      val jobTotal = l.jobs.values.map(j =>
        (j.finished - j.started).max(0L)).sum / 1e3
      err.println(f"   job-time sum=$jobTotal%.3f s  (wall - jobs = driver/gaps " +
        f"= ${wall - jobTotal}%.3f s)")
      err.println(f"   input=${l.inputBytes / 1e6}%.1f MB " +
        f"shufW=${l.shuffleWrite / 1e6}%.1f MB shufR=${l.shuffleRead / 1e6}%.1f MB")
      l.jobs.values.toSeq.sortBy(j => -(j.finished - j.started)).take(30)
        .foreach { j =>
          val el = (j.finished - j.started).max(0L) / 1e3
          val what = if (j.desc.nonEmpty) j.desc else j.site
          err.println(f"   job ${j.id}%4d ${el}%7.3f s  stages=${j.stages}%2d  $what")
        }
      l.stages.values.toSeq.sortBy(-_.wall).take(15).foreach { s =>
        err.println(f"   stage ${s.id}%4d wall=${s.wall / 1e3}%7.3f s tasks=${s.tasks}%3d " +
          f"run=${s.runMs / 1e3}%7.3f cpu=${s.cpuMs / 1e3}%7.3f gc=${s.gcMs / 1e3}%6.3f " +
          f"deser=${s.deserMs / 1e3}%6.3f  ${s.name}")
      }
    }
    spark.stop()
  }
}
