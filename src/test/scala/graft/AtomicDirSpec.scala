package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import graft.sources.AtomicDir

class AtomicDirSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def mkdirWithMarker(p: Path, marker: String): Unit = {
    fs.mkdirs(p)
    fs.create(new Path(p, marker)).close()
  }

  test("commit replaces the destination and cleans up") {
    val work = Files.createTempDirectory("atomic").toString
    val dest = new Path(s"$work/table")
    mkdirWithMarker(dest, "v1")
    mkdirWithMarker(AtomicDir.tmpPath(dest), "v2")
    AtomicDir.commit(fs, dest)
    assert(fs.exists(new Path(dest, "v2")))
    assert(!fs.exists(AtomicDir.tmpPath(dest)))
    assert(!fs.exists(AtomicDir.oldPath(dest)))
  }

  test("staging paths are hidden from Spark partition discovery") {
    val dest = new Path("/t/snapshot_date=2024-01-01")
    // Spark's file index skips names starting with '.' or '_': a
    // concurrent whole-table reader mid-swap must not list staging
    // dirs as spurious partitions.
    assert(AtomicDir.tmpPath(dest).getName.startsWith("."))
    assert(AtomicDir.oldPath(dest).getName.startsWith("."))
    assert(AtomicDir.tmpPath(dest).getParent === dest.getParent)
  }

  test("recover restores the old version after a crash mid-swap") {
    val work = Files.createTempDirectory("atomic").toString
    val dest = new Path(s"$work/table")
    // simulate: dest was renamed to __old__, then the process died
    // before tmp -> dest
    mkdirWithMarker(AtomicDir.oldPath(dest), "v1")
    mkdirWithMarker(AtomicDir.tmpPath(dest), "v2-incomplete")
    AtomicDir.recover(fs, dest)
    assert(fs.exists(new Path(dest, "v1")), "old version not restored")
    assert(!fs.exists(AtomicDir.tmpPath(dest)), "stale tmp not cleaned")
  }

  test("recover after a completed swap only cleans leftovers") {
    val work = Files.createTempDirectory("atomic").toString
    val dest = new Path(s"$work/table")
    mkdirWithMarker(dest, "v2")
    mkdirWithMarker(AtomicDir.oldPath(dest), "v1")
    AtomicDir.recover(fs, dest)
    assert(fs.exists(new Path(dest, "v2")))
    assert(!fs.exists(AtomicDir.oldPath(dest)))
  }

  test("recover on a clean state is a no-op") {
    val work = Files.createTempDirectory("atomic").toString
    val dest = new Path(s"$work/table")
    mkdirWithMarker(dest, "v1")
    AtomicDir.recover(fs, dest)
    assert(fs.exists(new Path(dest, "v1")))
  }
}
