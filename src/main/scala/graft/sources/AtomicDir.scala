package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory replacement for single-writer tables.
  *
  * A naive delete-then-rename has a window where the destination does
  * not exist: a driver crash there permanently loses the table (the new
  * data sits unread in the temp dir and, for incremental pipelines, the
  * next run bootstraps from empty). The protocol here never leaves the
  * data unreachable:
  *
  *   1. writer produces `.<dest>.__tmp__` (a hidden sibling)
  *   2. existing `<dest>` is renamed to `.<dest>.__old__`
  *   3. `.<dest>.__tmp__` is renamed to `<dest>`
  *   4. `.<dest>.__old__` is deleted
  *
  * Staging names are dot-prefixed because Spark's file index skips
  * paths starting with `.` or `_`: when `dest` is a partition directory
  * inside a table root (e.g. `snapshot_date=X`), a concurrent
  * whole-table reader doing partition discovery mid-swap must not see
  * `snapshot_date=X.__tmp__` as a spurious partition with an
  * unparseable value.
  *
  * [[recover]] (called before every read) repairs any crash window:
  * missing dest + present old → restore old (a tmp may or may not be
  * complete; the old version is the known-good one). Stale tmp/old
  * left by a crash after step 3 are cleaned up.
  */
object AtomicDir {

  private def hiddenSibling(dest: Path, suffix: String): Path =
    new Path(dest.getParent, "." + dest.getName + suffix)
  def tmpPath(dest: Path): Path = hiddenSibling(dest, ".__tmp__")
  def oldPath(dest: Path): Path = hiddenSibling(dest, ".__old__")

  /** Swap the written tmp dir into place (steps 2-4). */
  def commit(fs: FileSystem, dest: Path): Unit = {
    val tmp = tmpPath(dest)
    val old = oldPath(dest)
    fs.delete(old, true)
    if (fs.exists(dest) && !fs.rename(dest, old))
      throw new java.io.IOException(s"rename $dest -> $old failed")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
    fs.delete(old, true)
  }

  /** Repair an interrupted [[commit]]; call before reading `dest`. */
  def recover(fs: FileSystem, dest: Path): Unit = {
    val old = oldPath(dest)
    if (!fs.exists(dest) && fs.exists(old)) {
      if (!fs.rename(old, dest))
        throw new java.io.IOException(s"recovery rename $old -> $dest failed")
    }
    // dest present (or restored): anything else is leftover
    if (fs.exists(dest)) {
      fs.delete(oldPath(dest), true)
      fs.delete(tmpPath(dest), true)
    }
  }
}
