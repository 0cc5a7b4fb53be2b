package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.Scd

/** SCD invariants on randomized generated histories (SURVEY.md §5.3-3).
  * Hand-rolled generator with fixed seeds: entities appear/change/
  * disappear across a date pool; invariants are checked independently
  * of the windowed implementation.
  */
case class Snap(snapshot_date: Date, entity: Int, value: String)

class ScdPropertySpec extends SparkSpec {
  import spark.implicits._

  private def genHistory(seed: Int): Seq[Snap] = {
    val rnd = new scala.util.Random(seed)
    val dates = (1 to 2 + rnd.nextInt(6)).map(d => Date.valueOf(f"2023-01-$d%02d"))
    val entities = 1 to (2 + rnd.nextInt(15))
    for {
      e <- entities
      firstIdx = rnd.nextInt(dates.size)
      lastIdx = firstIdx + rnd.nextInt(dates.size - firstIdx)
      (d, i) <- dates.zipWithIndex
      if i >= firstIdx && i <= lastIdx
      // values repeat with p~0.6 to create No Change runs, change with
      // p~0.4, occasionally revert to an earlier value (hash reuse)
    } yield Snap(d, e, s"v${rnd.nextInt(3)}")
  }

  private def runScd(rows: Seq[Snap]) =
    rows.toDF()
      .transform(Scd.addRowHash(exclude = Seq("snapshot_date")))
      .transform(Scd.changeStatus(entityCols = Seq("entity")))
      .collect()
      .map(r => (
        r.getAs[Date]("snapshot_date"),
        r.getAs[Int]("entity"),
        r.getAs[String]("value"),
        r.getAs[String]("change_status"),
        r.getAs[Date]("changed_status_date")))

  test("SCD invariants hold across 15 random histories") {
    for (seed <- 1 to 15) {
      val rows = genHistory(seed)
      val got = runScd(rows)
      val byEntity = got.groupBy(_._2)
      val globalMax = rows.map(_.snapshot_date.toLocalDate).max

      assert(got.length == rows.size, s"seed=$seed row count")
      assert(!got.exists(_._4 == "Unknown"), s"seed=$seed Unknown reachable")

      byEntity.foreach { case (e, ers) =>
        val sorted = ers.sortBy(_._1.toLocalDate.toEpochDay)
        // 1. first row is New, and only the first row is New
        assert(sorted.head._4 == "New", s"seed=$seed entity=$e first not New")
        assert(sorted.tail.forall(_._4 != "New"), s"seed=$seed entity=$e extra New")
        // 2. Deleted appears only on the last row, iff the entity is
        //    absent from the final snapshot AND has more than one row —
        //    the reference's when-chain is first-branch-wins
        //    (create_employee_all.py:128-134), so a single-row vanished
        //    entity is labeled New, not Deleted.
        val deleted = sorted.filter(_._4 == "Deleted")
        val lastDate = sorted.last._1.toLocalDate
        if (lastDate != globalMax && sorted.length > 1) {
          assert(deleted.length == 1 && sorted.last._4 == "Deleted",
            s"seed=$seed entity=$e vanished but not Deleted")
          assert(deleted.head._5 == sorted.last._1,
            s"seed=$seed entity=$e Deleted changed_status_date")
        } else {
          assert(deleted.isEmpty, s"seed=$seed entity=$e unexpected Deleted")
        }
        // 3. Changed/No Change match value transitions
        sorted.sliding(2).foreach {
          case Array(prev, cur) if cur._4 != "Deleted" =>
            val expected = if (prev._3 == cur._3) "No Change" else "Changed"
            assert(cur._4 == expected,
              s"seed=$seed entity=$e ${cur._1}: ${cur._4} != $expected")
          case _ =>
        }
        // 4. corrected-mode changed_status_date = start of the current
        //    constant-value run (for non-Deleted rows)
        sorted.zipWithIndex.filter(_._1._4 != "Deleted").foreach { case (row, i) =>
          val runStart = (0 to i).reverse
            .takeWhile(j => sorted(j)._3 == row._3)
            .last
          assert(row._5 == sorted(runStart)._1,
            s"seed=$seed entity=$e ${row._1}: island start ${row._5} != ${sorted(runStart)._1}")
        }
      }

      // 5. latestSnapshot: exactly one row per entity, stamped global max
      val current = rows.toDF()
        .transform(Scd.addRowHash(exclude = Seq("snapshot_date")))
        .transform(Scd.changeStatus(entityCols = Seq("entity")))
        .transform(Scd.latestSnapshot(entityCols = Seq("entity")))
      val cur = current.collect()
      assert(cur.length == byEntity.size, s"seed=$seed current row count")
      assert(cur.forall(_.getAs[Date]("snapshot_date").toLocalDate == globalMax),
        s"seed=$seed current not stamped to global max")
    }
  }
}
