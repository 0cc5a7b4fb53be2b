package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Model-based property gate for the table format: random sequences of
  * EVERY mutating operation (append, merge upsert with tombstones,
  * rewrite delete, vectored delete, replaceWhere, partial + whole
  * compaction, vector purge, stats analyze) run against one table
  * while a driver-side `Map[Long, Long]` model applies the same
  * semantics; after every step the live snapshot must equal the model
  * exactly, and where metadata-only counts are available they must
  * agree too. The single-op specs pin each operator's contract; THIS
  * spec pins their COMPOSITION — the interleavings a real pipeline
  * produces (merge over vectored-dead rows, purge after replace,
  * analyze over a mixed-stats lineage) that no single-op case covers.
  *
  * Deterministic seeds: failures replay exactly.
  */
class VersionedTableModelSpec extends SparkSpec {
  import spark.implicits._

  private val Seeds = Seq(11L, 23L, 37L, 58L)
  private val StepsPerSeed = 14

  private def snapshot(root: String): Map[Long, Long] =
    VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random op sequences match the reference model at every step") {
    Seeds.foreach(runSeed)
  }

  test("the same op sequences hold with manifest checkpointing active") {
    // every version JSON past 2 files becomes a checkpoint delta and
    // a fresh checkpoint rotates every 3 commits — the composition
    // gate re-run through the 100k-file log shape
    spark.conf.set("spark.graft.manifest.checkpointThreshold", "2")
    spark.conf.set("spark.graft.manifest.checkpointInterval", "3")
    try Seeds.take(2).foreach(runSeed)
    finally {
      spark.conf.unset("spark.graft.manifest.checkpointThreshold")
      spark.conf.unset("spark.graft.manifest.checkpointInterval")
    }
  }

  private def runSeed(seed: Long): Unit = {
    {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_vt_model_$seed").toString
      // base: ids 0..49, v = id * 10, three files, stats on
      var model: Map[Long, Long] =
        (0L until 50L).map(i => i -> i * 10L).toMap
      VersionedTable.commit(
        model.toSeq.toDF("id", "v").repartitionByRange(3, col("id"))
          .sortWithinPartitions("id"),
        root, statsColumns = Seq("*"))
      var nextId = 1000L

      (1 to StepsPerSeed).foreach { step =>
        val op = rnd.nextInt(13)
        val ids = model.keys.toSeq.sorted
        def someId(): Long =
          if (ids.isEmpty) 0L else ids(rnd.nextInt(ids.size))
        op match {
          case 0 => // append fresh rows
            val fresh = (0 until 1 + rnd.nextInt(3)).map { _ =>
              val id = nextId; nextId += 1; id -> (id * 10L)
            }
            VersionedTable.commit(fresh.toDF("id", "v"), root,
              statsColumns = Seq("*"))
            model = model ++ fresh
          case 1 => // merge: update one, insert one, tombstone one
            val up = someId()
            val ins = { val id = nextId; nextId += 1; id }
            val del = someId()
            if (up != del) { // equal draws would be a non-unique source
              val src = Seq((up, up * 100L, "U"), (ins, ins * 10L, "U"),
                (del, 0L, "D")).toDF("id", "v", "op")
              VersionedTable.merge(spark, root, src, Seq("id"),
                deleteMatched = Some(col("op") === "D"))
              model = (model - del) + (up -> up * 100L) + (ins -> ins * 10L)
            }
          case 2 => // rewrite delete of an id range
            val lo = someId()
            val hi = lo + 5L
            VersionedTable.delete(spark, root,
              col("id") >= lo && col("id") <= hi)
            model = model.filter { case (k, _) => k < lo || k > hi }
          case 3 => // vectored delete of a value slice
            val lo = someId()
            VersionedTable.deleteVectored(spark, root,
              col("id") >= lo && col("id") < lo + 3L)
            model = model.filter { case (k, _) => k < lo || k >= lo + 3L }
          case 4 => // replaceWhere an id range with re-derived rows
            val lo = someId()
            val pred = col("id") >= lo && col("id") < lo + 4L
            val repl = model.toSeq
              .filter { case (k, _) => k >= lo && k < lo + 4L }
              .map { case (k, _) => (k, k + 7L) }
            VersionedTable.replaceWhere(spark, root,
              repl.toDF("id", "v"), pred)
            model = model.filter { case (k, _) => k < lo || k >= lo + 4L } ++
              repl
          case 5 => // whole-table compact (also purges vectors)
            VersionedTable.compact(spark, root,
              targetPartitions = 1 + rnd.nextInt(3))
          case 6 => // partial compact of up to 2 files
            val m = VersionedTable.manifest(spark, root,
              VersionedTable.latestVersion(spark, root).get)
            val pick = rnd.shuffle(m.files).take(1 + rnd.nextInt(2))
            VersionedTable.compactFiles(spark, root, pick)
          case 7 => // targeted vector purge
            VersionedTable.purgeVectors(spark, root)
          case 8 => // unstatted append, then analyze backfill
            val fresh = { val id = nextId; nextId += 1; Seq(id -> id * 10L) }
            VersionedTable.commit(fresh.toDF("id", "v"), root)
            VersionedTable.analyzeStats(spark, root)
            model = model ++ fresh
          case 9 => // metadata-only rename round trip: reads, writes
            // and pruning must hold while the column map is LIVE
            VersionedTable.renameColumn(spark, root, "v", "w")
            val viaMap = VersionedTable.read(spark, root)
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            assert(viaMap === model,
              s"seed $seed step $step: mapped read diverged")
            VersionedTable.renameColumn(spark, root, "w", "v")
          case 10 => // predicate-scoped OPTIMIZE of an id range
            val lo = someId()
            VersionedTable.compactWhere(spark, root,
              col("id") >= lo && col("id") < lo + 10L)
          case 11 => // CHECK constraint round trip: install (every
            // committed value satisfies it), refuse a poisoned
            // append — which must commit NOTHING — then drop
            VersionedTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
            intercept[VersionedTable.ConstraintViolationException] {
              VersionedTable.commit(Seq((nextId, -5L)).toDF("id", "v"),
                root, statsColumns = Seq("*"))
            }
            assert(snapshot(root) === model,
              s"seed $seed step $step: refused write leaked rows")
            VersionedTable.dropConstraint(spark, root, "v_nonneg")
          case 12 => // shallow clone: branch, diverge the branch, the
            // SOURCE must not move (and the branch sees model + delta)
            if (VersionedTable.manifest(spark, root,
                VersionedTable.latestVersion(spark, root).get)
                .dvs.nonEmpty)
              VersionedTable.purgeVectors(spark, root)
            val branch = java.nio.file.Files
              .createTempDirectory(s"graft_vt_model_clone_$seed").toString +
              "/b"
            VersionedTable.cloneTable(spark, root, branch)
            val cloneGot = VersionedTable.read(spark, branch)
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            assert(cloneGot === model,
              s"seed $seed step $step: clone snapshot diverged at birth")
            val extra = { val id = nextId; nextId += 1; Seq(id -> id * 10L) }
            VersionedTable.commit(extra.toDF("id", "v"), branch,
              statsColumns = Seq("*"))
            val branchGot = VersionedTable.read(spark, branch)
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            assert(branchGot === model ++ extra,
              s"seed $seed step $step: diverged clone lost rows")
            // the branch's append must be INVISIBLE to the source
            // (asserted by the step-end snapshot === model below)
        }
        val got = snapshot(root)
        assert(got === model,
          s"seed $seed step $step op $op: table diverged from model " +
            s"(extra ${(got.keySet -- model.keySet).toSeq.sorted.take(5)}, " +
            s"missing ${(model.keySet -- got.keySet).toSeq.sorted.take(5)})")
        VersionedTable.rowCount(spark, root).foreach { n =>
          assert(n === model.size.toLong,
            s"seed $seed step $step op $op: metadata count $n != " +
              s"model ${model.size}")
        }
      }
      // end of sequence: a full compact + vacuum leaves a clean,
      // exportable table that still equals the model
      VersionedTable.compact(spark, root, targetPartitions = 2)
      // the commit log agrees with the model where stats are known
      val hist = VersionedTable.history(spark, root)
        .orderBy(col("version").desc).limit(1).collect().head
      if (!hist.isNullAt(hist.fieldIndex("total_rows")))
        assert(hist.getAs[Long]("total_rows") === model.size.toLong,
          s"seed $seed: history total_rows diverged")
      VersionedTable.vacuum(spark, root, keepVersions = 1)
      assert(snapshot(root) === model, s"seed $seed: post-vacuum divergence")
      VersionedTable.exportSnapshot(spark, root)
    }
  }
}
