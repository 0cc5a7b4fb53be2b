#!/usr/bin/env python3
"""PySpark smoke test for the engine's SQL surface.

The reference's audience is PySpark users (configs/requirements.txt in
the reference repo). This script drives the engine WITHOUT writing a
line of Scala: `spark.sql.extensions=graft.plans.GraftExtensions` makes
the SCD pipeline and the versioned table's snapshot / time-travel /
CDC / history reads available as SQL table functions, plus the native
scalar kernels (graft_dot, graft_minhash_sig32, ...).

Exercises end to end:
  1. graft_scd_employee_all / graft_scd_employee_current over the
     reference input CSVs, compared cell-for-cell against the
     reference's committed golden outputs;
  2. a VersionedTable round trip through pure SQL: snapshot read,
     time travel, CDC slice, DESCRIBE HISTORY;
  3. the SQL DML WRITE surface through pure spark.sql: INSERT INTO /
     OVERWRITE, DELETE, MERGE (upsert + delete branch), OPTIMIZE,
     VACUUM — the table is built and mutated without one py4j call.

Run from the repo root after `sbt compile`:
    python3 tools/pyspark_smoke.py
"""
import csv
import glob
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.path.join(REPO, "target", "scala-2.13", "classes")
REF = os.environ.get("GRAFT_REFERENCE", "/root/reference")


def build_session():
    from pyspark.sql import SparkSession
    return (SparkSession.builder
            .master("local[4]")
            .appName("graft_pyspark_smoke")
            .config("spark.driver.extraClassPath", CLASSES)
            .config("spark.executor.extraClassPath", CLASSES)
            .config("spark.sql.extensions", "graft.plans.GraftExtensions")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def golden(path_glob):
    rows, hdr = [], None
    for f in sorted(glob.glob(path_glob)):
        with open(f) as fh:
            r = list(csv.reader(fh))
            if not r:
                continue
            if hdr is None:
                hdr = r[0]
            assert r[0] == hdr, f"header mismatch in {f}"
            rows += [tuple(x) for x in r[1:]]
    return hdr, sorted(rows)


def frame_as_csv_rows(df):
    """Stringify a frame the way the CSV sink renders it (dates as
    yyyy-MM-dd under the UTC session, nulls as the NULL sentinel)."""
    from pyspark.sql import functions as F
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("NULL")).alias(c)
            for c in df.columns]
    return df.columns, sorted(tuple(r) for r in df.select(cols).collect())


def check_scd(spark):
    inp = tempfile.mkdtemp(prefix="graft_pysmoke_in_")
    for f in glob.glob(os.path.join(REF, "data", "input", "*.csv")):
        shutil.copy(f, inp)
    ok = True
    for name, fn in (("employee_all", "graft_scd_employee_all"),
                     ("employee_current", "graft_scd_employee_current")):
        got = spark.sql(f"SELECT * FROM {fn}('{inp}')")
        g_hdr, g_rows = golden(
            os.path.join(REF, "data", "output", name, "part-*.csv"))
        s_hdr, s_rows = frame_as_csv_rows(got)
        match = s_hdr == g_hdr and s_rows == g_rows
        ok &= match
        print(f"[scd] {name}: {'MATCH' if match else 'MISMATCH'} "
              f"({len(s_rows)} rows vs golden {len(g_rows)})")
        if not match and s_rows and g_rows:
            diff = [i for i, (a, b) in enumerate(zip(s_rows, g_rows))
                    if a != b][:1]
            for i in diff:
                print("  first diff:", s_rows[i], "vs", g_rows[i])
    return ok


def check_table(spark):
    root = tempfile.mkdtemp(prefix="graft_pysmoke_vt_") + "/t"
    # writes go through the JVM API via py4j one-liners (no Scala
    # AUTHORED by the user); every READ below is pure spark.sql
    jvm = spark._jvm
    vt = jvm.graft.sources.VersionedTable
    empty_seq = jvm.PythonUtils.toSeq([])
    star_seq = jvm.PythonUtils.toSeq(["*"])

    def commit(rows):
        df = spark.createDataFrame(rows, "id long, v long")
        vt.commit(df._jdf, root, False, star_seq, False, empty_seq,
                  100000, 0.01, empty_seq)

    commit([(1, 10), (2, 20)])
    commit([(3, 30)])
    ok = True

    def expect(sql, want, what):
        nonlocal ok
        got = sorted(tuple(r) for r in spark.sql(sql).collect())
        match = got == sorted(want)
        ok &= match
        print(f"[table] {what}: {'MATCH' if match else 'MISMATCH'} {got}")

    expect(f"SELECT id, v FROM graft_table_snapshot('{root}') ORDER BY id",
           [(1, 10), (2, 20), (3, 30)], "snapshot")
    expect(f"SELECT id, v FROM graft_table_snapshot('{root}', 0) ORDER BY id",
           [(1, 10), (2, 20)], "time travel")
    expect(f"SELECT id, v, _change_type, _commit_version "
           f"FROM graft_table_changes('{root}', 0, 1)",
           [(3, 30, "insert", 1)], "CDC slice")
    expect(f"SELECT version, operation, total_rows "
           f"FROM graft_table_history('{root}') ORDER BY version",
           [(0, "append", 2), (1, "append", 3)], "history")
    expect("SELECT CAST(graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) "
           "AS LONG) AS d", [(11,)], "native scalar kernel")
    return ok


def check_dml(spark):
    """The write surface, pure spark.sql end to end."""
    root = tempfile.mkdtemp(prefix="graft_pysmoke_dml_") + "/t"
    ok = True

    def expect(sql, want, what):
        nonlocal ok
        got = sorted(tuple(r) for r in spark.sql(sql).collect())
        match = got == sorted(want)
        ok &= match
        print(f"[dml] {what}: {'MATCH' if match else 'MISMATCH'} {got}")

    spark.sql("SELECT * FROM VALUES (1, 10), (2, 20), (3, 30) AS t(id, v)") \
        .createOrReplaceTempView("dml_seed")
    spark.sql(f"INSERT INTO graft.`{root}` SELECT * FROM dml_seed")
    spark.sql(f"DELETE FROM graft.`{root}` WHERE v >= 30")
    spark.sql(f"MERGE INTO graft.`{root}` AS t "
              "USING (SELECT * FROM VALUES (2, 21), (4, 40), (1, -1) "
              "AS s(id, v)) AS s ON t.id = s.id "
              "WHEN MATCHED AND s.v < 0 THEN DELETE "
              "WHEN MATCHED THEN UPDATE SET * "
              "WHEN NOT MATCHED THEN INSERT *")
    spark.sql(f"OPTIMIZE graft.`{root}`")
    spark.sql(f"VACUUM graft.`{root}` RETAIN 1 VERSIONS")
    # id 1 deleted by the merge tombstone, 2 updated, 3 deleted by
    # DELETE, 4 inserted
    expect(f"SELECT id, v FROM graft_table_snapshot('{root}') ORDER BY id",
           [(2, 21), (4, 40)], "insert+delete+merge+optimize+vacuum")
    spark.sql(f"INSERT OVERWRITE graft.`{root}` "
              "SELECT id, v * 100 AS v FROM dml_seed WHERE id = 1")
    expect(f"SELECT id, v FROM graft_table_snapshot('{root}')",
           [(1, 1000)], "insert overwrite")
    return ok


def main():
    if not os.path.isdir(CLASSES):
        sys.exit(f"compiled classes not found at {CLASSES}; run sbt compile")
    spark = build_session()
    try:
        ok = check_scd(spark)
        ok &= check_table(spark)
        ok &= check_dml(spark)
    finally:
        spark.stop()
    print("[pyspark-smoke]", "ALL GREEN" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
