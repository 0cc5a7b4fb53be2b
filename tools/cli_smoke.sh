#!/usr/bin/env bash
# End-to-end CLI proof for the user-facing entry point: run the packaged
# EmployeeDimJob (sbt runMain — the spark-submit-equivalent main) against
# the reference repo's input CSVs into a scratch dir, then diff both
# output tables against the reference goldens cell-for-cell (canonical
# sort; headers must match too) and check input archival.
#
# Usage: tools/cli_smoke.sh [workdir]   (default /tmp/scdrun)
set -euo pipefail

WORK="${1:-/tmp/scdrun}"
REF="${GRAFT_REF_DIR:-/root/reference}"

rm -rf "$WORK"
mkdir -p "$WORK/input"
cp "$REF"/data/input/*.csv "$WORK/input/"

sbt -batch "runMain graft.scd.EmployeeDimJob $WORK/input $WORK/output" \
  > "$WORK/job.log" 2>&1 || { tail -40 "$WORK/job.log"; exit 1; }
# NB: no "[success]" grep — `run / outputStrategy := StdoutOutput`
# (the bench stdout contract) forwards only the forked JVM's output,
# so sbt's summary line no longer lands in the redirected log. The
# exit code above catches run failures; silent-output failures are
# caught by the golden diff below (it asserts the files exist).
! grep -q "Exception in thread" "$WORK/job.log" || { tail -40 "$WORK/job.log"; exit 1; }

python3 - "$WORK" "$REF" <<'EOF'
import csv, glob, sys
work, ref = sys.argv[1], sys.argv[2]

def canon(pattern):
    files = glob.glob(pattern)
    assert files, f"no files match {pattern}"
    header, rows = None, []
    for f in files:
        with open(f) as fh:
            r = list(csv.reader(fh))
            if not r:
                continue
            if header is None:
                header = r[0]
            else:
                assert r[0] == header, f"header mismatch in {f}"
            rows += r[1:]
    return header, sorted(map(tuple, rows))

ok = True
for name in ("employee_all", "employee_current"):
    got = canon(f"{work}/output/{name}/part-*.csv")
    want = canon(f"{ref}/data/output/{name}/part-*.csv")
    match = got == want
    ok &= match
    print(f"[smoke] {name}: "
          + ("MATCH" if match else "DIFF")
          + f" ({len(got[1])} rows vs {len(want[1])} golden)")

archived = glob.glob(f"{work}/input/processed/*.csv")
print(f"[smoke] archived inputs: {len(archived)}")
ok &= len(archived) > 0

sys.exit(0 if ok else 1)
EOF
echo "[smoke] PASS"
