#!/usr/bin/env bash
# spark-submit --py-files path: the cluster-shaped invocation of the
# flagship verify job, plus the exit-code contract (Program.cs:14-27).
# Usage: bash tools/spark_submit_demo.sh [sf_dir]
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF="${1:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/fv_submit.XXXXXX)"
ZIP="$REPO/dist/fileverification_spark.zip"

python "$REPO/tools/build_pyfiles.py" >/dev/null

run() { # run <expected_rc> <args...>
  local want="$1"; shift
  spark-submit --master "local[8]" --py-files "$ZIP" \
    "$REPO/jobs/verify_job.py" "$@" 2>/dev/null | grep -E "RESULT"
  local rc="${PIPESTATUS[0]}"
  echo "exit=$rc (want $want)"
  [ "$rc" = "$want" ] || { echo "FAILED"; exit 1; }
}

echo "== tree verify (reference parity: SUCCESS even with FAILs) =="
run 0 "$SF" "$OUT/tree" demo

echo "== tree verify --strict (FAIL/MISSING -> 4) =="
run 4 "$SF" "$OUT/strict" demo --strict

echo "== point verify: bad hash -> 4; unknown url -> 2 =="
URL="$(python - <<EOF
import sys; sys.path.insert(0, "$REPO")
from fileverification_spark.session import get_spark
from fileverification_spark.sources import pages as P
from pyspark.sql import functions as F
print(P.pages(get_spark("demo-url"), "$SF").where(F.col("doc_id")==1).first()["url"])
EOF
)"
run 4 "$SF" "$OUT/p1" demo --point "$URL" "DEADBEEF"
run 2 "$SF" "$OUT/p2" demo --point "$URL#nope" "DEADBEEF"

echo "ALL OK"
