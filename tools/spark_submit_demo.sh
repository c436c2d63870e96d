#!/usr/bin/env bash
# Evidence for the north_rule launch path: package the engine and run the
# flagship verify job via spark-submit --py-files, at two parallelism
# levels (the sandbox stand-in for N and 4N executors).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${1:-/root/testdata/sf0.01}"

ZIP="$(python "$REPO/tools/build_pyfiles.py")"
echo "py-files artifact: $ZIP"

for CORES in 8 32; do
  OUT="/tmp/fv_submit_out_${CORES}"
  rm -rf "$OUT"
  spark-submit --master "local[$CORES]" \
    --conf spark.sql.shuffle.partitions=$((2 * CORES)) \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    "$REPO/jobs/verify_job.py" "$SF_DIR" "$OUT" "submit-$CORES" \
    2>&1 | grep -E "VERIFY-RESULT|Error|Exception" || true
done
