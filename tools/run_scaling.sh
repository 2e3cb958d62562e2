#!/bin/bash
# Scaling-efficiency measurement: interleaved repetitions of the identical
# index-build job at local[8] and local[32], best-of-N per config (the host
# is shared and intermittently throttled; best-of filters neighbor noise).
# Writes BENCH/BASELINE.md via graft.Scaling report.
set -u
cd "$(dirname "$0")/.."
DOCS=${1:-400000}
REPS=${2:-3}
LOG=${3:-/tmp/scaling_runs.log}
: > "$LOG"
for i in $(seq 1 "$REPS"); do
  for c in 8 32; do
    SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.Scaling measure $c $DOCS" 2>/dev/null \
      | grep -oE '\{"cores".*\}' >> "$LOG"
    rm -rf /tmp/scale_* 2>/dev/null
  done
done
python3 - "$LOG" "$DOCS" <<'EOF'
import json, subprocess, sys
runs = [json.loads(l) for l in open(sys.argv[1])]
docs = sys.argv[2]
best = {}
for r in runs:
    c = r["cores"]
    if c not in best or r["build_sec"] < best[c]["build_sec"]:
        best[c] = r
b8, b32 = best[8], best[32]
print("best-of runs:", best)
subprocess.run(["sbt", "-batch",
    f"runMain graft.Scaling report {docs} {b8['build_sec']} {b8['query_sec']} "
    f"{b32['build_sec']} {b32['query_sec']} BENCH/BASELINE.md"], check=True)
EOF
