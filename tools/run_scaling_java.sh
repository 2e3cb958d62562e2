#!/bin/bash
# Scaling pair driven via plain `java` from a CLASS SNAPSHOT, so legs can
# run while sbt recompiles the working tree. Interleaved legs, shared
# corpus (GRAFT_CORPUS_DIR), tmpfs-backed index/shuffle dirs, and a tmpfs
# bandwidth probe before/after every leg (round-5 verdict ask #1: discard
# pairs whose probes disagree — the probe numbers land next to each leg).
#
# usage: run_scaling_java.sh <mode:measure|measuretri> <docs> <reps> <log>
set -u
cd "$(dirname "$0")/.."
MODE=${1:-measure}
DOCS=${2:-400000}
REPS=${3:-1}
LOG=${4:-/tmp/scaling_java.log}
SNAP=/tmp/graft_classes_snapshot
rm -rf "$SNAP"; cp -r target/scala-2.13/classes "$SNAP"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
bw_probe() {
  # tmpfs write bandwidth, MB/s over 512 MB (dd through /dev/shm)
  local f=/dev/shm/bwprobe_$$
  local out
  out=$(dd if=/dev/zero of="$f" bs=4M count=128 conv=fsync 2>&1 | tail -1)
  rm -f "$f"
  echo "$out" | grep -oE '[0-9.]+ [GM]B/s'
}
: > "$LOG"
export GRAFT_SCALE_TMP=/dev/shm
export GRAFT_CORPUS_DIR=/dev/shm/graft_scale_corpus
mkdir -p "$GRAFT_CORPUS_DIR"
for i in $(seq 1 "$REPS"); do
  for c in 8 32; do
    PRE=$(bw_probe)
    R=$(java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
        -Dspark.sql.session.timeZone=UTC \
        -cp "$SNAP:/opt/spark/jars/*" graft.Scaling "$MODE" "$c" "$DOCS" 2>/dev/null \
        | grep -oE '\{"cores".*\}')
    POST=$(bw_probe)
    echo "{\"rep\":$i,\"pre_bw\":\"$PRE\",\"post_bw\":\"$POST\",\"run\":$R}" | tee -a "$LOG"
    rm -rf /dev/shm/scale_* 2>/dev/null
  done
done
