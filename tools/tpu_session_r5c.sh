#!/bin/bash
# Round-5c: re-measure with pipeline_fetch OFF (the r5b ladder showed the
# pipelined default was a big loss, so r5b's paged runs and canaries are
# invalid): (1) canary brackets, (2) dense mixed serving record, (3) the
# paged+paired ladder at 256/512-row pages with the r5a paired
# flash-prefill kernel (decides whether paged pairing keeps its default
# and how far paged sits from dense now), (4) uniform + shared-prefix
# serving for the workload table.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_session_r5c_$(date +%H%M%S)}
mkdir -p "$OUT"
echo "logging to $OUT"
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s)" | tee -a "$OUT/session.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$?" | tee -a "$OUT/session.log"
  tail -4 "$OUT/$name.log" | tee -a "$OUT/session.log"
}
run canary 1200 python bench.py
run serve_dense 1800 python bench.py --serving --workload mixed
run serve_paged256 1800 python bench.py --serving --workload mixed --paged-pages 80 --page-size 256
run serve_paged512 1800 python bench.py --serving --workload mixed --paged-pages 40 --page-size 512
run serve_paged256_unpaired 1800 env GABBY_ATTN_PAIR=0 python bench.py --serving --workload mixed --paged-pages 80 --page-size 256
run serve_uniform 1800 python bench.py --serving --workload uniform
run serve_shared 1800 python bench.py --serving --workload shared-prefix
run canary2 1200 python bench.py
echo "session complete: $OUT"
