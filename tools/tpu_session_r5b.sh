#!/bin/bash
# Round-5b: measure what the r5a commits changed but never timed on-chip:
# (1) dispatch-ahead decode pipelining (f5a54ad, default ON) — serving A/B
#     alternated twice each way so one contention window can't decide it;
# (2) the tile-budget ladders (mid/big/huge) under the pinned scoped-VMEM
#     limit — r5a's mid-vs-big ran in a contended window and read neutral;
# (3) paged+paired under the new paired flash-prefill kernel at 512-row
#     pages (256 was measured in r5a: 1197.5 paired vs 1148.0 unpaired);
# (4) canary brackets for the session record.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_session_r5b_$(date +%H%M%S)}
mkdir -p "$OUT"
echo "logging to $OUT"
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s)" | tee -a "$OUT/session.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$?" | tee -a "$OUT/session.log"
  tail -4 "$OUT/$name.log" | tee -a "$OUT/session.log"
}
run canary 900 python bench.py --json-only
run serve_pipe_on_a 1800 python bench.py --serving --workload mixed
run serve_pipe_off_a 1800 env GABBY_PIPELINE=0 python bench.py --serving --workload mixed
run serve_pipe_on_b 1800 python bench.py --serving --workload mixed
run serve_pipe_off_b 1800 env GABBY_PIPELINE=0 python bench.py --serving --workload mixed
run tiles 1500 python tools/ab_decode.py tiles
run tiles2 1500 python tools/ab_decode.py tiles2
run serve_paged512_paired 1800 python bench.py --serving --workload mixed --paged-pages 40 --page-size 512
run serve_paged256_paired 1800 python bench.py --serving --workload mixed --paged-pages 80 --page-size 256
run canary2 900 python bench.py --json-only
echo "session complete: $OUT"
