#!/bin/bash
# Round-5a: (1) decode tile-budget ladder under the explicit scoped-VMEM
# limit (mid/big/huge), (2) the paged+paired serving ladder with the NEW
# paired flash-prefill kernel (944a97f) — the r4b paired-paged loss was
# the paired prefill falling off-kernel; if paired paged now wins, paged
# pairing flips default, (3) canary brackets.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_session_r5a_$(date +%H%M%S)}
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
run tiles 1200 python tools/ab_decode.py tiles
run tiles2 1200 python tools/ab_decode.py tiles2
run serve_dense 1800 python bench.py --serving --workload mixed
run serve_paged256_unpaired 1800 python bench.py --serving --workload mixed \
    --paged-pages 80 --page-size 256
run serve_paged256_paired 1800 env GABBY_ATTN_PAIR=1 python bench.py \
    --serving --workload mixed --paged-pages 80 --page-size 256
run serve_paged512_paired 1800 env GABBY_ATTN_PAIR=1 python bench.py \
    --serving --workload mixed --paged-pages 40 --page-size 512
run canary2 600 python bench.py --json-only
echo "session complete: $OUT"
