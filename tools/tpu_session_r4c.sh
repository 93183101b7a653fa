#!/bin/bash
# Round-4c: post-half-split-repack records — fresh profile (what copies
# remain), 3B re-record, best paged config re-measure, canary brackets.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_session_r4c_$(date +%H%M%S)}
mkdir -p "$OUT"
echo "logging to $OUT"
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s)" | tee -a "$OUT/session.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$?" | tee -a "$OUT/session.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/session.log"
}
run canary 900 python bench.py --json-only
run profile 900 python tools/profile_decode.py --config int4_1b
run decode_3b 1800 python bench.py --json-only --config int4_3b
run serve_paged256 1800 python bench.py --serving --workload mixed \
    --paged-pages 80 --page-size 256
run serve_uniform 1800 python bench.py --serving --workload uniform
run serve_shared 1800 python bench.py --serving --workload shared-prefix
run canary2 600 python bench.py --json-only
echo "session complete: $OUT"
