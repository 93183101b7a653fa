#!/bin/bash
# One-shot measurement session for when the (shared, intermittently
# tunnel-down) TPU is reachable: runs every pending A/B and bench record
# in sequence, logging to /tmp/tpu_session_<ts>/. Designed to be started
# the moment the chip answers so a short availability window still
# captures everything (docs/NEXT.md round-4 items 1, 2, 4).
#
# Usage: bash tools/tpu_session.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_session_$(date +%H%M%S)}
mkdir -p "$OUT"
echo "logging to $OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s)" | tee -a "$OUT/session.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc" | tee -a "$OUT/session.log"
  tail -5 "$OUT/$name.log" | tee -a "$OUT/session.log"
}

# 0. canary: the canonical decode bench. Everything else is judged
#    relative to this; if it doesn't reproduce ~2.385 ms/step the session
#    is contended (BASELINE.md measurement notes) — rerun later.
run canary 900 python bench.py --json-only

# 0b. paired kv-head layout (NEXT.md round-4 item 0 — the structural
#     attention lever: half the MXU passes). Measure FIRST.
run ab_pair 1500 python tools/ab_decode.py pair

# 1. int4 unpack A/Bs (NEXT.md item 1) — flip the winner to default.
#    (the i16-width variant was removed: Mosaic cannot legalize i16
#    shrsi on this toolchain — see quant_matmul.py)
run ab_rawdot 1500 python tools/ab_decode.py rawdot
run ab_unembed 1500 python tools/ab_decode.py unembed

run ab_chunk  1500 python tools/ab_decode.py chunk

# 2. canary again (contention bracketing for the A/Bs above)
run canary2 600 python bench.py --json-only

# 3. serving records: mixed (headline), shared-prefix, paged-vs-dense
run serve_mixed 1800 python bench.py --serving --workload mixed
run serve_paged 1800 python bench.py --serving --workload mixed \
    --paged-pages 40 --page-size 512
run serve_paged256 1800 python bench.py --serving --workload mixed \
    --paged-pages 80 --page-size 256

# 4. long-window + prefill records (regression checks), plus the int4
#    prefill int8-shadow A/B (same bench invocation, shadow on)
run ab_longwin 1500 python tools/ab_decode.py longwin
run prefill 900 python bench.py --json-only --config int4_1b \
    --prefill-len 1024
run prefill_shadow 900 env GABBY_PREFILL_SHADOW=1 python bench.py \
    --json-only --config int4_1b --prefill-len 1024

run canary3 600 python bench.py --json-only

# 5. 3B re-record (BASELINE config 3; r2 stands at 6.01 ms/step — the
#    r3 layout pins + window clamp should move it)
run decode_3b 1800 python bench.py --json-only --config int4_3b

echo "session complete: $OUT"
