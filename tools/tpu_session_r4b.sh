#!/bin/bash
# Round-4 follow-up measurement session: paged+paired serving (the r4a
# session measured paged WITHOUT pairing — pairing was dense-only until
# this round), the page-size ladder under pairing, and decode A/B of
# paged-paired vs dense-paired. Run after tpu_session.sh completes.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_session_r4b_$(date +%H%M%S)}
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

# canary first (contention bracket)
run canary 900 python bench.py --json-only

# paged+paired serving ladder (r4a: dense 908.9, paged512-unpaired 791.2,
# paged256-unpaired 829.6 tok/s — pairing was the missing ~10%)
run serve_paged512_pair 1800 python bench.py --serving --workload mixed \
    --paged-pages 40 --page-size 512
run serve_paged256_pair 1800 python bench.py --serving --workload mixed \
    --paged-pages 80 --page-size 256
run serve_paged128_pair 1800 python bench.py --serving --workload mixed \
    --paged-pages 160 --page-size 128

# dense re-record in the same session for an honest ladder comparison
run serve_dense 1800 python bench.py --serving --workload mixed

# int4 prefill: fused-unpack (default) vs materialized int8 plane
# (GABBY_INT4_PREFILL_PROMOTE=1) vs the resident shadow
# (GABBY_PREFILL_SHADOW=1) — VERDICT r3 item 3's ladder
run prefill_plain 900 python bench.py --json-only --prefill-len 1024
run prefill_promote 900 env GABBY_INT4_PREFILL_PROMOTE=1 \
    python bench.py --json-only --prefill-len 1024
run prefill_shadow 900 env GABBY_PREFILL_SHADOW=1 \
    python bench.py --json-only --prefill-len 1024
# decompose: is prefill now UNEMBED-bound? (int4g group-scale unembed at
# prefill M materializes the dequantized [D, V] table per call; the r4a
# shadow leg gained only +6% over plain, far below int8's r2 margin)
run prefill_shadow_u8 900 env GABBY_PREFILL_SHADOW=1 GABBY_UNEMBED_INT4=0 \
    python bench.py --json-only --prefill-len 1024
run prefill_int8 900 python bench.py --json-only --config int8_1b \
    --prefill-len 1024

run canary2 600 python bench.py --json-only

# profile the CURRENT serving decode layout (paired + int4g unembed +
# pinned boundary layouts) for the round-4 byte-level account
run profile 900 python tools/profile_decode.py --config int4_1b

echo "session complete: $OUT"
