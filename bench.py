"""Benchmark harness: output tokens/sec/chip for Llama-3 decode.

Run on the real TPU (default platform). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s/chip", "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md: its ML core is a stub), so
`vs_baseline` reports fraction of the HBM-bandwidth speed-of-light for this
chip/model/batch — the honest denominator for a bandwidth-bound decode:
  SOL step time = (weight bytes + KV bytes touched) / HBM bandwidth.

Timing notes: under the axon tunnel jax.block_until_ready is a no-op and a
host round-trip costs ~0.5 s, so every timed region ends with a 4-byte fetch
and is sized to run for seconds (tunnel noise amortized + subtracted).

Usage:
  python bench.py                    # Llama-3.2-1B INT4 (fastest config)
  python bench.py --config int8kv_1b # BASELINE config 2 (INT8)
  python bench.py --config bf16_1b   # config 1 (BF16)
  python bench.py --config int4_3b   # config 3 shapes (INT4 + INT8 KV)
  python bench.py --batch 16 --context 1024 --json-only

Mesh mode (BASELINE configs 4-5; the >= 80% scaling-efficiency record is
one command once real multi-chip hardware is provisioned):
  python bench.py --tp 8 --config int4_8b            # TP over 8 real chips
  python bench.py --tp 4 --dp 2 --serving            # dp x tp serving
  python bench.py --tp 8 --cpu-devices 8             # virtual-mesh dryrun
  python bench.py --tp 16 --coordinator host:1234 \
      --num-processes 2 --process-id 0               # multi-host
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gabby_tpu import config as cfglib
from gabby_tpu.models import llama
from gabby_tpu.ops import quant
from gabby_tpu.runtime import generate
from gabby_tpu.runtime.kv_cache import create_cache

# HBM GB/s per chip by device kind substring.
HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0, "TPU v5p": 2765.0,
            "TPU v4": 1228.0, "TPU v6 lite": 1640.0, "TPU v6e": 1640.0}

CONFIGS = {
    "int8_1b": dict(preset=cfglib.llama32_1b, bits=8, kv_quant=False),
    "int8kv_1b": dict(preset=cfglib.llama32_1b, bits=8, kv_quant=True),
    "bf16_1b": dict(preset=cfglib.llama32_1b, bits=None, kv_quant=False),
    "int4_1b": dict(preset=cfglib.llama32_1b, bits=4, kv_quant=True),
    "int4_3b": dict(preset=cfglib.llama32_3b, bits=4, kv_quant=True),
    "int4_8b": dict(preset=cfglib.llama3_8b, bits=4, kv_quant=True),
    "tiny": dict(preset=cfglib.tiny, bits=None, kv_quant=False),
    # CPU-runnable smoke of the full int4 bench path (paired cache,
    # grouped unembed, int8 kv) — for testing the harness, not a record
    "tiny_int4": dict(preset=cfglib.tiny, bits=4, kv_quant=True),
}

_SYNC = None


def sync(x) -> None:
    """Force completion: fetch 4 bytes of x back to the host."""
    global _SYNC
    if _SYNC is None:
        _SYNC = jax.jit(lambda v: jnp.reshape(v, (-1,))[:1])
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(_SYNC(leaf)))


def roundtrip_s() -> float:
    c = jnp.ones((1,), jnp.float32)
    sync(c)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(c)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _device_hbm_gbps() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_GBPS.items():
        if k.lower() in kind.lower():
            return v
    return 819.0


def _force_cpu_devices(n: int) -> None:
    """Virtual-mesh dryrun: N CPU devices. Must run before the backend
    initializes (this image's sitecustomize pre-imports jax pinned to the
    single-chip axon platform, so the env var alone is not enough)."""
    import os

    import jax._src.xla_bridge as xla_bridge
    if xla_bridge.backends_are_initialized():
        raise SystemExit("--cpu-devices must be set before jax initializes "
                         "(run bench.py as the main program)")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={n}").strip()
    jax.config.update("jax_platforms", "cpu")


def build_mesh(args):
    """dp x tp mesh (or None for single-device) from the bench flags."""
    ndev = args.dp * args.tp
    if ndev <= 1:
        return None
    from gabby_tpu.parallel import make_mesh
    if args.batch % args.dp != 0:
        raise SystemExit(f"--batch {args.batch} must divide --dp {args.dp}")
    return make_mesh(dp=args.dp, tp=args.tp, devices=jax.devices()[:ndev])


def build_params(args, spec, cfg, mesh):
    """Init (+ quantize + fuse + place) the benchmark weights. Fusion is
    skipped on a real model axis (llama.fuse_projections contract)."""
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if spec["bits"]:
        # Grouped-scale INT4 unembed: default ON for single-device int4
        # runs — the [D, V] int8 stream is ~29% of decode bytes on the 1B
        # and the round-3 A/B measured the int4g table 2.6% faster
        # end-to-end (2.660 vs 2.730 ms/step, tools/ab_decode.py unembed);
        # NLL-gated by tests/test_ppl.py::test_int4_unembed_ppl_delta.
        # Mesh runs keep the int8 table the vocab shardings are written
        # for. GABBY_UNEMBED_INT4=0 reverts.
        unembed4 = (spec["bits"] == 4 and mesh is None
                    and os.environ.get("GABBY_UNEMBED_INT4", "1") != "0")
        params = quant.quantize_tree(
            params, spec["bits"],
            **({"unembed_bits": 4, "unembed_group": 256} if unembed4
               else {}))
    fuse_ok = mesh is None or mesh.shape.get("model", 1) == 1
    if fuse_ok and not args.no_fuse:
        params = llama.fuse_projections(params)
    if mesh is not None:
        from gabby_tpu.parallel import shard_params
        return shard_params(params, mesh)
    return jax.tree.map(jax.device_put, params)


def _tree_bytes(tree) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(tree))


def run_serving(args, spec, cfg, log, mesh=None) -> int:
    """End-to-end serving benchmark: concurrent chat requests through the
    continuous-batching Engine (real prefill + decode + streaming), the
    headline BASELINE metric (output tok/s/chip + p50 TTFT)."""
    import threading

    from gabby_tpu.runtime.engine import Engine, EngineConfig
    from gabby_tpu.tokenizer import Tokenizer

    params = build_params(args, spec, cfg, mesh)
    # same default-on knob as the decode bench (see there). Paged pairing
    # history: r4b measured a LOSS at production page sizes (512-row
    # pages 694 paired vs 791 unpaired tok/s; 256: 672 vs 830) because
    # the paired prefill fell off-kernel; the round-5 paired flash-
    # prefill kernel (query-group grid axis keeps its scoped-VMEM inside
    # the compile limit) flipped it — r5a same-session mixed ladder at
    # 256-row pages: 1197.5 paired vs 1148.0 unpaired tok/s (p50 TTFT
    # 679 vs 716 ms). Paired is now the default for dense AND paged;
    # GABBY_ATTN_PAIR=0 reverts.
    paired = (os.environ.get("GABBY_ATTN_PAIR", "1") != "0"
              and mesh is None and cfg.num_kv_heads % 2 == 0)
    cache_sh = None
    if mesh is not None:
        from gabby_tpu.parallel import cache_shardings
        cache_sh = cache_shardings(mesh, quantized=spec["kv_quant"])
    tok = Tokenizer.byte_fallback(cfg.vocab_size)
    engine = Engine(cfg, params, tok, EngineConfig(
        batch_slots=args.batch, max_seq=args.max_seq,
        steps_per_call=args.steps, steps_per_call_busy=args.busy_steps,
        default_max_tokens=args.gen_tokens,
        kv_quantized=spec["kv_quant"],
        speculate_tokens=args.speculate,
        paged_pages=args.paged_pages,
        page_size=args.page_size,
        pair_kv_heads=paired,
        # dispatch-ahead decode pipelining (default OFF — measured a
        # serving loss on the tunneled chip, see EngineConfig.
        # pipeline_fetch; GABBY_PIPELINE=1 re-measures it)
        pipeline_fetch=(os.environ.get("GABBY_PIPELINE", "0") == "1"),
        prefill_int8_shadow=(os.environ.get("GABBY_PREFILL_SHADOW") == "1")),
        cache_shardings=cache_sh)

    n_requests = args.requests or 3 * args.batch

    def req_messages(i: int) -> list:
        """Per-request chat messages for the selected workload.

        uniform: every request sends the IDENTICAL prompt — prefix reuse
          turns waves 2+ into row-copy admissions and repetitive text
          inflates n-gram speculation; a best-case number (VERDICT r2
          called the old bench self-flattering for reporting only this).
        mixed: lengths drawn from 64..1024-char buckets with DISTINCT
          pseudo-random content — no cross-request prefix reuse, honest
          n-gram acceptance; the number most like production.
        shared-prefix: one long shared system prompt + short distinct user
          suffixes — isolates what prefix KV reuse is worth.
        (byte-fallback tokenizer: 1 token per byte, so character budgets
        are token budgets.)"""
        if args.workload == "uniform":
            return [{"role": "user",
                     "content": ("benchmark " * 200)[:args.prefill_len]}]
        # deterministic distinct filler: i seeds the word stream
        def filler(seed: int, nchars: int) -> str:
            out, j = [], 0
            while sum(len(w) + 1 for w in out) < nchars:
                out.append(f"w{(seed * 7919 + j * 104729) % 99991}")
                j += 1
            return " ".join(out)[:nchars]
        if args.workload == "shared-prefix":
            sys_text = ("system policy " * 200)[:args.prefill_len]
            return [{"role": "system", "content": sys_text},
                    {"role": "user", "content": filler(i, 48)}]
        if args.workload == "long":
            # BASELINE config-5-style serving shape on one chip: every
            # prompt spans many 512-token prefill chunks, so admissions
            # interleave with decode for whole waves and the attention
            # window rides the live context (not max_seq)
            ln = min(4096, max(64, args.max_seq - args.gen_tokens - 80))
            return [{"role": "user", "content": filler(i, ln)}]
        buckets = (64, 128, 256, 512, 1024)
        ln = min(buckets[i % len(buckets)],
                 max(64, args.max_seq - args.gen_tokens - 80))
        return [{"role": "user", "content": filler(i, ln)}]

    # warm-up = a DRESS REHEARSAL of the measured workload (same prompts,
    # same gen length, 2x oversubscription): the serving loop's compiled-
    # program set depends on runtime shapes that only appear under real
    # churn — burst vs single vs prefix-donor admissions, and the
    # decode-burst step ladder at wave tails. A token-count-4 warm-up
    # left those to compile INSIDE the timed run (measured as tens of
    # seconds of fake TTFT on the tunnel-attached chip).
    import threading as _t
    engine.generate_sync(req_messages(0), max_tokens=4)
    warm = [_t.Thread(target=lambda i=i: engine.generate_sync(
        req_messages(i), max_tokens=args.gen_tokens))
        for i in range(2 * args.batch)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    engine.reset_stats()  # warm-up TTFTs (compile-laden) must not count
    log(f"serving[{args.workload}]: {n_requests} requests x "
        f"{args.gen_tokens} tokens, {args.batch} slots")

    done = []
    lock = threading.Lock()

    def run_one(i):
        text, fin, np_, nc = engine.generate_sync(
            req_messages(i), max_tokens=args.gen_tokens)
        with lock:
            done.append(nc)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=run_one, args=(i,))
               for i in range(n_requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    total_tokens = sum(done)
    stats = engine.stats_snapshot()
    engine.shutdown()

    ndev = max(1, args.dp * args.tp)
    tok_per_s = total_tokens / dt / ndev  # per chip
    # honest denominator: decode speed-of-light at the workload's mean live
    # context (prompt + half the completion), full slots — serving can never
    # beat the decode stream it schedules. Per-chip bytes under a mesh.
    mean_prompt = stats.get("prompt_tokens", 0) / max(
        1, stats.get("requests", 1))
    mean_ctx = int(mean_prompt) + args.gen_tokens // 2
    kv_bpt = 2 * cfg.num_kv_heads * cfg.head_dim * (
        1 if spec["kv_quant"] else 2) + (8 if spec["kv_quant"] else 0)
    wbytes = _tree_bytes(params)
    if isinstance(params, dict) and params.get("lm_head") is not None:
        wbytes -= params["embed"].nbytes
    sol_step = (wbytes + args.batch * mean_ctx * cfg.num_layers * kv_bpt) / (
        ndev * _device_hbm_gbps() * 1e9)
    sol_tok_s = args.batch / sol_step / ndev
    print(json.dumps({
        "metric": f"serving throughput {args.config} "
                  f"({args.workload}, slots={args.batch}, "
                  f"prompt~{int(mean_prompt)}, gen={args.gen_tokens})",
        "value": round(tok_per_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(tok_per_s / sol_tok_s, 3),
        "detail": {
            "requests": n_requests,
            "wall_s": round(dt, 2),
            "p50_ttft_ms": stats.get("p50_ttft_ms"),
            "completion_tokens": total_tokens,
            "total_tok_s": round(tok_per_s * ndev, 1),
            "sol_tok_s": round(sol_tok_s, 0),
            "paired_kv": paired,
            "mesh": {"dp": args.dp, "tp": args.tp},
            "device": jax.devices()[0].device_kind,
            "note": "vs_baseline = fraction of decode HBM speed-of-light "
                    "at the mean live context (reference publishes no "
                    "numbers, see BASELINE.md); weights are random and the "
                    "tokenizer is byte-fallback — valid for throughput/"
                    "latency, not output quality",
        },
    }))
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    # default = the fastest measured config (round 2: int4 decode beats
    # int8 since the stacked-weight + flash-attention fixes)
    p.add_argument("--config", default="int4_1b", choices=sorted(CONFIGS))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--context", type=int, default=1024,
                   help="KV depth per slot when measuring decode")
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--steps", type=int, default=64,
                   help="decode steps fused per device call")
    p.add_argument("--min-time", type=float, default=4.0,
                   help="seconds each timed region must cover")
    p.add_argument("--prefill-len", type=int, default=512)
    p.add_argument("--json-only", action="store_true")
    p.add_argument("--no-fuse", action="store_true",
                   help="keep qkv/gate-up projections UNFUSED (A/B the "
                        "fused-group kernel calls)")
    p.add_argument("--serving", action="store_true",
                   help="benchmark through the continuous-batching engine "
                        "(concurrent requests, p50 TTFT) instead of raw "
                        "decode")
    p.add_argument("--workload", default="mixed",
                   choices=["mixed", "uniform", "shared-prefix", "long"],
                   help="serving mode request mix: 'mixed' = distinct "
                        "prompts across 64-1024 token buckets (the honest "
                        "production-like default), 'uniform' = identical "
                        "prompts (best case: full prefix reuse), "
                        "'shared-prefix' = shared system prompt + distinct "
                        "user suffixes (isolates prefix-reuse value), "
                        "'long' = distinct ~4k-token prompts (chunked "
                        "prefill + live-context windows under serving; "
                        "run with --max-seq 8192)")
    p.add_argument("--requests", type=int, default=0,
                   help="serving mode: request count (default 3x slots)")
    p.add_argument("--gen-tokens", type=int, default=128,
                   help="serving mode: completion length per request")
    p.add_argument("--busy-steps", type=int, default=8,
                   help="serving mode: decode steps per call while requests "
                        "are queued/prefilling")
    p.add_argument("--speculate", type=int, default=0,
                   help="serving mode: n-gram speculative drafts per "
                        "forward (NOTE: random weights + a repetitive "
                        "bench prompt make acceptance unrealistically "
                        "high; treat results as a mechanism check)")
    p.add_argument("--paged-pages", type=int, default=0,
                   help="serving mode: use the paged KV cache with this "
                        "many pool pages (0 = dense cache). The paged-vs-"
                        "dense gap at the default bench point is a BASELINE "
                        "record; re-measure with this after paged changes")
    p.add_argument("--page-size", type=int, default=512,
                   help="serving mode: rows per page when --paged-pages>0")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree (mesh model axis)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel degree (mesh data axis; slots/batch "
                        "shard over it)")
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="force N virtual CPU devices (mesh dryrun off-TPU)")
    p.add_argument("--coordinator", default="",
                   help="multi-host: jax.distributed coordinator host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args()

    # persistent XLA compilation cache: compiles through the TPU tunnel
    # cost minutes per bench invocation; steady-state timings are
    # unaffected (every timed region warms first). GABBY_BENCH_CC=''
    # disables for true compile-time measurements.
    cc = os.environ.get("GABBY_BENCH_CC",
                        os.path.expanduser("~/.cache/gabby_tpu/xla-bench"))
    if cc:
        os.makedirs(cc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.cpu_devices:
        _force_cpu_devices(args.cpu_devices)
    if args.coordinator:
        from gabby_tpu.parallel import initialize_multihost
        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)
    mesh = build_mesh(args)

    spec = CONFIGS[args.config]
    cfg = spec["preset"](max_seq_len=args.max_seq)
    log = (lambda *a: None) if args.json_only else (
        lambda *a: print(*a, file=sys.stderr, flush=True))

    if args.serving:
        return run_serving(args, spec, cfg, log, mesh)

    ndev = max(1, args.dp * args.tp)
    log(f"devices: {jax.devices()}")
    log(f"building {args.config}: ~{cfg.num_params()/1e9:.2f}B params"
        + (f" on mesh dp={args.dp} x tp={args.tp}" if mesh else ""))
    params = build_params(args, spec, cfg, mesh)
    from gabby_tpu.ops.pallas import quant_matmul as pqm
    if mesh is None:
        # adopt the 4 MB weight-tile budget when this toolchain's
        # scoped-VMEM limit allows (compile probe, cached persistently;
        # falls back to the proven 2 MB budget — see
        # ops/pallas/quant_matmul.probe_big_tiles)
        if pqm.probe_big_tiles(quant.int4_matmul_shapes(params)):
            log("tile budget: big (4 MB probe compiled clean)")
    # Paired kv-head cache layout (block-diagonal attention dots at
    # 128-deep contraction — see kv_cache.create_cache): DEFAULT ON for
    # single-device dense runs. The chip A/B measured the paired decode
    # loop ~10.5% faster (2.457 vs 2.745 ms/step, tools/ab_decode.py
    # pair) and mixed serving 1025 vs 947 tok/s. The round-3 "engine
    # collapse" under pairing was the paired PREFILL kernel exceeding
    # v5e's scoped-VMEM limit at compile time (fixed: pairing now takes
    # the documented XLA prefill fallback — ops/attention.py; on-chip
    # parity probes: tools/pair_chip_check.py,
    # tools/pair_engine_chip_check.py). GABBY_ATTN_PAIR=0 reverts.
    paired = (os.environ.get("GABBY_ATTN_PAIR", "1") != "0"
              and mesh is None and cfg.num_kv_heads % 2 == 0)
    cache = create_cache(cfg, args.batch, args.max_seq,
                         dtype=jnp.bfloat16, quantized=spec["kv_quant"],
                         paired=paired)
    cache_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gabby_tpu.parallel import cache_shardings
        cache_sh = cache_shardings(mesh, spec["kv_quant"])
        cache = jax.device_put(cache, cache_sh)
    loops = generate.CacheLoops(cache, cache_sh)
    cache = loops.pin_cache(cache)  # required under the persistent cache
    weight_bytes = _tree_bytes(params)
    # decode streams every weight EXCEPT the embedding table (the gather
    # reads B rows; with a separate quantized unembed the [V, D] table
    # never moves) — keep it out of the speed-of-light denominator
    if isinstance(params, dict) and params.get("lm_head") is not None:
        decode_weight_bytes = weight_bytes - params["embed"].nbytes
    else:
        decode_weight_bytes = weight_bytes
    rt = roundtrip_s()
    log(f"weights: {weight_bytes/1e9:.2f} GB; tunnel roundtrip {rt*1e3:.0f} ms")

    # ---- prefill (TTFT) ----
    b = args.batch
    # GABBY_PREFILL_SHADOW=1: prefill through the exact int8 shadow of
    # int4 weights (quant.promote_int4_to_int8 — same numbers, XLA's
    # fast fused int8 dequant dot instead of a per-call unpack)
    pf_params = params
    # (sharding-preserving under a mesh — see the promote docstring)
    if os.environ.get("GABBY_PREFILL_SHADOW") == "1":
        pf_params = quant.promote_int4_to_int8(params)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, args.prefill_len),
                                0, cfg.vocab_size, jnp.int32)
    if mesh is not None:
        prompt = jax.device_put(prompt, NamedSharding(mesh, P("data", None)))
    last_logits, cache = generate.prefill_chunk(pf_params, cfg, prompt,
                                                cache, 0)
    sync(last_logits)  # compile
    n_prefill = 8
    t0 = time.perf_counter()
    for _ in range(n_prefill):
        last_logits, cache = generate.prefill_chunk(pf_params, cfg, prompt,
                                                    cache, 0)
    sync(last_logits)
    ttft = (time.perf_counter() - t0 - rt) / n_prefill
    log(f"prefill({b}x{args.prefill_len}): {ttft*1e3:.1f} ms "
        f"({b*args.prefill_len/ttft:.0f} tok/s)")

    # ---- decode throughput at `context` depth ----
    sstate = generate.SamplingState.greedy(b)
    tokens = jnp.full((b,), 17, jnp.int32)
    positions = jnp.full((b,), args.context, jnp.int32)
    active = jnp.ones((b,), bool)
    if mesh is not None:
        dsh = NamedSharding(mesh, P("data"))
        tokens = jax.device_put(tokens, dsh)
        positions = jax.device_put(positions, dsh)
        active = jax.device_put(active, dsh)

    # live-context window bucket, exactly as the engine picks it (power-of-
    # two ladder from the flash kernel's chunk): long provisioned windows
    # price at the live context
    window = 1024
    while window < args.context + args.steps + 2:
        window *= 2
    window = min(window, args.max_seq)

    def run(cache, sstate):
        out, _, _, _, _, _, cache, sstate, _, _, _ = loops.decode_loop(
            params, cfg, tokens, positions, active, cache, sstate, args.steps,
            window=window)
        return out, cache, sstate

    out, cache, sstate = run(cache, sstate)
    sync(out)  # compile
    # calibrate group size so each timed group covers ~0.5 s (tunnel
    # roundtrip subtracted per group stays a small correction)
    t0 = time.perf_counter()
    out, cache, sstate = run(cache, sstate)
    sync(out)
    once = max(time.perf_counter() - t0 - rt, 1e-3)
    group = max(1, int(0.5 / once) + 1)
    n_groups = max(5, int(args.min_time / (group * once)) + 1)
    # per-group timing, MEDIAN across groups: the chip is shared, and a
    # single long timing window lets one interference spike (or a tunnel
    # stall) drag the whole number — medians reproduce across runs where
    # a grand mean does not
    samples = []
    for _ in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(group):
            out, cache, sstate = run(cache, sstate)
        sync(out)
        samples.append((time.perf_counter() - t0 - rt) / (group * args.steps))
    per_step = statistics.median(samples)
    steps = args.steps * group * n_groups
    tok_per_s = b / per_step
    step_ms = per_step * 1e3

    # ---- speed-of-light (per chip: a mesh splits the byte stream) ----
    kv_bytes_per_tok_layer = 2 * cfg.num_kv_heads * cfg.head_dim * (
        1 if spec["kv_quant"] else 2) + (8 if spec["kv_quant"] else 0)
    kv_read = b * args.context * cfg.num_layers * kv_bytes_per_tok_layer
    sol_step = (decode_weight_bytes + kv_read) / (
        ndev * _device_hbm_gbps() * 1e9)
    sol_tok_per_s = b / sol_step / ndev
    tok_per_s = tok_per_s / ndev  # per chip
    log(f"decode: {step_ms:.2f} ms/step over {steps} steps, "
        f"{tok_per_s:.0f} tok/s/chip (SOL {sol_tok_per_s:.0f}, "
        f"{tok_per_s/sol_tok_per_s*100:.0f}%)")

    print(json.dumps({
        "metric": f"decode throughput {args.config} "
                  f"(batch={b}, ctx={args.context})",
        "value": round(tok_per_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(tok_per_s / sol_tok_per_s, 3),
        "detail": {
            "step_ms": round(step_ms, 3),
            "ttft_ms": round(ttft * 1e3, 1),
            "prefill_tok_s": round(b * args.prefill_len / ttft, 0),
            "sol_tok_s": round(sol_tok_per_s, 0),
            "step_ms_samples": [round(s * 1e3, 3) for s in samples[:16]],
            "weight_gb": round(weight_bytes / 1e9, 3),
            "paired_kv": paired,
            "tile_budget": pqm.tile_budget() if mesh is None else None,
            "unembed": ("int4g" if isinstance(params, dict)
                        and getattr(params.get("lm_head"), "group", 0)
                        else ("int8" if spec["bits"] else "bf16")),
            "mesh": {"dp": args.dp, "tp": args.tp},
            "device": jax.devices()[0].device_kind,
            "note": "vs_baseline = fraction of HBM speed-of-light "
                    "(reference publishes no numbers, see BASELINE.md)",
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
