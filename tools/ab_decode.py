"""Same-session A/B of decode-step variants on the real TPU.

The shared chip's run-to-run variance is ~±30% across sessions, so the only
trustworthy comparisons alternate variants inside ONE process and compare
medians (see BASELINE.md's measurement notes). Usage:

  python tools/ab_decode.py fused        # fused qkv/gate-up vs unfused
  python tools/ab_decode.py window       # max_seq 8192: window clamp on/off
  python tools/ab_decode.py fused --config int8kv_1b

Prints one line per variant: median ms/step over alternating groups.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import CONFIGS, roundtrip_s, sync  # noqa: E402
from gabby_tpu.models import llama  # noqa: E402
from gabby_tpu.ops import quant  # noqa: E402
from gabby_tpu.runtime import generate  # noqa: E402
from gabby_tpu.runtime.kv_cache import create_cache  # noqa: E402


def time_variants(variants: dict, steps: int, reps: int, rounds: int):
    """variants: name -> zero-arg callable returning a synced run.
    Alternates name order each round; returns name -> median seconds.

    Contention guard: the shared chip has multi-minute windows where EVERY
    program runs ~15% slow (BASELINE.md round-3 notes) — an A/B whose
    rounds land inside one reads neutral no matter the real effect. A
    round is marked contended when ALL variants in it run >10% over their
    own session minimum (a real A/B difference slows only one side);
    contended rounds are dropped from the medians, and the drop count is
    printed so a mostly-contended session is visibly untrustworthy."""
    rt = roundtrip_s()
    print(f"tunnel roundtrip {rt*1e3:.0f} ms", flush=True)
    for name, fn in variants.items():
        t0 = time.perf_counter()
        fn()
        print(f"compile+first {name}: {time.perf_counter()-t0:.1f}s",
              flush=True)
    samples = {k: [] for k in variants}
    for r in range(rounds):
        order = list(variants) if r % 2 == 0 else list(variants)[::-1]
        for name in order:
            fn = variants[name]
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            dt = (time.perf_counter() - t0 - rt) / reps
            samples[name].append(dt)
            print(f"  round {r} {name}: {dt/steps*1e3:.3f} ms/step",
                  flush=True)
    floor = {k: min(v) for k, v in samples.items()}
    clean = [r for r in range(rounds)
             if any(samples[k][r] <= 1.10 * floor[k] for k in samples)]
    dropped = rounds - len(clean)
    if dropped:
        print(f"contention guard: dropped {dropped}/{rounds} round(s) "
              f"where every variant ran >10% over its session floor",
              flush=True)
    if len(clean) < 2:
        print("contention guard: <2 clean rounds — medians use ALL "
              "rounds; rerun this A/B, the session is untrustworthy",
              flush=True)
        clean = list(range(rounds))
    return {k: statistics.median([v[r] for r in clean])
            for k, v in samples.items()}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["fused", "window", "attn", "s8",
                                    "dsem", "longwin", "unembed",
                                    "rawdot", "chunk", "pair", "tiles",
                                    "tiles2", "kmajor"])
    p.add_argument("--config", default="int4_1b")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--context", type=int, default=1024)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--rounds", type=int, default=6)
    args = p.parse_args()

    spec = CONFIGS[args.config]
    if args.mode in ("window", "longwin"):
        args.max_seq = max(args.max_seq, 8192)
        args.context = min(args.context, 512)
    cfg = spec["preset"](max_seq_len=args.max_seq)
    print(f"devices: {jax.devices()}", flush=True)
    raw = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    base = raw
    if spec["bits"]:
        base = quant.quantize_tree(raw, spec["bits"])

    b = args.batch
    tokens = jnp.full((b,), 17, jnp.int32)
    positions = jnp.full((b,), args.context, jnp.int32)
    active = jnp.ones((b,), bool)

    window = 1024
    while window < args.context + args.steps + 2:
        window *= 2
    window = min(window, args.max_seq)

    state = {}

    def make_runner(name, params, win, max_seq=None, paired=False):
        params = jax.tree.map(jax.device_put, params)
        cache = create_cache(cfg, b, max_seq or args.max_seq,
                             dtype=jnp.bfloat16,
                             quantized=spec["kv_quant"], paired=paired)
        loops = generate.CacheLoops(cache)  # pinned boundary layouts
        cache = loops.pin_cache(cache)
        sstate = generate.SamplingState.greedy(b)
        state[name] = (cache, sstate)

        def run():
            cache, sstate = state[name]
            out, _, _, _, _, _, cache, sstate, _, _, _ = loops.decode_loop(
                params, cfg, tokens, positions, active, cache, sstate,
                args.steps, window=win)
            state[name] = (cache, sstate)
            sync(out)
        return run

    if args.mode == "fused":
        variants = {
            "unfused": make_runner("unfused", base, window),
            "fused": make_runner("fused", llama.fuse_projections(base),
                                 window),
        }
    elif args.mode == "attn":
        # per-slot vs slot-batched flash decode kernel. The env var is
        # read at TRACE time; distinct static `window` values force
        # distinct jit cache entries while window == max_seq keeps the
        # compute identical (s_live clamps to s either way).
        import os
        fusedp = llama.fuse_projections(base)
        os.environ["GABBY_ATTN_MULTI"] = "1"
        multi = make_runner("slot-batched", fusedp, args.max_seq)
        multi()  # trace now, under MULTI=1
        os.environ["GABBY_ATTN_MULTI"] = "0"
        single = make_runner("per-slot", fusedp, None)
        single()  # trace now, under MULTI=0
        variants = {"per-slot": single, "slot-batched": multi}
    elif args.mode == "s8":
        # s8 vs bf16 MXU dots in the quantized-cache attention kernel
        import os
        fusedp = llama.fuse_projections(base)
        os.environ["GABBY_ATTN_S8"] = "1"
        s8 = make_runner("s8-dots", fusedp, args.max_seq)
        s8()
        os.environ["GABBY_ATTN_S8"] = "0"
        bf16 = make_runner("bf16-dots", fusedp, None)
        bf16()
        variants = {"bf16-dots": bf16, "s8-dots": s8}
    elif args.mode == "dsem":
        # Mosaic dimension_semantics on the stacked matmul grid
        import os
        fusedp = llama.fuse_projections(base)
        os.environ["GABBY_QMM_DSEM"] = "1"
        dsem = make_runner("dsem", fusedp, args.max_seq)
        dsem()
        os.environ["GABBY_QMM_DSEM"] = "0"
        plain = make_runner("plain", fusedp, None)
        plain()
        variants = {"plain": plain, "dsem": dsem}
    elif args.mode == "rawdot":
        # one-plane raw-byte-dot int4 unpack vs the two-plane kernel
        # (docs/NEXT.md round-4 item 1; quant_matmul rawdot kernel)
        import os
        fusedp = llama.fuse_projections(base)
        os.environ["GABBY_INT4_RAWDOT"] = "1"
        raw = make_runner("rawdot", fusedp, args.max_seq)
        raw()
        os.environ["GABBY_INT4_RAWDOT"] = "0"
        plain = make_runner("two-plane", fusedp, None)
        plain()
        variants = {"two-plane": plain, "rawdot": raw}
    elif args.mode == "chunk":
        # decode-attention chunk size: a 2048-window at ctx ~1k DMAs a
        # mostly-masked trailing 1024-chunk; 512 trims the over-read at
        # the cost of 2x grid steps (attention.attn_chunk)
        import os
        fusedp = llama.fuse_projections(base)
        os.environ["GABBY_ATTN_CHUNK"] = "512"
        c512 = make_runner("chunk-512", fusedp, args.max_seq)
        c512()
        os.environ["GABBY_ATTN_CHUNK"] = "1024"
        c1024 = make_runner("chunk-1024", fusedp, None)
        c1024()
        variants = {"chunk-1024": c1024, "chunk-512": c512}
    elif args.mode == "pair":
        # paired kv-head cache layout: block-diagonal attention dots at
        # 128-deep contraction — half the MXU passes on the structural
        # GQA bottleneck (BASELINE.md r3 "why the attention gap is
        # structural"). Distinct cache SHAPES, so the variants compile
        # separate programs without any env knob.
        fusedp = llama.fuse_projections(base)
        variants = {
            "per-head": make_runner("per-head", fusedp, window),
            "paired": make_runner("paired", fusedp, window, paired=True),
        }
    elif args.mode == "tiles":
        # 2 MB ("mid") vs 4 MB ("big") weight-tile budgets. The explicit
        # scoped-VMEM limit (ops/pallas.vmem_limit_bytes pins Mosaic's
        # ceiling per kernel) makes "big" compile on terminals whose
        # ambient limit is tight — this A/B decides whether it should be
        # the default everywhere. Tile sizes bind at TRACE time (module
        # global), so each variant traces right after its budget is set;
        # distinct static windows keep the jit cache entries apart.
        from gabby_tpu.ops.pallas import quant_matmul as pqm
        fusedp = llama.fuse_projections(base)
        pqm.set_tile_budget("big")
        big = make_runner("big-4MB", fusedp, args.max_seq)
        big()  # trace now, under the big budget
        pqm.set_tile_budget("mid")
        mid = make_runner("mid-2MB", fusedp, None)
        mid()
        variants = {"mid-2MB": mid, "big-4MB": big}
    elif args.mode == "tiles2":
        # 4 MB vs 8 MB weight tiles (the next rung of the same ladder;
        # run AFTER "tiles" shows big >= mid)
        from gabby_tpu.ops.pallas import quant_matmul as pqm
        fusedp = llama.fuse_projections(base)
        pqm.set_tile_budget("huge")
        huge = make_runner("huge-8MB", fusedp, args.max_seq)
        huge()
        pqm.set_tile_budget("big")
        big = make_runner("big-4MB", fusedp, None)
        big()
        variants = {"big-4MB": big, "huge-8MB": huge}
    elif args.mode == "kmajor":
        # full-N (k-major) weight tiles vs the default column panels:
        # contiguous HBM streaming per tile (r5 profile hypothesis — the
        # XLA unembed's contiguous stream runs ~1.0x its DMA floor, the
        # tiled kernels 1.4-1.7x). Env read at TRACE time; distinct
        # static windows keep the jit cache entries apart.
        import os
        fusedp = llama.fuse_projections(base)
        os.environ["GABBY_QMM_KMAJOR"] = "1"
        kmaj = make_runner("kmajor", fusedp, args.max_seq)
        kmaj()  # trace now, under the k-major tiling
        os.environ["GABBY_QMM_KMAJOR"] = "0"
        panel = make_runner("panels", fusedp, None)
        panel()
        variants = {"panels": panel, "kmajor": kmaj}
    elif args.mode == "unembed":
        # int8 per-channel vs int4 group-scale unembed table (the [D, V]
        # stream is 29% of all decode bytes on the 1B; quality gated by
        # tests/test_ppl.py::test_int4_unembed_ppl_delta)
        bits = spec["bits"] or 4
        u8 = llama.fuse_projections(quant.quantize_tree(raw, bits))
        u4 = llama.fuse_projections(quant.quantize_tree(
            raw, bits, unembed_bits=4, unembed_group=256))
        variants = {
            "unembed-int8": make_runner("unembed-int8", u8, window),
            "unembed-int4g": make_runner("unembed-int4g", u4, window),
        }
    elif args.mode == "longwin":
        # VERDICT r2 item 4's done-criterion: an 8k-PROVISIONED window at
        # ctx 512 vs a 2k window at the same live context, one session
        fusedp = llama.fuse_projections(base)
        variants = {
            "max_seq-2048": make_runner("max_seq-2048", fusedp, 1024,
                                        max_seq=2048),
            "max_seq-8192+win": make_runner("max_seq-8192+win", fusedp,
                                            1024, max_seq=8192),
        }
    else:
        fused = llama.fuse_projections(base)
        variants = {
            "full": make_runner("full", fused, None),
            "window": make_runner("window", fused, window),
        }
        print(f"window bucket = {window} (max_seq {args.max_seq}, "
              f"ctx {args.context})", flush=True)

    med = time_variants(variants, args.steps, args.reps, args.rounds)
    for name, sec in med.items():
        ms = sec / args.steps * 1e3
        print(f"RESULT {name}: {ms:.3f} ms/step  "
              f"({b / (sec / args.steps):.0f} tok/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
