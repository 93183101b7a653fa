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
    Alternates name order each round; returns name -> median seconds."""
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
    return {k: statistics.median(v) for k, v in samples.items()}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["fused", "window"])
    p.add_argument("--config", default="int4_1b")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--context", type=int, default=1024)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--rounds", type=int, default=6)
    args = p.parse_args()

    spec = CONFIGS[args.config]
    if args.mode == "window":
        args.max_seq = max(args.max_seq, 8192)
        args.context = min(args.context, 512)
    cfg = spec["preset"](max_seq_len=args.max_seq)
    print(f"devices: {jax.devices()}", flush=True)
    base = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if spec["bits"]:
        base = quant.quantize_tree(base, spec["bits"])

    b = args.batch
    tokens = jnp.full((b,), 17, jnp.int32)
    positions = jnp.full((b,), args.context, jnp.int32)
    active = jnp.ones((b,), bool)

    window = 1024
    while window < args.context + args.steps + 2:
        window *= 2
    window = min(window, args.max_seq)

    state = {}

    def make_runner(name, params, win):
        params = jax.tree.map(jax.device_put, params)
        cache = create_cache(cfg, b, args.max_seq, dtype=jnp.bfloat16,
                             quantized=spec["kv_quant"])
        sstate = generate.SamplingState.greedy(b)
        state[name] = (cache, sstate)

        def run():
            cache, sstate = state[name]
            out, _, _, _, _, _, cache, sstate = generate.decode_loop(
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
