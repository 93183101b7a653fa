"""Profile one decode_loop call on the real TPU and aggregate TPU op time.

Usage: python tools/profile_decode.py [--config int4_1b] [--no-fuse]
Prints the top ops by total duration from the xplane trace — the tool that
found the round-1/2 copy regressions (see memory/BASELINE notes: don't
guess, read the trace).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import CONFIGS, sync  # noqa: E402
from gabby_tpu.models import llama  # noqa: E402
from gabby_tpu.ops import quant  # noqa: E402
from gabby_tpu.runtime import generate  # noqa: E402
from gabby_tpu.runtime.kv_cache import create_cache  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="int4_1b")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--context", type=int, default=1024)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--no-fuse", action="store_true")
    p.add_argument("--top", type=int, default=28)
    args = p.parse_args()

    import os
    spec = CONFIGS[args.config]
    cfg = spec["preset"](max_seq_len=args.max_seq)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if spec["bits"]:
        # mirror bench.py's serving layout: int4-grouped unembed default
        params = quant.quantize_tree(
            params, spec["bits"],
            unembed_bits=4 if spec["bits"] == 4 else None,
            unembed_group=256)
    if not args.no_fuse:
        params = llama.fuse_projections(params)
    params = jax.tree.map(jax.device_put, params)
    b = args.batch
    paired = (os.environ.get("GABBY_ATTN_PAIR", "1") != "0"
              and cfg.num_kv_heads % 2 == 0)
    cache = create_cache(cfg, b, args.max_seq, dtype=jnp.bfloat16,
                         quantized=spec["kv_quant"], paired=paired)
    loops = generate.CacheLoops(cache)  # pinned boundary layouts
    cache = loops.pin_cache(cache)
    tokens = jnp.full((b,), 17, jnp.int32)
    positions = jnp.full((b,), args.context, jnp.int32)
    active = jnp.ones((b,), bool)
    sstate = generate.SamplingState.greedy(b)
    window = 1024
    while window < args.context + args.steps + 2:
        window *= 2
    window = min(window, args.max_seq)

    def run(cache, sstate):
        out, _, _, _, _, _, cache, sstate, _, _, _ = loops.decode_loop(
            params, cfg, tokens, positions, active, cache, sstate,
            args.steps, window=window)
        return out, cache, sstate

    out, cache, sstate = run(cache, sstate)
    sync(out)  # compile + warm
    logdir = tempfile.mkdtemp(prefix="gabby-prof-")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out, cache, sstate = run(cache, sstate)
        sync(out)

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace written", logdir)
        return 1
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find the TPU device pid (largest total X-event time not on host)
    names = {e.get("pid"): e.get("args", {}).get("name", "")
             for e in events if e.get("ph") == "M"
             and e.get("name") == "process_name"}
    agg: dict = {}
    pid_total: dict = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        pid_total[pid] = pid_total.get(pid, 0) + e.get("dur", 0)
    # pick the pid whose process name mentions TPU/device, else max total
    tpu_pids = [p for p, n in names.items()
                if "TPU" in n or "/device" in n.lower()]
    pid = max(tpu_pids or pid_total, key=lambda p: pid_total.get(p, 0))
    print(f"TPU pid {pid} ({names.get(pid)!r}), "
          f"total {pid_total[pid]/1e3:.1f} ms over 3 calls x "
          f"{args.steps} steps", flush=True)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != pid:
            continue
        name = e["name"]
        d = agg.setdefault(name, [0, 0])
        d[0] += e.get("dur", 0)
        d[1] += 1
    per_step = 3 * args.steps
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
    for name, (dur, cnt) in rows:
        print(f"{dur/per_step:9.1f} us/step  x{cnt:6d}  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
