"""On-chip ENGINE parity probe for the paired kv-head layout.

`tools/pair_chip_check.py` proves the compiled paired KERNELS match
per-head on real hardware (prefill_batch_chunk + decode_loop at
window == max_seq). The round-3 failure was one level up: the first
paired ENGINE run on chip collapsed (serve_mixed 17.8 tok/s, early-EOS
truncation) while every CPU/interpret test passes. This probe drives the
legs only the Engine exercises — per-slot CHUNKED prefill
(jnp-fallback attention under pairing), live-context WINDOW buckets
(window < max_seq), burst admissions, slot churn — with greedy
requests of mixed lengths, paired vs per-head, on the real TPU. Streams
must be byte-identical.

Usage: python tools/pair_engine_chip_check.py [--layers 4]
"""

from __future__ import annotations

import argparse
import random
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gabby_tpu import config as cfglib  # noqa: E402
from gabby_tpu.models import llama  # noqa: E402
from gabby_tpu.ops import quant  # noqa: E402
from gabby_tpu.runtime.engine import Engine, EngineConfig  # noqa: E402
from gabby_tpu.tokenizer import Tokenizer  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--gen", type=int, default=48)
    args = p.parse_args()

    cfg = cfglib.ModelConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_layers=args.layers, num_heads=32, num_kv_heads=8, head_dim=64,
        rope_theta=500000.0, tie_word_embeddings=True,
        max_seq_len=args.max_seq)  # 1B shapes, fewer layers
    print(f"devices: {jax.devices()}", flush=True)
    params = llama.fuse_projections(
        quant.quantize_tree(
            llama.init_params(cfg, jax.random.PRNGKey(0),
                              dtype=jnp.bfloat16), 4))
    params = jax.tree.map(jax.device_put, params)
    tok = Tokenizer.byte_fallback(cfg.vocab_size)

    # mixed prompt lengths: short (single chunk), ~1.5 chunks (forces the
    # chunked-prefill seam), and long enough that the engine's live-
    # context window bucket stays < max_seq for part of the decode
    rng = random.Random(7)
    lens = [40, 120, 300, 600, 900, 90, 450, 200]
    prompts = [[rng.randrange(1, cfg.vocab_size) for _ in range(n)]
               for n in lens]

    streams = {}
    for name, paired in (("per-head", False), ("paired", True)):
        eng = Engine(cfg, params, tok, EngineConfig(
            batch_slots=4, max_seq=args.max_seq, steps_per_call=8,
            steps_per_call_busy=4, default_max_tokens=args.gen,
            kv_quantized=True, pair_kv_heads=paired))
        try:
            reqs = [eng.submit_ids(ids) for ids in prompts]
            outs = []
            for r in reqs:
                parts, fin = [], None
                while fin is None:
                    delta, fin = r.out.get(timeout=600)
                    if delta:
                        parts.append(delta)
                outs.append(("".join(parts), fin, r.completion_tokens))
        finally:
            eng.shutdown()
        streams[name] = outs
        print(f"{name}: " + " ".join(
            f"[{i}] fin={fin} n={n}" for i, (_, fin, n) in enumerate(outs)),
            flush=True)

    bad = [i for i, (a, b) in enumerate(zip(streams["per-head"],
                                            streams["paired"])) if a != b]
    if not bad:
        print("PAIR_ENGINE_CHIP_CHECK OK: all request streams identical",
              flush=True)
        return 0
    for i in bad:
        a, b = streams["per-head"][i], streams["paired"][i]
        print(f"MISMATCH req {i} (len {lens[i]}): per-head fin={a[1]} "
              f"n={a[2]} vs paired fin={b[1]} n={b[2]}", flush=True)
        print(f"  per-head: {a[0][:120]!r}", flush=True)
        print(f"  paired:   {b[0][:120]!r}", flush=True)
    print(f"PAIR_ENGINE_CHIP_CHECK MISMATCH: {len(bad)}/{len(lens)} "
          f"requests differ", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
