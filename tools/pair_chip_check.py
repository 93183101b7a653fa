"""On-chip correctness probe for the paired kv-head layout.

The CPU/interpret parity tests prove paired == per-head algebra; this
probe proves the COMPILED Mosaic kernels agree on the real TPU (a
miscompile would pass interpret tests and still serve garbage — round-3
serve_mixed collapsed to 17.8 tok/s with early-EOS truncation the first
time the paired engine path ran on hardware). Greedy decode, 1B-shaped
config scaled down in layers, paired vs per-head: token streams must be
IDENTICAL, and the engine prefill path must produce the same first token.

Usage: python tools/pair_chip_check.py [--layers 4] [--steps 32]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gabby_tpu import config as cfglib  # noqa: E402
from gabby_tpu.models import llama  # noqa: E402
from gabby_tpu.ops import quant  # noqa: E402
from gabby_tpu.runtime import generate  # noqa: E402
from gabby_tpu.runtime.kv_cache import create_cache  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--context", type=int, default=256)
    p.add_argument("--max-seq", type=int, default=1024)
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

    b = args.batch
    # real prefill so both caches hold identical, nontrivial history
    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, args.context),
                                0, cfg.vocab_size, jnp.int32)
    toks = {}
    for name, paired in (("per-head", False), ("paired", True)):
        cache = create_cache(cfg, b, args.max_seq, dtype=jnp.bfloat16,
                             quantized=True, paired=paired)
        loops = generate.CacheLoops(cache)
        cache = loops.pin_cache(cache)
        lengths = jnp.full((b,), args.context, jnp.int32)
        lane_mask = jnp.ones((b,), bool)
        logits, cache = loops.prefill_batch_chunk(
            params, cfg, prompt, lengths, lane_mask, cache, 0)
        last = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        positions = jnp.full((b,), args.context, jnp.int32)
        active = jnp.ones((b,), bool)
        sstate = generate.SamplingState.greedy(b)
        out = loops.decode_loop(params, cfg, last, positions, active,
                                cache, sstate, args.steps,
                                window=args.max_seq)
        toks[name] = jax.device_get(out[0])
        print(f"{name}: first-token {jax.device_get(last)[:4]} "
              f"tokens[0,:8] {toks[name][0, :8]}", flush=True)

    if (toks["per-head"] == toks["paired"]).all():
        print("PAIR_CHIP_CHECK OK: paired greedy stream identical to "
              "per-head", flush=True)
        return 0
    mism = (toks["per-head"] != toks["paired"]).mean()
    print(f"PAIR_CHIP_CHECK MISMATCH: {mism:.1%} of tokens differ",
          flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
