"""Speculation economics on real text: replay a mixed-genre corpus through
the engine with --speculate on vs off and record acceptance, the measured
break-even, and net tok/s (VERDICT r3 item 7).

The corpus (bench_data/spec_corpus.txt) mixes genres by n-gram
self-similarity: API docs and FAQs (high repetition — speculation's best
case), structured logs/changelogs (medium), code (medium), and prose
(low). Each `=== DOC:` section becomes one continuation request.

With --model-dir this measures REAL acceptance (the model actually
continues the text, so n-gram prompt-lookup drafts hit or miss on real
language). With random weights only the MECHANISM cost is meaningful —
outputs are noise, so acceptance is reported with that caveat.

Usage:
  python tools/spec_probe.py                         # random 1B, TPU
  python tools/spec_probe.py --model-dir ~/models/llama-3.2-1b --quant 4
  JAX_PLATFORMS=cpu python tools/spec_probe.py --preset tiny --gen 16
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def load_corpus(path: str) -> list[str]:
    """Each `=== DOC: <title> ===\\n<body>` section -> its BODY text."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    docs = []
    for frag in text.split("=== DOC:"):
        if "===" not in frag:
            continue
        body = frag.split("===", 1)[1].strip()
        if body:
            docs.append(body)
    return docs


def run_engine(args, speculate: int, docs: list[str]) -> dict:
    from gabby_tpu import config as cfglib
    from gabby_tpu.models import llama
    from gabby_tpu.ops import quant
    from gabby_tpu.runtime.engine import Engine, EngineConfig
    from gabby_tpu.tokenizer import Tokenizer

    if args.model_dir:
        from gabby_tpu.loader import load_model_dir
        cfg, params, tok = load_model_dir(
            args.model_dir, dtype=jnp.bfloat16,
            quant_bits=args.quant or None, max_seq_len=args.max_seq)
    else:
        cfg = getattr(cfglib, args.preset)(max_seq_len=args.max_seq)
        params = llama.init_params(cfg, jax.random.PRNGKey(0),
                                   dtype=jnp.bfloat16)
        if args.quant:
            params = quant.quantize_tree(params, args.quant)
        tok = Tokenizer.byte_fallback(cfg.vocab_size)
    params = llama.fuse_projections(params)
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=args.slots, max_seq=args.max_seq,
                              kv_quantized=bool(args.quant),
                              speculate_tokens=speculate,
                              spec_reprobe_steps=0,
                              default_max_tokens=args.gen))
    try:
        # warm: one short request per unique prefill schedule
        eng.generate_sync([{"role": "user", "content": docs[0][:256]}],
                          max_tokens=4)
        eng.reset_stats()

        done = []
        lock = threading.Lock()

        def one(doc: str) -> None:
            # raw continuation (no chat template): the model continues the
            # document, which is what prompt-lookup drafting models
            text, fin, np_, nc = eng.generate_sync(
                [{"role": "user", "content": doc}], max_tokens=args.gen)
            with lock:
                done.append(nc)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=one, args=(d,))
                   for d in docs for _ in range(args.repeats)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = eng.stats_snapshot()
        ms = stats.get("spec_macro_steps", 0)
        return {
            "tok_s": sum(done) / wall,
            "tokens": sum(done),
            "wall_s": wall,
            "acceptance": (stats.get("spec_tokens", 0) / ms) if ms else None,
            "macro_steps": ms,
            "breakeven_derived": stats.get("spec_breakeven_derived"),
            "spec_disables": stats.get("spec_disables", 0),
        }
    finally:
        eng.shutdown()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_data", "spec_corpus.txt"))
    p.add_argument("--model-dir", default="")
    p.add_argument("--preset", default="llama32_1b")
    p.add_argument("--quant", type=int, default=4, choices=[0, 4, 8])
    p.add_argument("--speculate", type=int, default=4)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--gen", type=int, default=128)
    p.add_argument("--repeats", type=int, default=2,
                   help="requests per corpus doc")
    args = p.parse_args()

    docs = load_corpus(args.corpus)
    print(f"{len(docs)} docs x {args.repeats}, gen {args.gen}, "
          f"speculate {args.speculate}", flush=True)
    off = run_engine(args, 0, docs)
    print(f"spec OFF: {off['tok_s']:.0f} tok/s ({off['tokens']} tokens in "
          f"{off['wall_s']:.1f}s)", flush=True)
    on = run_engine(args, args.speculate, docs)
    acc = f"{on['acceptance']:.2f}" if on["acceptance"] else "n/a"
    print(f"spec ON:  {on['tok_s']:.0f} tok/s, acceptance {acc} "
          f"tokens/verify over {on['macro_steps']} verifies, "
          f"derived break-even {on['breakeven_derived']}, "
          f"disables {on['spec_disables']}", flush=True)
    print(f"net speedup: {on['tok_s'] / off['tok_s']:.2f}x"
          + ("" if args.model_dir else
             "  [random weights: acceptance is NOT representative of real "
             "text — mechanism cost only]"), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
