"""Perplexity evaluation — the quantization quality gate.

BASELINE.json requires INT8 within 0.1 ppl and INT4 within 0.5 ppl of BF16
on WikiText-2. The protocol here is the standard sliding-window one: the
corpus is tokenized to one stream, split into fixed windows of `seq_len`,
and ppl = exp(mean NLL over all predicted positions) — window position 0
is never scored (no context).

Data: this environment has no network, so the harness takes a LOCAL text
file (WikiText-2's `wiki.test.raw` once downloaded by the user) or a raw
token array; tests drive it with a synthetic corpus, which measures the
same quantization DELTAS the gates care about (the gate is relative to the
same data under BF16, not an absolute number).

Usage:
  python -m gabby_tpu.eval.ppl --model-dir ~/m/llama-3.2-1b \
      --text wiki.test.raw --quant 8
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gabby_tpu.config import ModelConfig
from gabby_tpu.models import llama


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_nll(params, cfg: ModelConfig, tokens: jnp.ndarray):
    """tokens: [B, T] -> (sum NLL over positions 1..T-1, count)."""
    logits = llama.forward(params, cfg, tokens)  # [B, T, V] f32
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    targets = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


def ppl_from_tokens(params, cfg: ModelConfig, token_stream: np.ndarray, *,
                    seq_len: int = 512, batch: int = 4,
                    max_windows: Optional[int] = None) -> float:
    """Perplexity of a flat token stream under the model."""
    n = (len(token_stream) // seq_len) * seq_len
    windows = np.asarray(token_stream[:n], np.int32).reshape(-1, seq_len)
    if max_windows:
        windows = windows[:max_windows]
    total, count = 0.0, 0
    for i in range(0, len(windows), batch):
        chunk = windows[i:i + batch]  # the tail chunk compiles once extra
        s, c = _window_nll(params, cfg, jnp.asarray(chunk))
        total += float(s)
        count += int(c)
    return float(np.exp(total / max(count, 1)))


def evaluate_ppl(params, cfg: ModelConfig, text: str, tokenizer, *,
                 seq_len: int = 512, batch: int = 4,
                 max_windows: Optional[int] = None) -> float:
    ids = tokenizer.encode(text, allow_special=False)
    return ppl_from_tokens(params, cfg, np.asarray(ids, np.int32),
                           seq_len=seq_len, batch=batch,
                           max_windows=max_windows)


def main(argv: Optional[list[str]] = None) -> int:
    import argparse
    import json as jsonlib

    p = argparse.ArgumentParser(prog="gabby_tpu.eval.ppl")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--text", required=True,
                   help="local corpus file (e.g. WikiText-2 wiki.test.raw)")
    p.add_argument("--quant", type=int, default=0, choices=[0, 4, 8])
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--max-windows", type=int, default=0)
    args = p.parse_args(argv)

    from gabby_tpu.loader import load_model_dir
    bits = args.quant if args.quant in (4, 8) else None
    cfg, params, tokenizer = load_model_dir(
        args.model_dir, dtype=jnp.bfloat16, quant_bits=bits)
    with open(args.text, encoding="utf-8") as f:
        text = f.read()
    ppl = evaluate_ppl(params, cfg, text, tokenizer,
                       seq_len=args.seq_len, batch=args.batch,
                       max_windows=args.max_windows or None)
    print(jsonlib.dumps({"ppl": round(ppl, 4), "quant": args.quant or "bf16",
                         "seq_len": args.seq_len}))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
