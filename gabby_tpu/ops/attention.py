"""Grouped-query attention — jnp reference implementations.

These are the semantics contracts for the Pallas kernels in
gabby_tpu/ops/pallas/: `causal_attention` (prefill) and `cache_attention`
(decode against a fixed-shape KV cache with per-slot lengths). The jnp
versions run everywhere (CPU tests, interpret mode) and are what XLA compiles
when kernels are disabled.

Replaces the attention the reference never built (its generator is a stub,
/root/reference/src/inference/generator.cc:33-38); capability defined by the
north-star configs in BASELINE.json.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite: keeps fully-masked rows NaN-free


def _split_groups(q: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    """[B, T, Nq, H] -> [B, T, Nk, G, H]."""
    b, t, nq, h = q.shape
    return q.reshape(b, t, num_kv_heads, nq // num_kv_heads, h)


def _gqa_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              mask: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q: [B,T,Nk,G,H]; k,v: [B,S,Nk,H]; mask: [B,T,S] bool (True = attend)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("btkgh,bskh->bkgts", qf, kf) * scale
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("bkgts,bskh->btkgh", probs, vf)
    b, t, nk, g, h = out.shape
    return out.reshape(b, t, nk * g, h)


def causal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     *, q_offset: int = 0,
                     scale: Optional[float] = None) -> jnp.ndarray:
    """Prefill attention.

    q: [B, T, Nq, H] for global query positions q_offset .. q_offset+T-1.
    k, v: [B, S, Nk, H] covering global key positions 0 .. S-1 (S = q_offset+T
    for chunked prefill, S = T for a fresh prompt).
    Query i attends to keys j with j <= q_offset + i. Output dtype == q dtype.
    """
    b, t, nq, h = q.shape
    s = k.shape[1]
    if scale is None:
        scale = h ** -0.5
    qpos = q_offset + jnp.arange(t)[:, None]  # [T, 1]
    kpos = jnp.arange(s)[None, :]  # [1, S]
    mask = jnp.broadcast_to(kpos <= qpos, (b, t, s))
    out = _gqa_core(_split_groups(q, k.shape[2]), k, v, mask, scale)
    return out.astype(q.dtype)


def cache_attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                    positions: jnp.ndarray,
                    *, scale: Optional[float] = None) -> jnp.ndarray:
    """Decode attention against a fixed-shape cache.

    q: [B, 1, Nq, H] — the current token's queries, at position positions[b].
    k_cache, v_cache: [B, S_max, Nk, H]; entries 0..positions[b] are valid
    (the current token's k/v must already be written at positions[b]).
    positions: [B] int32. Output: [B, 1, Nq, H], dtype of q.
    """
    b, t, nq, h = q.shape
    s = k_cache.shape[1]
    if scale is None:
        scale = h ** -0.5
    mask = jnp.arange(s)[None, None, :] <= positions[:, None, None]  # [B,1,S]
    out = _gqa_core(_split_groups(q, k_cache.shape[2]), k_cache, v_cache,
                    mask, scale)
    return out.astype(q.dtype)
