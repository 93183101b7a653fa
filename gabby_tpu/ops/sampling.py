"""Token sampling: greedy / temperature / top-k / top-p.

All parameters are per-slot ARRAYS, not static config, so one compiled
decode step serves a continuously-batched mix of requests with different
sampling settings (no retrace when batch composition churns).

Conventions: temperature == 0 -> greedy; top_k == 0 -> disabled;
top_p >= 1.0 -> disabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def sample(logits: jnp.ndarray, key: jax.Array, *,
           temperature: jnp.ndarray, top_k: jnp.ndarray,
           top_p: jnp.ndarray) -> jnp.ndarray:
    """logits: [B, V] f32; temperature/top_p: [B] f32; top_k: [B] int32.
    Returns sampled token ids [B] int32."""
    b, v = logits.shape
    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp

    # One descending sort serves both top-k and top-p filters.
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    ranks = jnp.arange(v, dtype=jnp.int32)[None, :]

    # top-k: threshold at the k-th largest logit (disabled -> rank v).
    k = jnp.where(top_k > 0, top_k, v).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)
    keep_k = scaled >= kth

    # top-p: smallest prefix of the sorted distribution with mass >= top_p.
    probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # sorted position i is kept iff cumulative mass BEFORE it is < top_p
    keep_sorted = (cum - probs_sorted) < top_p[:, None]
    # map back: find the minimal kept logit value among kept sorted entries
    min_kept = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                       axis=-1, keepdims=True)
    keep_p = scaled >= min_kept

    filtered = jnp.where(keep_k & keep_p, scaled, NEG_INF)
    sampled = jax.random.categorical(key, filtered, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy_ids, sampled)


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
