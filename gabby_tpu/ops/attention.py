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

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite: keeps fully-masked rows NaN-free

# Decode-attention dispatch (measured, BASELINE.md): the Pallas flash
# kernel ALWAYS wins for a stacked QUANTIZED cache — the XLA path must
# dynamic-slice each layer's codes+scales out of the stacked cache every
# step (a full HBM copy the profile showed at ~0.65 ms/step on the 1B
# bench; the kernel indexes the layer via scalar prefetch instead), and
# its chunk-skip reads only the live context at long max_seq (8k: 3.0 vs
# 4.9 ms/step at ctx 512). For a bf16 cache XLA's fused attention still
# wins at small max_seq. max_seq is static, so the policy keys on it.
KERNEL_ATTN_MIN_SEQ = 4096


def _want_attn_kernel(s_max: int, quantized: bool = False) -> bool:
    import os
    forced = os.environ.get("GABBY_ATTN_KERNEL")
    if forced is not None:
        return forced == "1"
    return quantized or s_max >= KERNEL_ATTN_MIN_SEQ


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
                    *, scale: Optional[float] = None, **kw) -> jnp.ndarray:
    """Decode attention against a fixed-shape, HEAD-MAJOR cache.

    q: [B, 1, Nq, H] — the current token's queries, at position positions[b].
    k_cache, v_cache: [B, Nk, S_max, H] (runtime/kv_cache.KVCache layout) —
    or the full stacked [L, B, Nk, S_max, H] with a traced `layer=` kwarg
    (the decode scan carries the whole cache; passing it unsliced lets the
    Pallas kernel index the layer via scalar prefetch with zero copies);
    entries 0..positions[b] are valid (the current token's k/v must already
    be written at positions[b]). positions: [B] int32.
    Output: [B, 1, Nq, H], dtype of q.

    Dispatches to the Pallas decode kernel when enabled (one HBM pass over
    each contiguous (slot, kv head) [S, H] plane); this jnp body is the
    contract it is tested against.
    """
    b, t, nq, h = q.shape
    layer = kw.pop("layer", None)
    fresh_k = kw.pop("fresh_k", None)
    fresh_v = kw.pop("fresh_v", None)
    window = kw.pop("window", None)
    assert not kw, f"unknown kwargs {kw}"
    paired = k_cache.shape[-1] == 2 * h  # kv_cache.create_cache(paired=)
    nk = k_cache.shape[2 if layer is not None else 1] * (2 if paired else 1)
    s_max = k_cache.shape[3 if layer is not None else 2]
    if t == 1 and nq % nk == 0 and _want_attn_kernel(s_max):
        from gabby_tpu.ops import pallas as pk
        if pk.kernels_enabled():
            from gabby_tpu.ops.pallas import attention as pattn
            return pattn.decode_attention(q, k_cache, v_cache, positions,
                                          layer=layer, fresh_k=fresh_k,
                                          fresh_v=fresh_v, scale=scale,
                                          window=window)
    if layer is not None:  # slice this layer out of the stacked cache
        k_cache = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, False)
        v_cache = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, False)
    if paired:
        from gabby_tpu.runtime.kv_cache import unpair_heads
        k_cache = unpair_heads(k_cache)
        v_cache = unpair_heads(v_cache)
    s = k_cache.shape[2]
    if scale is None:
        scale = h ** -0.5
    kk = jnp.swapaxes(k_cache, 1, 2)  # [B, S, Nk, H]
    vv = jnp.swapaxes(v_cache, 1, 2)
    if fresh_k is not None:
        # fresh-row contract: cache valid for j < pos, the current token's
        # unquantized k/v appended as position S (always attended)
        kk = jnp.concatenate([kk.astype(q.dtype), fresh_k[:, None]], axis=1)
        vv = jnp.concatenate([vv.astype(q.dtype), fresh_v[:, None]], axis=1)
        mask = jnp.concatenate(
            [jnp.arange(s)[None, :] < positions[:, None],
             jnp.ones((q.shape[0], 1), bool)], axis=1)[:, None, :]
    else:
        mask = (jnp.arange(s)[None, None, :]
                <= positions[:, None, None])  # [B,1,S]
    out = _gqa_core(_split_groups(q, nk), kk, vv, mask, scale)
    return out.astype(q.dtype)


def slot_prefill_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                           v_cache: jnp.ndarray, slot: jnp.ndarray,
                           offset: jnp.ndarray, k_scale=None, v_scale=None,
                           *, scale: Optional[float] = None,
                           fresh_k=None, fresh_v=None,
                           layer=None) -> jnp.ndarray:
    """Chunked-prefill attention for ONE slot: q [1, T, Nq, H] (the chunk's
    queries at global positions offset..offset+T-1) against cache row
    `slot` of the head-major cache [B, Nk, S, H] — or the full stacked
    [L, B, Nk, S, H] with a traced `layer=` — whose entries [0, offset+T)
    are valid (the chunk's own k/v already written). Causal: query i
    attends keys j <= offset + i. k/v_scale: [(L,) B, Nk, S] when INT8.

    With fresh_k/fresh_v ([Nk, T, H], the chunk's own unquantized k/v) the
    cache is read strictly below `offset` and the chunk attends itself
    causally at full precision — the form that lets the cache write happen
    once, in place, outside the layer scan.

    Pallas path streams the row in place with chunk skipping; this jnp body
    slices + dequantizes the row and runs the causal reference."""
    paired = k_cache.shape[-1] == 2 * q.shape[-1]
    nk = k_cache.shape[2 if layer is not None else 1] * (2 if paired else 1)
    from gabby_tpu.ops import pallas as pk
    # Paired caches now ride the kernel too (round 5): the round-3/4
    # failure was the whole-head-pair form's score transients (2x rows x
    # 2x lanes = ~24 MB scoped) failing v5e's 16 MB compile limit — the
    # kernel since gained a query-group grid axis that caps each step at
    # ONE group's 2T rows (~8 MB at the 512 bucket), so the paired
    # serving path no longer falls back to the XLA prefill that ate the
    # decode pairing win under paged serving (r4b ladder; docs/NEXT.md
    # item 3). GABBY_PREFILL_PAIR=0 restores the XLA fallback for A/B.
    pair_kernel_ok = (not paired
                      or os.environ.get("GABBY_PREFILL_PAIR", "1") != "0")
    if (fresh_k is not None and pk.kernels_enabled() and pair_kernel_ok
            and q.shape[2] % nk == 0):
        from gabby_tpu.ops.pallas import prefill_attention as pfa
        return pfa.prefill_attention(q, k_cache, v_cache, slot, offset,
                                     k_scale, v_scale, fresh_k=fresh_k,
                                     fresh_v=fresh_v, layer=layer,
                                     scale=scale)
    if layer is not None:
        k_cache = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, False)
        v_cache = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, False)
        if k_scale is not None:
            k_scale = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, False)
            v_scale = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, False)
    row_k = jax.lax.dynamic_index_in_dim(k_cache, slot, 0, keepdims=True)
    row_v = jax.lax.dynamic_index_in_dim(v_cache, slot, 0, keepdims=True)
    if paired:
        from gabby_tpu.runtime.kv_cache import unpair_heads
        row_k = unpair_heads(row_k)
        row_v = unpair_heads(row_v)
    if k_scale is not None:
        from gabby_tpu.runtime.kv_cache import dequantize_kv
        ks = jax.lax.dynamic_index_in_dim(k_scale, slot, 0, keepdims=True)
        vs = jax.lax.dynamic_index_in_dim(v_scale, slot, 0, keepdims=True)
        kk = dequantize_kv(row_k, ks, q.dtype)
        vv = dequantize_kv(row_v, vs, q.dtype)
    else:
        kk, vv = row_k.astype(q.dtype), row_v.astype(q.dtype)
    kk = jnp.swapaxes(kk, 1, 2)  # [1, S, Nk, H]
    vv = jnp.swapaxes(vv, 1, 2)
    if fresh_k is None:
        return causal_attention(q, kk, vv, q_offset=offset, scale=scale)
    # fresh-block contract: past cache rows (j < offset) + the chunk's own
    # unquantized k/v appended, causal within the chunk
    _, t, nq, h = q.shape
    sc = float(scale) if scale is not None else h ** -0.5
    s_max = kk.shape[1]
    kk_ext = jnp.concatenate(
        [kk.astype(q.dtype), jnp.swapaxes(fresh_k, 0, 1)[None]], axis=1)
    vv_ext = jnp.concatenate(
        [vv.astype(q.dtype), jnp.swapaxes(fresh_v, 0, 1)[None]], axis=1)
    past = jnp.broadcast_to(jnp.arange(s_max)[None, :] < offset, (t, s_max))
    causal = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]  # [T, T]
    mask = jnp.concatenate([past, causal], axis=1)[None]  # [1, T, S+T]
    out = _gqa_core(_split_groups(q, nk), kk_ext, vv_ext, mask, sc)
    return out.astype(q.dtype)


def cache_attention_quantized(q: jnp.ndarray, k_codes: jnp.ndarray,
                              v_codes: jnp.ndarray, k_scale: jnp.ndarray,
                              v_scale: jnp.ndarray, positions: jnp.ndarray,
                              *, scale: Optional[float] = None,
                              **kw) -> jnp.ndarray:
    """Decode attention straight off an INT8, head-major KV cache.

    k/v_codes: [B, Nk, S, H] int8 (or stacked [L, ...] with `layer=`);
    k/v_scale: [B, Nk, S] f32 (per-token, per-kv-head symmetric scales;
    runtime/kv_cache.quantize_kv). The Pallas kernel folds the scales into
    scores/probabilities so no dequantized cache plane ever hits memory;
    this jnp fallback dequantizes explicitly (same numerics, more HBM
    traffic)."""
    layer = kw.pop("layer", None)
    fresh_k = kw.pop("fresh_k", None)
    fresh_v = kw.pop("fresh_v", None)
    window = kw.pop("window", None)
    assert not kw, f"unknown kwargs {kw}"
    paired = k_codes.shape[-1] == 2 * q.shape[-1]
    nk = k_codes.shape[2 if layer is not None else 1] * (2 if paired else 1)
    s_max = k_codes.shape[3 if layer is not None else 2]
    from gabby_tpu.ops import pallas as pk
    if (q.shape[1] == 1 and q.shape[2] % nk == 0
            and _want_attn_kernel(s_max, quantized=True)
            and pk.kernels_enabled()):
        from gabby_tpu.ops.pallas import attention as pattn
        return pattn.decode_attention(q, k_codes, v_codes, positions,
                                      k_scale, v_scale, layer=layer,
                                      fresh_k=fresh_k, fresh_v=fresh_v,
                                      scale=scale, window=window)
    if layer is not None:
        k_codes = jax.lax.dynamic_index_in_dim(k_codes, layer, 0, False)
        v_codes = jax.lax.dynamic_index_in_dim(v_codes, layer, 0, False)
        k_scale = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, False)
        v_scale = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, False)
    if paired:
        from gabby_tpu.runtime.kv_cache import unpair_heads
        k_codes = unpair_heads(k_codes)
        v_codes = unpair_heads(v_codes)
    from gabby_tpu.runtime.kv_cache import dequantize_kv
    kk = dequantize_kv(k_codes, k_scale, q.dtype)
    vv = dequantize_kv(v_codes, v_scale, q.dtype)
    return cache_attention(q, kk, vv, positions, scale=scale,
                           fresh_k=fresh_k, fresh_v=fresh_v)


def paged_cache_attention(q: jnp.ndarray, k_pool: jnp.ndarray,
                          v_pool: jnp.ndarray, page_table: jnp.ndarray,
                          positions: jnp.ndarray, k_scale=None, v_scale=None,
                          *, layer, fresh_k, fresh_v,
                          scale: Optional[float] = None) -> jnp.ndarray:
    """Decode attention against a PAGED pool (runtime/paged.PagedKVCache).

    q: [B, 1, Nq, H]; k/v_pool: [P, L, Nk, page, H] (+ scale pools
    [P, L, Nk, page] when quantized); page_table: [B, max_pages] i32.
    Contract matches the fresh-row form of cache_attention: pool rows
    j < positions[b] are attended plus the current token's unquantized
    fresh_k/v as a virtual extra row.

    Dispatches to the paged Pallas kernel (physical page indices ride in
    via scalar prefetch; nothing gathers the pool) when kernels are on;
    this jnp body — gather pages into a dense view, then reuse the dense
    reference — is the contract it is tested against.
    """
    b, t, nq, h = q.shape
    paired = k_pool.shape[-1] == 2 * h
    nk = k_pool.shape[2] * (2 if paired else 1)
    quantized = k_scale is not None
    from gabby_tpu.ops import pallas as pk
    if t == 1 and nq % nk == 0 and pk.kernels_enabled():
        from gabby_tpu.ops.pallas import attention as pattn
        return pattn.paged_decode_attention(
            q, k_pool, v_pool, page_table, positions, k_scale, v_scale,
            layer=layer, fresh_k=fresh_k, fresh_v=fresh_v, scale=scale)

    def dense(pool, heads):
        # [P, L, heads, page, *] -> this layer, gathered: [B, heads, S, *]
        plane = jax.lax.dynamic_index_in_dim(pool, layer, 1, False)
        g = jnp.take(plane, page_table, axis=0)  # [B, mp, heads, page, *]
        g = jnp.moveaxis(g, 1, 2)                # [B, heads, mp, page, *]
        return g.reshape(g.shape[0], heads, -1, *g.shape[4:])

    kk, vv = dense(k_pool, k_pool.shape[2]), dense(v_pool, v_pool.shape[2])
    if paired:
        from gabby_tpu.runtime.kv_cache import unpair_heads
        kk, vv = unpair_heads(kk), unpair_heads(vv)
    if quantized:
        from gabby_tpu.runtime.kv_cache import dequantize_kv
        kk = dequantize_kv(kk, dense(k_scale, nk), q.dtype)
        vv = dequantize_kv(vv, dense(v_scale, nk), q.dtype)
    return cache_attention(q, kk.astype(q.dtype), vv.astype(q.dtype),
                           positions, scale=scale, fresh_k=fresh_k,
                           fresh_v=fresh_v)
