"""Ring attention over ICI for sequence-sharded prefill (SURVEY §2b SP/CP).

parallel/sp.py shards a long admission's token axis over the mesh's idle
"data" axis and lets GSPMD insert ONE all-gather of the chunk's (GQA-
narrow) K/V heads — the Ulysses trade. That gather materializes the whole
chunk's K/V on every device: fine at serving chunk sizes, but for a
BASELINE-config-5-style long-prompt prefill whose chunk K/V itself
outgrows a chip's HBM headroom, the gather IS the memory wall.

Ring attention removes it: K/V stay sharded, and each device walks the
ring in `dp` steps — score its local queries against the K/V block it
currently holds (online softmax, exactly the flash-attention recurrence),
then rotate the block to its neighbor with `ppermute` over ICI. Peak K/V
memory per device is O(T/dp) instead of O(T), at the cost of dp-1 ICI
hops that XLA overlaps with the per-step score/PV matmuls (each step's
compute touches only the block that already arrived; the rotate for step
s+1 is issued alongside step s's dots — the standard blockwise-
transformer pipeline, Liu et al.'s ring attention expressed in
jax.shard_map + lax.ppermute).

Causality needs only block-relative positions: all tokens share the same
chunk offset, so query i on shard sq sees key j from source shard sk iff
sq*Tl + i >= sk*Tl + j. Numerically this is the same online-softmax sum
as the unsharded reference (tests/test_sp.py pins parity on the virtual
mesh).

SAFETY NOTE (tests/test_pallas_kernels.py shard_map tripwire): this is
the tree's ONLY shard_map region, and it must stay free of the Pallas
int4 kernels — their half-split packing is a GLOBAL-layout invariant
(ops/quant.QTensor), and shard-local execution would silently decode
wrong rows. Everything in here is plain jnp on activations.

Reference: dhconnelly/gabby has no attention and no parallelism
(SURVEY §2b); net-new per BASELINE.json config 5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 moved it to the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older toolchains
    from jax.experimental.shard_map import shard_map as _shard_map

NEG_INF = -1e30


def _ring_body(q, k, v, *, axis_name: str, dp: int, sm_scale: float):
    """Per-shard ring sweep. q: [1, Tl, Nk, G, H] local queries (grouped);
    k/v: [1, Tl, Nk, H] local keys/values. Returns the UNNORMALIZED
    (acc, m, l) online-softmax state so the caller can fold in more
    context (the admission's prior cache rows) before normalizing."""
    me = jax.lax.axis_index(axis_name)
    tl = q.shape[1]
    nk, g, h = q.shape[2], q.shape[3], q.shape[4]
    m = jnp.full((nk, tl, g, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((nk, tl, g, 1), jnp.float32)
    acc = jnp.zeros((nk, tl, g, h), jnp.float32)
    kb, vb = k, v

    for step in range(dp):
        src = (me - step) % dp  # who produced the block we hold now
        s = jnp.einsum("btngh,bsnh->ntgs", q, kb.astype(q.dtype),
                       preferred_element_type=jnp.float32)  # [Nk,Tl,G,Tl]
        s = s * sm_scale
        cols = src * tl + jax.lax.broadcasted_iota(
            jnp.int32, (1, tl, 1, tl), 3)
        vis = cols <= (me * tl + jax.lax.broadcasted_iota(
            jnp.int32, (1, tl, 1, tl), 1))
        s = jnp.where(vis, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        pv = jnp.einsum("ntgs,bsnh->ntgh", p.astype(q.dtype),
                        vb.astype(q.dtype),
                        preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m = m_new
        if step + 1 < dp:
            perm = [(i, (i + 1) % dp) for i in range(dp)]
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
    return acc, m, l


def ring_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                        mesh: Mesh, axis_name: str = "data",
                        sm_scale: float | None = None,
                        cache_k: jnp.ndarray | None = None,
                        cache_v: jnp.ndarray | None = None,
                        cache_len=None) -> jnp.ndarray:
    """Causal self-attention of a token-sharded chunk, K/V kept sharded.

    q: [1, T, Nq, H], k/v: [1, T, Nk, H] — all sharded P(None, axis_name)
    on the token axis (the sp.py layout). cache_k/v: optional REPLICATED
    prior rows [1, S, Nk, H] (the admission's cache below `cache_len`),
    folded into the same online softmax after the ring sweep — replicated
    because every query shard needs all of them, and they are bounded by
    max_seq (the ring handles the axis that grows).

    Returns [1, T, Nq, H] sharded like q. Token positions are chunk-
    relative; query i attends chunk keys j <= i and all cache rows
    j < cache_len.
    """
    b, t, nq, h = q.shape
    nk = k.shape[2]
    g = nq // nk
    dp = mesh.shape[axis_name]
    scale = float(sm_scale) if sm_scale is not None else h ** -0.5
    qg = q.reshape(b, t, nk, g, h)
    has_cache = cache_k is not None
    if has_cache and cache_len is None:
        raise ValueError("cache_k without cache_len")

    in_specs = [P(None, axis_name, None, None, None),
                P(None, axis_name, None, None),
                P(None, axis_name, None, None)]
    args = [qg, k, v]
    if has_cache:
        in_specs += [P(), P(), P()]
        args += [cache_k, cache_v,
                 jnp.asarray(cache_len, jnp.int32).reshape(1)]

    def local(qx, kx, vx, *rest):
        acc, m, l = _ring_body(qx, kx, vx, axis_name=axis_name, dp=dp,
                               sm_scale=scale)
        if rest:
            ck, cv, clen = rest
            s = jnp.einsum("btngh,bsnh->ntgs", qx, ck.astype(qx.dtype),
                           preferred_element_type=jnp.float32)
            s = s * scale
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s.shape[-1]),
                                            3)
            s = jnp.where(cols < clen[0], s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            pv = jnp.einsum("ntgs,bsnh->ntgh", p.astype(qx.dtype),
                            cv.astype(qx.dtype),
                            preferred_element_type=jnp.float32)
            acc = acc * alpha + pv
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        out = acc / jnp.maximum(l, 1e-30)            # [Nk, Tl, G, H]
        return jnp.transpose(out, (1, 0, 2, 3))[None]  # [1, Tl, Nk, G, H]

    out = _shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=P(None, axis_name, None, None, None),
        check_vma=False)(*args)
    return out.reshape(b, t, nq, h).astype(q.dtype)
