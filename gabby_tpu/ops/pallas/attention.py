"""GQA decode attention Pallas kernel (bf16 or INT8 KV cache).

One decode step attends [B, 1, Nq, H] queries against the HEAD-MAJOR cache
[B, Nk, S, H] with per-slot valid lengths. Grid = (B, Nk): each program
streams ONE contiguous (slot, kv-head) [S, H] plane HBM->VMEM exactly once
and computes all G = Nq/Nk grouped query heads against it — the minimum
possible HBM traffic for decode attention, which is what bounds decode
throughput (SURVEY.md §6, BASELINE.json north star).

INT8 KV never materializes dequantized: k's scale folds into the score
(q·codes_j * k_scale_j) and v's scale folds into the probability
(p_j * v_scale_j) before the PV matmul, so the VPU touches [S] scale
vectors instead of [S, H] planes.

Numerics match ops/attention._gqa_core: f32 scores, exp-normalized softmax
with a large-negative mask (NaN-free for fully-masked rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabby_tpu.ops import pallas as pk

NEG_INF = -1e30


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    """pos: [B,1] SMEM (whole array); q: [1,1,G,H]; k,v: [1,1,S,H]."""
    pos = pos_ref[pl.program_id(0), 0]
    qg = q_ref[0, 0].astype(jnp.float32)   # [G, H]
    k = k_ref[0, 0].astype(jnp.float32)    # [S, H]
    v = v_ref[0, 0].astype(jnp.float32)    # [S, H]

    scores = jax.lax.dot_general(
        qg, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # [G, S]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col <= pos, scores, NEG_INF)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)  # [G, H]
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _kernel_quant(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *,
                  sm_scale):
    """INT8 cache: k,v codes [1,1,S,H]; ks,vs scales [1,1,S,1]."""
    pos = pos_ref[pl.program_id(0), 0]
    qg = q_ref[0, 0].astype(jnp.float32)   # [G, H]
    k = k_ref[0, 0].astype(jnp.float32)    # [S, H] codes
    v = v_ref[0, 0].astype(jnp.float32)    # [S, H] codes
    ks = ks_ref[0, 0, :, 0]                # [S]
    vs = vs_ref[0, 0, :, 0]                # [S]

    scores = jax.lax.dot_general(
        qg, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = scores * (ks * sm_scale)[None, :]           # fold k scale in
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col <= pos, scores, NEG_INF)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    pv = probs * vs[None, :]                             # fold v scale in
    out = jnp.dot(pv, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "out_dtype", "interpret"))
def _decode_call(q4, k_cache, v_cache, k_scale, v_scale, pos2d, *,
                 sm_scale: float, out_dtype, interpret: bool):
    """q4: [B, Nk, G, H]; k/v_cache: [B, Nk, S, H];
    k/v_scale: [B, Nk, S, 1] or None; pos2d: [B, 1] i32."""
    b, nk, g, h = q4.shape
    s = k_cache.shape[2]
    quant = k_scale is not None

    in_specs = [
        pl.BlockSpec((b, 1), lambda bb, hh: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, g, h), lambda bb, hh: (bb, hh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s, h), lambda bb, hh: (bb, hh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s, h), lambda bb, hh: (bb, hh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [pos2d, q4, k_cache, v_cache]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, s, 1), lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, 1), lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
        kernel = functools.partial(_kernel_quant, sm_scale=sm_scale)
    else:
        kernel = functools.partial(_kernel, sm_scale=sm_scale)

    kv_bytes = 2 * b * nk * s * h * k_cache.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=(b, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, h), lambda bb, hh: (bb, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nk, g, h), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nk * g * s * h,
            bytes_accessed=kv_bytes + b * nk * g * h * 4,
            transcendentals=b * nk * g * s),
        interpret=interpret,
    )(*args)


def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, positions: jnp.ndarray,
                     k_scale=None, v_scale=None, *,
                     scale=None) -> jnp.ndarray:
    """q: [B, 1, Nq, H]; k/v_cache: [B, Nk, S, H] (values or int8 codes);
    k_scale/v_scale: [B, Nk, S] f32 when the cache is quantized.
    positions: [B] i32 (attend to j <= positions[b]). Returns [B, 1, Nq, H]
    in q.dtype."""
    b, t, nq, h = q.shape
    nk = k_cache.shape[1]
    assert t == 1, "decode kernel is single-position"
    sm_scale = float(scale) if scale is not None else h ** -0.5
    q4 = q[:, 0].reshape(b, nk, nq // nk, h)  # grouped heads, metadata-only
    ks = k_scale[..., None] if k_scale is not None else None
    vs = v_scale[..., None] if v_scale is not None else None
    out = _decode_call(q4, k_cache, v_cache, ks, vs,
                       positions.reshape(b, 1).astype(jnp.int32),
                       sm_scale=sm_scale, out_dtype=q.dtype,
                       interpret=pk.interpret_mode())
    return out.reshape(b, 1, nq, h)


def supported(nq: int, nk: int, h: int) -> bool:
    return nq % nk == 0
