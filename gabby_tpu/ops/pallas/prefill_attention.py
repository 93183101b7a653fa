"""Flash prefill attention for single-slot chunked prefill (Pallas).

The admission path (runtime/engine -> models/llama.prefill_slot) attends a
[T]-bucket chunk of ONE slot's prompt against that slot's cache row. The
jnp fallback materializes the (dequantized) [S, H] row and scores the full
row per layer; this kernel streams the row chunk-by-chunk with an online
softmax and:

  * clamps trailing chunks past offset+T to the last needed chunk index —
    consecutive identical block indices skip the HBM fetch, so a chunk at
    offset 0 of an 8k cache touches ~T rows, not 8k (scalar-prefetched
    slot/offset feed the index map);
  * reads the cache IN PLACE via the index map (the jnp path's
    dynamic_index_in_dim copies the whole row out of the cache first);
  * folds INT8 KV scales into scores/probabilities (no dequantized plane).

Grid = (Nk, S-chunks); each program owns all G*T query rows of one kv head
(queries live in VMEM across the whole chunk sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabby_tpu.ops import pallas as pk

NEG_INF = -1e30
CHUNK = 1024


def _kernel(scal_ref, q_ref, k_ref, v_ref, fk_ref, fv_ref, *rest, sm_scale,
            chunk, t, quant, pair=False):
    """scal: [3] SMEM (slot, offset, layer); q: [1, G*T, H];
    k/v: [1, 1, 1, C, H] (PAST cache rows, read strictly j < offset);
    fk/fv: [1, T, H] — the chunk's OWN unquantized k/v for this head,
    attended causally as a final virtual block (so the kernel never reads
    rows written this step and the cache write can happen once, in place,
    after the layer scan); (quant: ks/vs [1, 1, 1, 1, C]);
    out [1, G*T, H]; scratch m,l [G*T, 1] f32, acc [G*T, H] f32.

    pair=True (paired cache layout): the grid runs per (HEAD PAIR, query
    group) — q is the block-diagonal [1, 2T, 2H] for ONE query group
    (rows half-major: the even head's T rows then the odd head's, each
    row zero in the other head's lane half), k/v blocks are
    [1, 1, 1, C, 2H], the scale blocks carry BOTH heads ([1, 1, 2, 1, C]),
    and the output's junk lane half is discarded at the final
    half-select — the decode kernel's block-diagonal trick
    (ops/pallas/attention). The extra query-group grid axis keeps the
    [rows, C] f32 score transients at 1/G of the whole-head-pair form,
    whose ~24 MB scoped footprint failed v5e's 16 MB compile limit
    (the round-3/4 paired-prefill collapse; docs/NEXT.md item 3)."""
    if quant:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
        ks_ref = vs_ref = None
    offset = scal_ref[1]
    c = pl.program_id(2 if pair else 1)
    rows = q_ref.shape[1]

    def row_scales(sc):
        # [2, C] per-head -> per-row [rows, C] (rows half-major)
        if not pair:
            return sc.reshape(1, -1)
        cdim = sc.shape[-1]
        return jnp.broadcast_to(sc.reshape(2, 1, cdim),
                                (2, rows // 2, cdim)).reshape(rows, cdim)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c * chunk < offset)  # past rows only
    def _():
        qg = q_ref[0].astype(jnp.bfloat16)            # [G*T, H]
        k = k_ref[0, 0, 0].astype(jnp.bfloat16)       # [C, H]
        v = v_ref[0, 0, 0].astype(jnp.bfloat16)       # [C, H]
        scores = jax.lax.dot_general(
            qg, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [G*T, C]
        if ks_ref is not None:
            scores = scores * row_scales(ks_ref[0, 0, :, 0, :] * sm_scale)
        else:
            scores = scores * sm_scale
        # past rows are visible to EVERY query (j < offset <= offset + i)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col + c * chunk < offset, scores, NEG_INF)

        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(scores - m_new)
        pv = (p * row_scales(vs_ref[0, 0, :, 0, :])
              if vs_ref is not None else p)
        m_ref[:] = m_new
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            pv.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32)

    @pl.when(c == pl.num_programs(2 if pair else 1) - 1)
    def _():
        # causal pass over the chunk's own (full-precision) k/v
        qg = q_ref[0].astype(jnp.bfloat16)            # [G*T, H]
        kf = fk_ref[0].astype(jnp.bfloat16)           # [T, H]
        vf = fv_ref[0].astype(jnp.bfloat16)           # [T, H]
        scores = jax.lax.dot_general(
            qg, kf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [G*T, T]
        # rows ordered (g, t) — (half, t) when paired — t minor either
        # way, so row % t is the in-chunk query position
        row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) % t
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col <= row, scores, NEG_INF)
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc_ref[:] * alpha + jnp.dot(
            p.astype(jnp.bfloat16), vf, preferred_element_type=jnp.float32)
        out = acc / jnp.maximum(l_new, 1e-30)
        if pair:
            # even-head rows carry lanes [0, H), odd-head rows [H, 2H)
            hd = out.shape[-1] // 2
            o2 = out.reshape(2, rows // 2, 2 * hd)
            osel = jnp.concatenate([o2[:1, :, :hd], o2[1:, :, hd:]], axis=0)
            o_ref[0] = osel.reshape(rows, hd).astype(o_ref.dtype)
        else:
            o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("t", "sm_scale", "out_dtype",
                                    "interpret", "pair"))
def _prefill_call(q3, k_cache, v_cache, fresh_k, fresh_v, k_scale, v_scale,
                  scal, *, t: int, sm_scale: float, out_dtype,
                  interpret: bool, pair: bool = False):
    """q3: [Nk, G*T, H]; k/v_cache: [L, B, Nk, S, H] (full stacked cache);
    k/v_scale: [L, B, Nk, 1, S] or None;
    scal: [3] i32 (slot, offset, layer). pair: paired layout — q3 is the
    block-diagonal [Nk/2, G*2T, 2H] with rows ordered (g, half, t), the
    cache [L, B, Nk/2, S, 2H], scales stay per-head (blocks carry the
    pair's 2 heads), and the grid gains a query-group axis so each step's
    score transients cover one group's 2T rows (not all G*2T — the
    whole-pair form's ~24 MB scoped footprint failed v5e's 16 MB compile
    limit)."""
    nk, gt, h = q3.shape
    h_out = h // 2 if pair else h
    nh_sc = 2 if pair else 1  # scale-block heads per grid step
    s = k_cache.shape[3]
    chunk = min(CHUNK, s)
    n_chunks = pl.cdiv(s, chunk)
    quant = k_scale is not None
    # rows each grid step owns: one query group's 2T block-diagonal rows
    # (paired) or the head's whole G*T (unpaired, round-1 form)
    rows = 2 * t if pair else gt
    n_g = gt // rows

    def last_needed(scal_ref):
        # the furthest PAST cache row any query can see is offset - 1 (the
        # chunk's own rows arrive separately as the fresh block)
        return jnp.maximum(scal_ref[1] - 1, 0) // chunk

    def kv_map(hh, *rest):
        # chunks past the last needed one repeat its index -> no re-fetch
        # (slot/offset/layer arrive via scalar prefetch)
        cc, scal_ref = rest[-2], rest[-1]
        return (scal_ref[2], scal_ref[0], hh,
                jnp.minimum(cc, last_needed(scal_ref)), 0)

    if pair:
        q_map = lambda hh, gg, cc, sc: (hh, gg, 0)
        f_map = lambda hh, gg, cc, sc: (hh, 0, 0)
        grid = (nk, n_g, n_chunks)
    else:
        q_map = lambda hh, cc, sc: (hh, 0, 0)
        f_map = lambda hh, cc, sc: (hh, 0, 0)
        grid = (nk, n_chunks)
    in_specs = [
        pl.BlockSpec((1, rows, h), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, chunk, h), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, chunk, h), kv_map, memory_space=pltpu.VMEM),
    ]  # fresh blocks appended below (before the quant scales)
    args = [q3, k_cache, v_cache, fresh_k, fresh_v]
    in_specs += [
        pl.BlockSpec((1, t, h), f_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, h), f_map, memory_space=pltpu.VMEM),
    ]
    if quant:
        def sc_map(hh, *rest):
            # index units are BLOCK counts: with a 2-head block (paired),
            # index hh addresses heads [2hh, 2hh+2) — the pair's scales
            cc, scal_ref = rest[-2], rest[-1]
            return (scal_ref[2], scal_ref[0], hh, 0,
                    jnp.minimum(cc, last_needed(scal_ref)))
        in_specs += [
            pl.BlockSpec((1, 1, nh_sc, 1, chunk), sc_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nh_sc, 1, chunk), sc_map,
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, h_out), q_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, h), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, sm_scale=sm_scale, chunk=chunk,
                               t=t, quant=quant, pair=pair)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nk, gt, h_out), out_dtype),
        interpret=interpret,
    )(scal, *args)


def prefill_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                      v_cache: jnp.ndarray, slot: jnp.ndarray,
                      offset: jnp.ndarray, k_scale=None, v_scale=None, *,
                      fresh_k=None, fresh_v=None, layer=None,
                      scale=None) -> jnp.ndarray:
    """q: [1, T, Nq, H] chunk queries; k/v_cache: the full stacked
    [L, B, Nk, S, H] cache with a traced `layer` (or [B, Nk, S, H] with
    layer=None) with the chunk's k/v already written at
    [layer, slot, :, offset:offset+T]. Causal: query i attends keys
    j <= offset + i. Returns [1, T, Nq, H] (q dtype)."""
    _, t, nq, h = q.shape
    if layer is None:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        k_scale = k_scale[None] if k_scale is not None else None
        v_scale = v_scale[None] if v_scale is not None else None
        layer = jnp.int32(0)
    paired = k_cache.shape[-1] == 2 * h
    nk = k_cache.shape[2] * (2 if paired else 1)
    g = nq // nk
    sm_scale = float(scale) if scale is not None else h ** -0.5
    # [1, T, Nq, H] -> [Nk, G, T, H] -> [Nk, G*T, H]
    q3 = q[0].reshape(t, nk, g, h).transpose(1, 2, 0, 3).reshape(nk, g * t, h)
    ks = k_scale[:, :, :, None, :] if k_scale is not None else None
    vs = v_scale[:, :, :, None, :] if v_scale is not None else None
    scal = jnp.stack([slot.astype(jnp.int32), offset.astype(jnp.int32),
                      jnp.asarray(layer, jnp.int32)])
    if fresh_k is None:
        # derive the chunk's own rows from q-side caller instead: not
        # supported — the fresh block is required for this kernel
        raise ValueError("prefill kernel requires fresh_k/fresh_v")
    if paired:
        from gabby_tpu.runtime.kv_cache import pair_heads
        # block-diagonal queries ordered (g, half, t) so each grid step
        # takes ONE query group's [2T, 2H] block (the g grid axis keeps
        # the score transients inside v5e's scoped-VMEM compile limit)
        q4 = q3.reshape(nk // 2, 2, g, t, h)  # [pair, half, g, t, h]
        z = jnp.zeros_like(q4[:, 0])
        top = jnp.concatenate([q4[:, 0], z], axis=-1)   # [pair, g, t, 2h]
        bot = jnp.concatenate([z, q4[:, 1]], axis=-1)
        q3p = jnp.concatenate([top, bot], axis=2)       # [pair, g, 2t, 2h]
        q3p = q3p.reshape(nk // 2, g * 2 * t, 2 * h)
        fresh_k = pair_heads(fresh_k)    # [Nk/2, T, 2H]
        fresh_v = pair_heads(fresh_v)
        out = _prefill_call(q3p, k_cache, v_cache, fresh_k, fresh_v, ks, vs,
                            scal, t=t, sm_scale=sm_scale, out_dtype=q.dtype,
                            interpret=pk.interpret_mode(), pair=True)
        # [Nk/2, G*2T, H] rows (g, half, t) -> head-major [1, T, Nq, H]
        o = out.reshape(nk // 2, g, 2, t, h)
        o = o.transpose(3, 0, 2, 1, 4)   # [t, pair, half, g, h]
        return o.reshape(1, t, nq, h)
    out = _prefill_call(q3, k_cache, v_cache, fresh_k, fresh_v, ks, vs,
                        scal, t=t, sm_scale=sm_scale, out_dtype=q.dtype,
                        interpret=pk.interpret_mode())
    # [Nk, G*T, H] -> [1, T, Nq, H]
    return out.reshape(nk, g, t, h).transpose(2, 0, 1, 3).reshape(
        1, t, nq, h)
