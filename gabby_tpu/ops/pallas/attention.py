"""GQA flash-decode attention Pallas kernel (bf16 or INT8 KV cache).

One decode step attends [B, 1, Nq, H] queries against the FULL stacked
head-major cache [L, B, Nk, S, H] with per-slot valid lengths. The layer
index rides in via scalar prefetch, so the caller (the per-layer scan body
in models/llama.decode_step, where the cache is a loop CARRY updated in
place) never slices a layer out of the cache — a dynamic-slice there would
copy 2*B*Nk*S*H bytes per layer per step, which the profiler showed costing
more than the attention itself.

Grid = (B, S-chunks): each grid step streams ALL kv heads' [CHUNK, H]
planes for one slot (a ~2 MB DMA — sized so per-step overhead is noise
against DMA time) and folds them into per-head online-softmax carries in
scratch. Heads are a small unrolled loop in-kernel; decode attention is
HBM-bound, so MXU utilization of the tiny [G, H] dots is irrelevant.

The part that makes decode attention scale with the REAL context instead of
max_seq: `positions` rides in the same scalar-prefetch vector and the chunk
index map CLAMPS trailing fully-masked chunks to the last valid chunk.
Pallas skips the HBM fetch when consecutive grid steps map to the same
block, so a slot at position 1k in an 8k cache streams ~1k rows, not 8k.

INT8 KV never materializes dequantized: k's scale folds into the score
(q·codes_j * k_scale_j) and v's scale folds into the probability
(p_j * v_scale_j) before the PV matmul, so the VPU touches [CHUNK] scale
vectors instead of [CHUNK, H] planes.

Numerics match ops/attention._gqa_core (f32 math; exp-normalized softmax;
large-negative mask) up to online-softmax reassociation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabby_tpu.ops import pallas as pk

NEG_INF = -1e30
CHUNK = 1024  # default cache rows per grid step per head (see attn_chunk)


def attn_chunk() -> int:
    """Cache rows per decode-attention grid step — a TRACE-time env knob
    (GABBY_ATTN_CHUNK) for A/B-ing the over-read vs grid-overhead trade:
    a window bucket just past a chunk boundary (e.g. live ctx 1090 in a
    2048 window) DMAs a mostly-masked trailing chunk; a smaller chunk
    trims that over-read but multiplies grid steps. Distinct values
    produce distinct static shapes, so A/Bs compile separate programs
    (same pattern as GABBY_ATTN_MULTI)."""
    import os
    return int(os.environ.get("GABBY_ATTN_CHUNK", str(CHUNK)))


def s8_attention() -> bool:
    """s8 MXU dots inside the quantized-cache decode kernel (see
    _flash_step's use_s8 branch). Quality-gated like the INT8 KV cache
    itself (tests/test_ppl.py); GABBY_ATTN_S8=0 reverts to bf16 dots."""
    import os
    return os.environ.get("GABBY_ATTN_S8", "1") != "0"


def _pair_scales(sc, np_: int, rows: int):
    """[2*Np, C] per-head scales -> [Np, rows, C] per-ROW scales for the
    paired layout (rows half-major: rows [0, rows/2) belong to the pair's
    even head, the rest to the odd head)."""
    half = rows // 2
    c = sc.shape[-1]
    s4 = jnp.broadcast_to(sc.reshape(np_, 2, 1, c), (np_, 2, half, c))
    return s4.reshape(np_, rows, c)


def _flash_step(pos, c, chunk, nk, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                fk_ref, fv_ref, o_ref, m_ref, l_ref, acc_ref, *, sm_scale,
                tq: int = 1, use_s8: bool = False, pair: bool = False):
    """One (slot, chunk) grid step over all kv heads.

    q: [1, Nk, TQ*G, H] — TQ query positions x G group heads per kv head
    (TQ=1 is plain decode; TQ>1 is the speculative VERIFY block, whose
    queries all share the same cache bound); k/v: [1, 1, Nk, C, H];
    ks/vs: [1, 1, Nk, C] blocks of the raw 4-D scale arrays, or None
    (scales keep S on the LANE axis; a 5-D [., 1, S] VIEW of the carried
    arrays copied them whole per layer call, and an [., C, 1] block would
    lane-pad 1 -> 128);
    fk/fv: [1, Nk, TQ, H] — the block's own unquantized k/v, attended as
    virtual extra rows with a causal mask among themselves, so the kernel
    only ever reads the PRE-update cache (mask j < pos; this is what lets
    the cache scatter happen once, in place, outside the layer scan); or
    None for the plain j <= pos contract (TQ must be 1 then). scratch:
    m,l [Nk*TQ*G, 1] f32, acc [Nk*TQ*G, H] f32.

    pair=True (paired cache layout, kv_cache.create_cache(paired=True)):
    every 'Nk' above is the PAIR count Nk/2, 'H' is 2*head_dim, and q rows
    are BLOCK-DIAGONAL — [2*TQ*G, 2H] per pair, rows half-major, the even
    head's rows zero in lanes [H, 2H) and vice versa — so each dot runs
    128-deep contraction with 2x the rows, halving MXU passes (decode GQA
    is MXU-pass-bound; BASELINE.md round 3). ks/vs stay PER-HEAD
    [1, 1, 2*Nk', C] and expand to per-row scales in-kernel; the junk
    half of each output row is discarded at the final half-select."""
    g = q_ref.shape[2]  # = TQ * G rows per kv head (x2 when paired)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # strict bound when the fresh row is separate; inclusive otherwise
    in_range = (c * chunk < pos) if fk_ref is not None else (c * chunk <= pos)

    @pl.when(in_range)
    def _():
        # ONE batched dot over all kv heads (a per-head Python loop of
        # [G, H] x [C, H] dots measured ~4% of the whole decode step
        # slower — many small MXU ops pay issue/drain latency). Big
        # operands stay bf16 (int8 codes exact in bf16): the MXU takes
        # bf16 natively with f32 accumulation — casting [C, H] planes to
        # f32 on the VPU was measurable overhead.
        #
        # use_s8 (quantized cache only): run both dots on the MXU's
        # 2x-rate s8 path — the cache codes feed the MXU UNCONVERTED (the
        # per-chunk [Nk, C, H] int8->bf16 plane converts were real VPU
        # time) and the activations quantize per-row (q once per step, the
        # probability rows per chunk). Decode attention is MXU-throughput-
        # bound (ceil(C/128) passes per head regardless of the tiny G
        # rows), so the 2x rate is the one structural lever. Changes
        # numerics ~like the INT8 KV quantization itself; NLL-gated.
        hd = v_ref.shape[-1]
        if use_s8:
            qf = q_ref[0].astype(jnp.float32)         # [Nk, G, H]
            qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
            qs = jnp.maximum(qa, 1e-9) * (1.0 / 127.0)
            q8 = jnp.round(qf / qs).astype(jnp.int8)
            si = jax.lax.dot_general(
                q8, k_ref[0, 0],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)     # [Nk, G, C] s32
            scores = si.astype(jnp.float32) * qs
            if pair:
                scores = scores * _pair_scales(ks_ref[0, 0] * sm_scale,
                                               nk, g)
            else:
                scores = scores * (ks_ref[0, 0] *
                                   sm_scale)[:, None, :]
        else:
            qg = q_ref[0].astype(jnp.bfloat16)        # [Nk, G, H]
            k = k_ref[0, 0].astype(jnp.bfloat16)      # [Nk, C, H]
            scores = jax.lax.dot_general(
                qg, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # [Nk, G, C] f32
            if ks_ref is None:
                scores = scores * sm_scale
            elif pair:
                scores = scores * _pair_scales(ks_ref[0, 0] * sm_scale,
                                               nk, g)
            else:
                scores = scores * (ks_ref[0, 0] *
                                   sm_scale)[:, None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        bound = pos if fk_ref is not None else pos + 1
        scores = jnp.where(col + c * chunk < bound, scores, NEG_INF)

        m_old = m_ref[:].reshape(nk, g, 1)
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(scores - m_new)                   # [Nk, G, C] f32
        m_ref[:] = m_new.reshape(nk * g, 1)
        l_ref[:] = (l_ref[:].reshape(nk, g, 1) * alpha
                    + jnp.sum(p, axis=-1, keepdims=True)).reshape(nk * g, 1)
        if use_s8:
            pvf = p * (_pair_scales(vs_ref[0, 0], nk, g) if pair
                       else vs_ref[0, 0][:, None, :])
            pa = jnp.max(pvf, axis=-1, keepdims=True)  # p >= 0
            pscale = jnp.maximum(pa, 1e-30) * (1.0 / 127.0)
            p8 = jnp.round(pvf / pscale).astype(jnp.int8)
            ci = jax.lax.dot_general(
                p8, v_ref[0, 0],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)     # [Nk, G, H] s32
            contrib = ci.astype(jnp.float32) * pscale
        else:
            v = v_ref[0, 0].astype(jnp.bfloat16)      # [Nk, C, H]
            if vs_ref is None:
                pv = p
            elif pair:
                pv = p * _pair_scales(vs_ref[0, 0], nk, g)
            else:
                pv = p * vs_ref[0, 0][:, None, :]
            contrib = jax.lax.dot_general(
                pv.astype(jnp.bfloat16), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        acc_ref[:] = (acc_ref[:].reshape(nk, g, hd) * alpha
                      + contrib).reshape(nk * g, hd)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        if fk_ref is not None:
            # fold the block's own k/v (full precision) as TQ extra rows
            # with a causal mask among themselves (TQ=1: one always-
            # attended row, the plain decode fresh-row fold), batched
            # over kv heads like the chunk pass
            g0 = g // tq
            hd = acc_ref.shape[-1]
            qg = q_ref[0].astype(jnp.float32)          # [Nk, TQ*G0, H]
            kf = fk_ref[0].astype(jnp.float32)         # [Nk, TQ, H]
            vf = fv_ref[0].astype(jnp.float32)         # [Nk, TQ, H]
            sf = jax.lax.dot_general(
                qg, kf, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * sm_scale
            if tq > 1:
                rr = jax.lax.broadcasted_iota(jnp.int32, sf.shape, 1)
                if pair:  # rows are (half, t, g): half-major
                    rr = rr % (g // 2)
                    row_t = rr // ((g // 2) // tq)
                else:
                    row_t = rr // g0
                col_t = jax.lax.broadcasted_iota(jnp.int32, sf.shape, 2)
                sf = jnp.where(col_t <= row_t, sf, NEG_INF)
            m_old = m_ref[:].reshape(nk, g, 1)
            m_new = jnp.maximum(m_old, jnp.max(sf, axis=-1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            pf = jnp.exp(sf - m_new)                   # [Nk, TQ*G0, TQ]
            m_ref[:] = m_new.reshape(nk * g, 1)
            l_ref[:] = (l_ref[:].reshape(nk, g, 1) * alpha
                        + jnp.sum(pf, axis=-1, keepdims=True)
                        ).reshape(nk * g, 1)
            acc_ref[:] = (acc_ref[:].reshape(nk, g, hd) * alpha
                          + jax.lax.dot_general(
                              pf, vf,
                              dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
                          ).reshape(nk * g, hd)
        out = acc_ref[:] / l_ref[:]                       # [Nk*TQ*G0, H]
        if pair:
            # half-select: even-head rows carry their output in lanes
            # [0, H), odd-head rows in [H, 2H) (the other half is junk
            # accumulated through the zero rows of the block-diagonal q)
            hd2 = out.shape[-1] // 2
            o4 = out.reshape(nk, 2, g // 2, 2 * hd2)
            osel = jnp.concatenate([o4[:, :1, :, :hd2],
                                    o4[:, 1:, :, hd2:]], axis=1)
            o_ref[0] = osel.reshape(nk, g, hd2).astype(o_ref.dtype)
        else:
            o_ref[0] = out.reshape(nk, g, out.shape[-1]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "out_dtype", "interpret",
                                    "tq", "window", "use_s8", "pair"))
def _decode_call(q4, k_cache, v_cache, k_scale, v_scale, fresh_k, fresh_v,
                 scal, *, sm_scale: float, out_dtype, interpret: bool,
                 tq: int = 1, window: Optional[int] = None,
                 use_s8: bool = False, pair: bool = False):
    """q4: [B, Nk, TQ*G, H]; k/v_cache: [L, B, Nk, S, H];
    k/v_scale: [L, B, Nk, 1, S] or None; fresh_k/v: [B, Nk, TQ, H] or
    None; scal: [B+1] i32 = positions ++ [layer]. tq > 1 = the
    speculative verify block (see _flash_step).

    pair=True: the paired cache layout — q4 is the block-diagonal
    [B, Nk/2, 2*TQ*G, 2H] (see _flash_step); k/v_cache [L, B, Nk/2, S, 2H];
    scales stay per-head [L, B, Nk, S]; fresh [B, Nk/2, TQ, 2H]. Output is
    [B, Nk/2, 2*TQ*G, H] (half-selected), rows half-major per pair.

    window: static upper bound on every slot's live context THIS call
    (caller-guaranteed). The chunk grid covers only ceil(window/CHUNK)
    chunks, so a 512-token context in an 8k window prices like a 512-token
    window instead of paying max_seq/CHUNK grid iterations per (slot,
    layer) — the chunk-skip index clamp saves the DMA but not the grid
    steps (VERDICT r2 weak #4)."""
    b, nk, g, h = q4.shape
    nk_s = nk * 2 if pair else nk   # scale arrays stay per-head
    h_out = h // 2 if pair else h   # output half-selected per row
    s = k_cache.shape[3]
    chunk = min(attn_chunk(), s)
    s_live = s if window is None else max(chunk, min(window, s))
    n_chunks = pl.cdiv(s_live, chunk)
    quant = k_scale is not None
    fresh = fresh_k is not None

    def last_chunk(scal_ref, bb):
        # with a separate fresh row the last cache row read is pos-1
        p = scal_ref[bb] - 1 if fresh else scal_ref[bb]
        return jnp.maximum(p, 0) // chunk

    def kv_map(bb, cc, scal_ref):
        # clamp trailing fully-masked chunks to the last VALID chunk index:
        # consecutive identical block indices skip the HBM fetch entirely
        return (scal_ref[b], bb, 0,
                jnp.minimum(cc, last_chunk(scal_ref, bb)), 0)

    def sc_map(bb, cc, scal_ref):
        # scales are 4-D [L, B, Nk, S]: the chunk index IS the lane-axis
        # block (passing a 5-D [., 1, S] view instead copied the whole
        # carried scale array per layer call — profiled at ~70 us/step)
        return (scal_ref[b], bb, 0,
                jnp.minimum(cc, last_chunk(scal_ref, bb)))

    in_specs = [
        pl.BlockSpec((1, nk, g, h), lambda bb, cc, sc: (bb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nk, chunk, h), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nk, chunk, h), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [q4, k_cache, v_cache]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, nk_s, chunk), sc_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_s, chunk), sc_map,
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    if fresh:
        in_specs += [
            pl.BlockSpec((1, nk, tq, h), lambda bb, cc, sc: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, tq, h), lambda bb, cc, sc: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [fresh_k, fresh_v]

    def kernel(scal_ref, q_ref, k_ref, v_ref, *rest):
        rest = list(rest)
        ks_ref = rest.pop(0) if quant else None
        vs_ref = rest.pop(0) if quant else None
        fk_ref = rest.pop(0) if fresh else None
        fv_ref = rest.pop(0) if fresh else None
        o_ref, m_ref, l_ref, acc_ref = rest
        _flash_step(scal_ref[pl.program_id(0)], pl.program_id(1), chunk, nk,
                    q_ref, k_ref, v_ref, ks_ref, vs_ref, fk_ref, fv_ref,
                    o_ref, m_ref, l_ref, acc_ref, sm_scale=sm_scale, tq=tq,
                    use_s8=use_s8 and quant, pair=pair)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nk, g, h_out),
                               lambda bb, cc, sc: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nk * g, 1), jnp.float32),   # running max
            pltpu.VMEM((nk * g, 1), jnp.float32),   # running sum
            pltpu.VMEM((nk * g, h), jnp.float32),   # output accumulator
        ],
    )
    kv_bytes = 2 * b * nk * s_live * h * k_cache.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nk, g, h_out), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nk * g * s_live * h,
            bytes_accessed=kv_bytes + b * nk * g * h * 4,
            transcendentals=b * nk * g * s_live),
        interpret=interpret,
    )(scal, *args)


def _flash_step_multi(pos_vec, c, chunk, rows, q_ref, k_ref, v_ref, ks_ref,
                      vs_ref, fk_ref, fv_ref, o_ref, m_ref, l_ref, acc_ref,
                      *, sm_scale, sb, nk):
    """One (slot-block, chunk) grid step: SB slots x all kv heads at once.

    The per-(slot, chunk) grid of _flash_step spends ~2-5 us of
    bookkeeping + small-dot issue per step (profiled at 4.6x the kernel's
    DMA floor on the 1B bench); batching SB slots into each step divides
    the step count by SB and feeds the MXU one (SB*Nk)-batched dot
    instead of SB separate Nk-batched ones.

    pos_vec: [SB] i32 — each slot's read bound (cache rows j < pos).
    q: [SB, Nk, G, H]; k/v: [1, SB, Nk, C, H]; ks/vs: [1, SB, Nk, 1, C];
    fk/fv: [SB, Nk, 1, H]. scratch rows = SB*Nk*G ordered (slot, head, g).
    """
    g = q_ref.shape[2]

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # [SB,1,1,1] per-slot bounds from the prefetched scalars (Mosaic can't
    # shape-cast a 1-D scalar stack into 4-D; scalar-select over an iota
    # lowers cleanly)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (sb, 1, 1, 1), 0)
    bound = jnp.zeros((sb, 1, 1, 1), jnp.int32)
    max_pos = pos_vec[0]
    for i in range(sb):
        bound = jnp.where(slot_iota == i, pos_vec[i], bound)
        max_pos = jnp.maximum(max_pos, pos_vec[i])
    block_live = c * chunk < max_pos

    @pl.when(block_live)
    def _():
        hd = v_ref.shape[-1]
        qg = (q_ref[:].astype(jnp.bfloat16)
              .reshape(sb * nk, g, hd))                  # [R, G, H]
        k = k_ref[0].astype(jnp.bfloat16).reshape(sb * nk, chunk, hd)
        v = v_ref[0].astype(jnp.bfloat16).reshape(sb * nk, chunk, hd)
        scores = jax.lax.dot_general(
            qg, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [R, G, C]
        if ks_ref is not None:
            scores = scores * (ks_ref[0].reshape(sb * nk, 1, chunk)
                               * sm_scale)
        else:
            scores = scores * sm_scale
        sc4 = scores.reshape(sb, nk, g, chunk)
        col = jax.lax.broadcasted_iota(jnp.int32, sc4.shape, 3)
        sc4 = jnp.where(col + c * chunk < bound, sc4, NEG_INF)
        scores = sc4.reshape(sb * nk, g, chunk)

        m_old = m_ref[:].reshape(sb * nk, g, 1)
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(scores - m_new)
        pv = (p * vs_ref[0].reshape(sb * nk, 1, chunk)
              if vs_ref is not None else p)
        m_ref[:] = m_new.reshape(rows, 1)
        l_ref[:] = (l_ref[:].reshape(sb * nk, g, 1) * alpha
                    + jnp.sum(p, axis=-1, keepdims=True)).reshape(rows, 1)
        acc_ref[:] = (acc_ref[:].reshape(sb * nk, g, hd) * alpha
                      + jax.lax.dot_general(
                          pv.astype(jnp.bfloat16), v,
                          dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
                      ).reshape(rows, hd)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        # fold each slot's fresh row (always attended; see _flash_step)
        hd = acc_ref.shape[-1]
        qg = q_ref[:].astype(jnp.float32).reshape(sb * nk, g, hd)
        kf = fk_ref[:].astype(jnp.float32).reshape(sb * nk, 1, hd)
        vf = fv_ref[:].astype(jnp.float32).reshape(sb * nk, 1, hd)
        sf = jax.lax.dot_general(
            qg, kf, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale  # [R, G, 1]
        m_old = m_ref[:].reshape(sb * nk, g, 1)
        m_new = jnp.maximum(m_old, sf)
        alpha = jnp.exp(m_old - m_new)
        pf = jnp.exp(sf - m_new)
        l_new = l_ref[:].reshape(sb * nk, g, 1) * alpha + pf
        acc = (acc_ref[:].reshape(sb * nk, g, hd) * alpha
               + pf * vf)                                 # [R, G, H]
        out = acc / l_new
        o_ref[:] = out.reshape(sb, nk, g, hd).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "out_dtype", "interpret",
                                    "window", "sb"))
def _decode_call_multi(q4, k_cache, v_cache, k_scale, v_scale, fresh_k,
                       fresh_v, scal, *, sm_scale: float, out_dtype,
                       interpret: bool, window: Optional[int], sb: int):
    """Slot-batched variant of _decode_call (plain decode only, fresh-row
    contract). Grid = (B/SB, chunks); each step streams SB slots' chunk
    planes. Per-slot chunk skipping coarsens to the BLOCK's furthest
    slot — the win (SB x fewer grid steps) dominates for similar
    contexts, and the static `window` still bounds the worst case."""
    b, nk, g, h = q4.shape
    s = k_cache.shape[3]
    chunk = min(attn_chunk(), s)
    s_live = s if window is None else max(chunk, min(window, s))
    n_chunks = pl.cdiv(s_live, chunk)
    quant = k_scale is not None
    rows = sb * nk * g

    def last_chunk_block(scal_ref, gb):
        last = jnp.int32(0)
        for i in range(sb):
            p = jnp.maximum(scal_ref[gb * sb + i] - 1, 0)
            last = jnp.maximum(last, p // chunk)
        return last

    def kv_map(gb, cc, scal_ref):
        return (scal_ref[b], gb, 0,
                jnp.minimum(cc, last_chunk_block(scal_ref, gb)), 0)

    def sc_map(gb, cc, scal_ref):
        return (scal_ref[b], gb, 0,
                jnp.minimum(cc, last_chunk_block(scal_ref, gb)))

    in_specs = [
        pl.BlockSpec((sb, nk, g, h), lambda gb, cc, sc: (gb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sb, nk, chunk, h), kv_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sb, nk, chunk, h), kv_map,
                     memory_space=pltpu.VMEM),
    ]
    args = [q4, k_cache, v_cache]
    if quant:
        in_specs += [
            pl.BlockSpec((1, sb, nk, chunk), sc_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, nk, chunk), sc_map,
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    in_specs += [
        pl.BlockSpec((sb, nk, 1, h), lambda gb, cc, sc: (gb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((sb, nk, 1, h), lambda gb, cc, sc: (gb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [fresh_k, fresh_v]

    def kernel(scal_ref, q_ref, k_ref, v_ref, *rest):
        rest = list(rest)
        ks_ref = rest.pop(0) if quant else None
        vs_ref = rest.pop(0) if quant else None
        fk_ref, fv_ref = rest.pop(0), rest.pop(0)
        o_ref, m_ref, l_ref, acc_ref = rest
        gb = pl.program_id(0)
        pos_vec = [scal_ref[gb * sb + i] for i in range(sb)]
        _flash_step_multi(pos_vec, pl.program_id(1), chunk, rows, q_ref,
                          k_ref, v_ref, ks_ref, vs_ref, fk_ref, fv_ref,
                          o_ref, m_ref, l_ref, acc_ref, sm_scale=sm_scale,
                          sb=sb, nk=nk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // sb, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((sb, nk, g, h),
                               lambda gb, cc, sc: (gb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, h), jnp.float32),
        ],
    )
    kv_bytes = 2 * b * nk * s_live * h * k_cache.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nk, g, h), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nk * g * s_live * h,
            bytes_accessed=kv_bytes + b * nk * g * h * 4,
            transcendentals=b * nk * g * s_live),
        interpret=interpret,
    )(scal, *args)


def _pick_slot_block(b: int, nk: int, h: int, itemsize: int) -> int:
    """Largest SB (dividing B) whose k+v chunk planes fit VMEM. Mosaic's
    stack accounting charges ~8x one plane for the double-buffered k+v
    pair (measured: sb=4 with a 2.1 MB int8 plane OOMed a 16 MB budget at
    16.72 MB), so the budget is deliberately conservative."""
    for sb in (8, 4, 2):
        if b % sb:
            continue
        plane = sb * nk * attn_chunk() * h * itemsize
        if 8 * plane <= 13 * 1024 * 1024:
            return sb
    return 1


def _pair_q(q4: jnp.ndarray) -> jnp.ndarray:
    """[B, Nk, R, H] grouped queries -> the block-diagonal
    [B, Nk/2, 2R, 2H] the paired kernel wants: rows half-major (the even
    head's R rows first), each row zero in the other head's lane half so
    the 128-deep contraction picks out exactly its own head's keys."""
    b, nk, r0, h = q4.shape
    qv = q4.reshape(b, nk // 2, 2, r0, h)
    z = jnp.zeros_like(qv[:, :, 0])
    top = jnp.concatenate([qv[:, :, 0], z], axis=-1)
    bot = jnp.concatenate([z, qv[:, :, 1]], axis=-1)
    return jnp.concatenate([top, bot], axis=2)


def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, positions: jnp.ndarray,
                     k_scale=None, v_scale=None, *,
                     layer: Optional[jnp.ndarray] = None,
                     fresh_k=None, fresh_v=None,
                     scale=None, window: Optional[int] = None) -> jnp.ndarray:
    """q: [B, 1, Nq, H]; k/v_cache: [L, B, Nk, S, H] stacked cache with a
    traced `layer` index, or [B, Nk, S, H] with layer=None (treated as a
    1-layer stack — free reshape); k/v_scale: [(L,) B, Nk, S] f32 when the
    cache is quantized. positions: [B] i32 (attend to j <= positions[b]).
    fresh_k/v: [B, Nk, H] — the current token's unquantized k/v, attended
    as an extra row while the cache is only read up to j < positions[b]
    (with fresh=None the contract is j <= positions[b] with the current
    token already written). Returns [B, 1, Nq, H] in q.dtype."""
    b, t, nq, h = q.shape
    assert t == 1, "decode kernel is single-position"
    if layer is None:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        k_scale = k_scale[None] if k_scale is not None else None
        v_scale = v_scale[None] if v_scale is not None else None
        layer = jnp.int32(0)
    paired = k_cache.shape[-1] == 2 * h  # kv_cache.create_cache(paired=)
    nk = k_cache.shape[2] * (2 if paired else 1)
    sm_scale = float(scale) if scale is not None else h ** -0.5
    q4 = q[:, 0].reshape(b, nk, nq // nk, h)  # grouped heads, metadata-only
    ks = k_scale  # 4-D [L/P, B/L, Nk, S]: lane axis is S
    vs = v_scale
    scal = jnp.concatenate([positions.astype(jnp.int32),
                            jnp.asarray(layer, jnp.int32).reshape(1)])
    fk = fresh_k[:, :, None, :] if fresh_k is not None else None
    fv = fresh_v[:, :, None, :] if fresh_v is not None else None
    import os
    if paired:
        # block-diagonal queries + lane-paired fresh rows (free reshape:
        # TQ=1 rows pair by flattening adjacent heads)
        q4 = _pair_q(q4)
        if fk is not None:
            fk = fresh_k.reshape(b, nk // 2, 1, 2 * h)
            fv = fresh_v.reshape(b, nk // 2, 1, 2 * h)
        out = _decode_call(q4, k_cache, v_cache, ks, vs, fk, fv, scal,
                           sm_scale=sm_scale, out_dtype=q.dtype,
                           interpret=pk.interpret_mode(), window=window,
                           use_s8=s8_attention() and ks is not None
                           and fk is not None, pair=True)
        return out.reshape(b, 1, nq, h)  # rows half-major == head-major
    sb = _pick_slot_block(b, nk, h, k_cache.dtype.itemsize)
    # slot-batched grid measured NEUTRAL on the v5e 1B bench (2.85 vs
    # 2.83 ms/step same-session): decode attention is MXU-throughput-bound
    # (ceil(C/128) passes per head regardless of the tiny G rows), not
    # per-grid-step-overhead-bound. Kept opt-in for hardware where issue
    # overhead dominates.
    if (fk is not None and sb > 1
            and os.environ.get("GABBY_ATTN_MULTI", "0") == "1"):
        out = _decode_call_multi(q4, k_cache, v_cache, ks, vs, fk, fv,
                                 scal, sm_scale=sm_scale, out_dtype=q.dtype,
                                 interpret=pk.interpret_mode(),
                                 window=window, sb=sb)
        return out.reshape(b, 1, nq, h)
    out = _decode_call(q4, k_cache, v_cache, ks, vs, fk, fv, scal,
                       sm_scale=sm_scale, out_dtype=q.dtype,
                       interpret=pk.interpret_mode(), window=window,
                       use_s8=s8_attention() and ks is not None
                       and fk is not None)
    return out.reshape(b, 1, nq, h)


def verify_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, positions: jnp.ndarray,
                     k_scale=None, v_scale=None, *, layer,
                     fresh_k: jnp.ndarray, fresh_v: jnp.ndarray,
                     scale=None, window: Optional[int] = None) -> jnp.ndarray:
    """Speculative-verify attention: q [B, T, Nq, H] — T candidate
    positions per slot — against cache rows j < positions[b] plus the
    block's own unquantized k/v (fresh_k/v: [B, Nk, T, H]) with a causal
    mask among themselves. One kernel pass over the cache serves all T
    queries (the whole point of verification). Returns [B, T, Nq, H]."""
    b, t, nq, h = q.shape
    paired = k_cache.shape[-1] == 2 * h
    nk = k_cache.shape[2] * (2 if paired else 1)
    g = nq // nk
    sm_scale = float(scale) if scale is not None else h ** -0.5
    # rows ordered (t, g) within each kv head: row // g == t
    q4 = (q.reshape(b, t, nk, g, h).transpose(0, 2, 1, 3, 4)
          .reshape(b, nk, t * g, h))
    ks = k_scale  # 4-D [L/P, B/L, Nk, S]: lane axis is S
    vs = v_scale
    scal = jnp.concatenate([positions.astype(jnp.int32),
                            jnp.asarray(layer, jnp.int32).reshape(1)])
    if paired:
        from gabby_tpu.runtime.kv_cache import pair_heads
        q4 = _pair_q(q4)  # [B, Nk/2, 2*T*G, 2H], rows (half, t, g)
        fresh_k = pair_heads(fresh_k)  # [B, Nk/2, T, 2H]
        fresh_v = pair_heads(fresh_v)
        out = _decode_call(q4, k_cache, v_cache, ks, vs, fresh_k, fresh_v,
                           scal, sm_scale=sm_scale, out_dtype=q.dtype,
                           interpret=pk.interpret_mode(), tq=t,
                           window=window, pair=True)
        out = out.reshape(b, nk, t, g, h)  # (pair, half) rows == head-major
        return out.transpose(0, 2, 1, 3, 4).reshape(b, t, nq, h)
    out = _decode_call(q4, k_cache, v_cache, ks, vs, fresh_k, fresh_v, scal,
                       sm_scale=sm_scale, out_dtype=q.dtype,
                       interpret=pk.interpret_mode(), tq=t, window=window)
    return (out.reshape(b, nk, t, g, h).transpose(0, 2, 1, 3, 4)
            .reshape(b, t, nq, h))


def supported(nq: int, nk: int, h: int) -> bool:
    return nq % nk == 0


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "out_dtype", "interpret",
                                    "tq", "use_s8", "pair"))
def _paged_decode_call(q4, k_pool, v_pool, k_scale, v_scale, fresh_k,
                       fresh_v, scal, *, sm_scale: float, out_dtype,
                       interpret: bool, tq: int = 1, use_s8: bool = False,
                       pair: bool = False):
    """Paged variant of _decode_call. q4: [B, Nk, TQ*G, H]; k/v_pool:
    [P, L, Nk, page, H]; k/v_scale: [P, L, Nk, 1, page] or None;
    scal: [B + 1 + B*max_pages] i32 = positions ++ [layer] ++
    page_table.flatten(). Grid = (B, max_pages): each step DMAs the
    slot's next PHYSICAL page plane straight from the pool — the page
    table is consulted only inside the scalar-prefetched index maps, so
    paging costs no gathers and no extra HBM traffic. tq > 1 = the
    speculative VERIFY block (fresh_k/v: [B, Nk, TQ, H]).

    pair=True: the paired pool layout [P, L, Nk/2, page, 2H] — 'nk'/'h'
    below are the PAIR count and doubled lane, q4 is block-diagonal
    (_pair_q), scales stay per-HEAD (block head count reads from the
    scale pool) — same _flash_step contract as the dense paired kernel.
    use_s8: both dots on the MXU's 2x-rate s8 path (quantized pools)."""
    b, nk, g, h = q4.shape
    page = k_pool.shape[3]
    max_pages = (scal.shape[0] - b - 1) // b
    quant = k_scale is not None
    fresh = fresh_k is not None
    nks = nk * 2 if pair else nk    # scale pools stay per-head
    h_out = h // 2 if pair else h   # output half-selected per row

    def last_page(scal_ref, bb):
        p = scal_ref[bb] - 1 if fresh else scal_ref[bb]
        return jnp.maximum(p, 0) // page

    def phys(scal_ref, bb, cc):
        # clamp to the last VALID logical page: consecutive identical
        # physical indices skip the HBM fetch (dead pages cost nothing)
        lp = jnp.minimum(cc, last_page(scal_ref, bb))
        return scal_ref[b + 1 + bb * max_pages + lp]

    def kv_map(bb, cc, scal_ref):
        return (phys(scal_ref, bb, cc), scal_ref[b], 0, 0, 0)

    def sc_map(bb, cc, scal_ref):
        return (phys(scal_ref, bb, cc), scal_ref[b], 0, 0)

    in_specs = [
        pl.BlockSpec((1, nk, g, h), lambda bb, cc, sc: (bb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nk, page, h), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nk, page, h), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [q4, k_pool, v_pool]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, nks, page), sc_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nks, page), sc_map,
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    if fresh:
        in_specs += [
            pl.BlockSpec((1, nk, tq, h), lambda bb, cc, sc: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, tq, h), lambda bb, cc, sc: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [fresh_k, fresh_v]

    def kernel(scal_ref, q_ref, k_ref, v_ref, *rest):
        rest = list(rest)
        ks_ref = rest.pop(0) if quant else None
        vs_ref = rest.pop(0) if quant else None
        fk_ref = rest.pop(0) if fresh else None
        fv_ref = rest.pop(0) if fresh else None
        o_ref, m_ref, l_ref, acc_ref = rest
        _flash_step(scal_ref[pl.program_id(0)], pl.program_id(1), page, nk,
                    q_ref, k_ref, v_ref, ks_ref, vs_ref, fk_ref, fv_ref,
                    o_ref, m_ref, l_ref, acc_ref, sm_scale=sm_scale, tq=tq,
                    use_s8=use_s8 and quant, pair=pair)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nk, g, h_out),
                               lambda bb, cc, sc: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nk * g, 1), jnp.float32),
            pltpu.VMEM((nk * g, 1), jnp.float32),
            pltpu.VMEM((nk * g, h), jnp.float32),
        ],
    )
    kv_bytes = 2 * b * nk * max_pages * page * h * k_pool.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nk, g, h_out), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nk * g * max_pages * page * h,
            bytes_accessed=kv_bytes + b * nk * g * h * 4,
            transcendentals=b * nk * g * max_pages * page),
        interpret=interpret,
    )(scal, *args)


def paged_decode_attention(q: jnp.ndarray, k_pool: jnp.ndarray,
                           v_pool: jnp.ndarray, page_table: jnp.ndarray,
                           positions: jnp.ndarray, k_scale=None, v_scale=None,
                           *, layer, fresh_k, fresh_v,
                           scale=None) -> jnp.ndarray:
    """q: [B, 1, Nq, H]; pools [P, L, Nk, page, H] — or the paired layout
    [P, L, Nk/2, page, 2H] (+ scales [P, L, Nk, page] either way);
    page_table [B, max_pages]. Same contract as
    ops/attention.paged_cache_attention (fresh-row form)."""
    b, t, nq, h = q.shape
    assert t == 1
    paired = k_pool.shape[-1] == 2 * h
    nk = k_pool.shape[2] * (2 if paired else 1)
    sm_scale = float(scale) if scale is not None else h ** -0.5
    q4 = q[:, 0].reshape(b, nk, nq // nk, h)
    ks = k_scale  # 4-D [L/P, B/L, Nk, S]: lane axis is S
    vs = v_scale
    scal = jnp.concatenate([
        positions.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        page_table.astype(jnp.int32).reshape(-1),
    ])
    use_s8 = (s8_attention() and ks is not None and fresh_k is not None)
    if paired:
        q4 = _pair_q(q4)
        fk = (fresh_k.reshape(b, nk // 2, 1, 2 * h)
              if fresh_k is not None else None)
        fv = (fresh_v.reshape(b, nk // 2, 1, 2 * h)
              if fresh_v is not None else None)
        out = _paged_decode_call(q4, k_pool, v_pool, ks, vs, fk, fv,
                                 scal, sm_scale=sm_scale, out_dtype=q.dtype,
                                 interpret=pk.interpret_mode(),
                                 use_s8=use_s8, pair=True)
        return out.reshape(b, 1, nq, h)  # rows half-major == head-major
    fk = fresh_k[:, :, None, :] if fresh_k is not None else None
    fv = fresh_v[:, :, None, :] if fresh_v is not None else None
    out = _paged_decode_call(q4, k_pool, v_pool, ks, vs, fk, fv,
                             scal, sm_scale=sm_scale, out_dtype=q.dtype,
                             interpret=pk.interpret_mode(), use_s8=use_s8)
    return out.reshape(b, 1, nq, h)


def paged_verify_attention(q: jnp.ndarray, k_pool: jnp.ndarray,
                           v_pool: jnp.ndarray, page_table: jnp.ndarray,
                           positions: jnp.ndarray, k_scale=None,
                           v_scale=None, *, layer, fresh_k: jnp.ndarray,
                           fresh_v: jnp.ndarray,
                           scale=None) -> jnp.ndarray:
    """verify_attention against the paged pool: q [B, T, Nq, H] candidate
    queries read pool rows j < positions[b] (physical pages via the
    scalar-prefetched table) plus the block's own k/v causally. One pool
    pass serves all T candidates. fresh_k/v: [B, Nk, T, H]. Handles the
    paired pool layout like the dense verify kernel."""
    b, t, nq, h = q.shape
    paired = k_pool.shape[-1] == 2 * h
    nk = k_pool.shape[2] * (2 if paired else 1)
    g = nq // nk
    sm_scale = float(scale) if scale is not None else h ** -0.5
    q4 = (q.reshape(b, t, nk, g, h).transpose(0, 2, 1, 3, 4)
          .reshape(b, nk, t * g, h))
    ks = k_scale  # 4-D [L/P, B/L, Nk, S]: lane axis is S
    vs = v_scale
    scal = jnp.concatenate([
        positions.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        page_table.astype(jnp.int32).reshape(-1),
    ])
    from gabby_tpu.ops import pallas as pk
    if paired:
        from gabby_tpu.runtime.kv_cache import pair_heads
        q4 = _pair_q(q4)  # [B, Nk/2, 2*T*G, 2H], rows (half, t, g)
        out = _paged_decode_call(q4, k_pool, v_pool, ks, vs,
                                 pair_heads(fresh_k), pair_heads(fresh_v),
                                 scal, sm_scale=sm_scale, out_dtype=q.dtype,
                                 interpret=pk.interpret_mode(), tq=t,
                                 pair=True)
        out = out.reshape(b, nk, t, g, h)  # (pair, half) rows == head-major
        return out.transpose(0, 2, 1, 3, 4).reshape(b, t, nq, h)
    out = _paged_decode_call(q4, k_pool, v_pool, ks, vs, fresh_k, fresh_v,
                             scal, sm_scale=sm_scale, out_dtype=q.dtype,
                             interpret=pk.interpret_mode(), tq=t)
    return (out.reshape(b, nk, t, g, h).transpose(0, 2, 1, 3, 4)
            .reshape(b, t, nq, h))
