"""Weight-only quantization: INT8 and INT4, symmetric per-output-channel.

QTensor is a pytree, so quantized checkpoints flow through jit/shard like any
other params. INT4 weights are physically packed two-per-byte along the input
axis (the contraction axis), halving HBM traffic — the thing that matters for
decode, which is bandwidth-bound. The jnp path below is the semantics
reference; the fused dequant+matmul Pallas kernel lives in
gabby_tpu/ops/pallas/quant_matmul.py.

Net-new capability vs the reference (BASELINE.json configs 2-5); the
reference has no quantization or kernels of any kind.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

# ---- FP8 activations (BASELINE config 5: INT4 weights + FP8 activations) --
#
# Activations pass through the float8_e4m3 value grid with a per-token
# scale before every matmul. On TPUs without fp8 MXU support (v5e) this is
# numerics-faithful emulation (cast down, cast back up; the dot engine
# stays whatever the weight path uses — incl. the int4 Pallas kernel); on
# fp8-capable hardware XLA keeps fp8 dots native. Flip ONCE before any
# tracing (jit caches do not key on this flag).

_ACT_FP8 = os.environ.get("GABBY_ACT_FP8", "0") == "1"


def set_act_fp8(on: bool) -> None:
    global _ACT_FP8
    _ACT_FP8 = bool(on)


def act_fp8_enabled() -> bool:
    return _ACT_FP8


def fp8_activation(x: jnp.ndarray) -> jnp.ndarray:
    """Quantize activations onto the fp8(e4m3) grid with a per-token
    (last-axis) scale, returning them in x.dtype. e4m3 max normal = 448."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 448.0, 1e-12)
    xq = (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return (xq.astype(jnp.float32) * scale).astype(x.dtype)


def maybe_fp8_activation(x: jnp.ndarray) -> jnp.ndarray:
    return fp8_activation(x) if _ACT_FP8 else x


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QTensor:
    """Quantized 2-D weight of logical shape [in_dim, out_dim].

    q: int8. For bits=8, shape [in_dim, out_dim], values in [-127, 127].
       For bits=4, shape [in_dim // 2, out_dim]; each byte packs rows i
       (low nibble) and i + in_dim/2 (high nibble), values [-7, 7] —
       HALF-SPLIT pairing (see pack_int4: the matching activation planes
       are then contiguous halves, killing ~82 us/step of de-interleave
       copies the old adjacent-row pairing cost in the decode loop).
       Under a row-sharded contraction axis (TP wo/w_down) the unpack is
       a concatenate of the two nibble planes — numerically exact under
       GSPMD; if a real multi-chip profile ever shows the concat
       breaking the local-partial-dot + psum pattern, revisit with
       per-shard half-split packing.
    scale: f32. Per-output-channel [out_dim] when group == 0; per
       (input-group, output-channel) [in_dim // group, out_dim] when
       group > 0 — group-wise scales recover most of int4's quality loss
       on weights with per-column outliers (the unembed table; GPTQ-style
       g=128/256 grouping along the contraction axis).
    """

    q: jnp.ndarray
    scale: jnp.ndarray
    bits: int = dataclasses.field(metadata=dict(static=True))
    group: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def shape(self) -> tuple[int, int]:
        rows = self.q.shape[0] * (2 if self.bits == 4 else 1)
        return (rows, self.q.shape[1])

    @property
    def dtype(self):
        return self.scale.dtype

    def nbytes(self) -> int:
        return self.q.size + self.scale.size * 4


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """[in, out] int8 in [-7, 7] -> [in//2, out] packed bytes — byte i
    holds row i in the low nibble and row i + in//2 in the high
    (HALF-SPLIT pairing).

    Half-split (vs the round-1..3 interleaved 2i/2i+1 pairing): the
    matmul kernels feed each nibble plane the matching HALF of the
    activation vector, and with half-split pairing those halves are
    CONTIGUOUS slices x[:, :k/2] / x[:, k/2:] — the interleaved layout's
    [m, k/2, 2] de-interleave reshape cost ~82 us/step of layout-hostile
    copies in the compiled decode loop (r4b profile: copy.401/399/397/391,
    bf16[*,*,2] minor-dim-2 windows moving bytes at ~5 GB/s).

    The low nibble is stored BIASED by +8 (values 1..15), so a packed byte
    read as signed int8 decomposes with pure float math:
        b == 16*hi + (lo+8),  hi = floor(b/16),  lo = b - 16*hi - 8.
    The Pallas kernel exploits this: one int8->bf16 hardware convert plus
    mul/floor/fma per byte instead of i32 widening + four vector shifts
    (Mosaic has no sub-i32 shifts), and the -8 bias folds into a rank-1
    correction (8 * rowsum(x_lo)) applied to the accumulator — the
    measured fix for the round-1 kernel being VPU-bound on the unpack."""
    assert q.shape[0] % 2 == 0, "int4 packing needs an even input dim"
    kp = q.shape[0] // 2
    lo = (q[:kp].astype(jnp.int32) + 8).astype(jnp.uint8) & 0xF
    hi = (q[kp:].astype(jnp.uint8) & 0xF) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[in//2, out] packed -> [in, out] int8, undoing the low-nibble bias
    (half-split pairing: low nibbles are rows [0, in/2), high nibbles the
    rest — a concatenate, which XLA fuses better than the old interleave
    stack ever did)."""
    lo = (packed.astype(jnp.int32) & 0xF).astype(jnp.int8) - 8
    hi = jnp.right_shift(packed, 4)  # arithmetic: sign-extends the nibble
    return jnp.concatenate([lo, hi], axis=0)


def quantize(w: jnp.ndarray, bits: int, group: int = 0) -> QTensor:
    """Symmetric quantization of w: [in_dim, out_dim]. Scales are
    per-output-channel (group=0) or per (input-group, output-channel)
    (group>0, group divides in_dim)."""
    assert bits in (4, 8)
    qmax = 127.0 if bits == 8 else 7.0
    wf = jnp.asarray(w, jnp.float32)
    if group:
        k, n = wf.shape
        assert k % group == 0, (k, group)
        wg = wf.reshape(k // group, group, n)
        absmax = jnp.max(jnp.abs(wg), axis=1)  # [k//group, out]
        scale = jnp.maximum(absmax / qmax, 1e-8)
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -qmax, qmax)
        q = q.reshape(k, n).astype(jnp.int8)
    else:
        absmax = jnp.max(jnp.abs(wf), axis=0)  # [out]
        scale = jnp.maximum(absmax / qmax, 1e-8)
        q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        q = pack_int4(q)
    return QTensor(q=q, scale=scale.astype(jnp.float32), bits=bits,
                   group=group)


def dequantize(qt: QTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    q = unpack_int4(qt.q) if qt.bits == 4 else qt.q
    if qt.group:
        scale = jnp.repeat(qt.scale, qt.group, axis=0)  # [in, out]
        return (q.astype(jnp.float32) * scale).astype(dtype)
    return (q.astype(jnp.float32) * qt.scale[None, :]).astype(dtype)


def qlinear(x: jnp.ndarray, qt: QTensor, layer=None) -> jnp.ndarray:
    """x: [..., in_dim] @ QTensor -> [..., out_dim].

    Reference path: contract against the int8 codes (MXU-friendly), apply the
    per-channel scale to the f32 accumulator after the matmul — numerically
    identical to dequantize-then-matmul but touches only 1/2 (or 1/4) of the
    HBM bytes for the weight.

    layer: for STACKED [L, in, out] QTensors, the (traced) layer to use.
    The Pallas kernels consume the stacked codes directly (layer index via
    scalar prefetch) — slicing the layer first would copy the whole weight
    to HBM per step, doubling decode's weight traffic (an opaque
    pallas_call can't fuse the slice the way XLA's own dot can).
    """
    # Dispatch policy (measured on v5e, llama-1B decode): the Pallas kernel
    # wins ONLY for INT4 — XLA materializes the unpacked int8 weight in HBM
    # there (2.2x decode win for the kernel) but its fused int8 dequant
    # matmul is faster than ours (it overlaps weight streaming with
    # neighboring ops; a custom call is an opaque barrier).
    from gabby_tpu.ops import pallas as pk
    m = 1
    for d in x.shape[:-1]:
        m *= d
    # Decode-sized M: kernel for INT4 (XLA materializes unpacked weights),
    # XLA for INT8 (its fused dequant dot wins). Prefill-sized M: the INT4
    # kernel runs with LARGE tile_m (see pallas/quant_matmul._pick_tile_m)
    # so the nibble unpack amortizes against big MXU dots and the
    # HBM-materialized unpack XLA pays never happens; INT8 stays XLA at
    # large M (compute-bound, nothing to win).
    kernel_ok = (pk.kernels_enabled()
                 and ((m <= 64 and (qt.bits == 4
                                    or pk.int8_matmul_kernel()))
                      or (qt.bits == 4 and pk.int4_prefill_kernel())))
    if qt.group:
        # group-wise scales (the int4 unembed): scale varies along the
        # contraction axis, so it cannot fold into a single post-dot
        # rescale — the kernel applies it per k-group on the accumulator
        if (qt.bits == 4 and qt.q.ndim == 2 and m <= 64
                and pk.kernels_enabled()):
            from gabby_tpu.ops.pallas import quant_matmul as pqm
            if pqm.grouped_supported(m, qt.shape[0], qt.shape[1], qt.group):
                return pqm.qmatmul_grouped(x, qt.q, qt.scale, qt.group)
        if m <= 64:
            # decode-sized fallback (CPU tests, kernels off): per-group
            # batched dot — codes stream quantized, the scale hits each
            # group's accumulator; the [G, ..., N] partials are small at
            # decode M
            q = unpack_int4(qt.q) if qt.bits == 4 else qt.q
            gcount = qt.scale.shape[0]
            xg = x.astype(jnp.bfloat16).reshape(*x.shape[:-1], gcount,
                                                qt.group)
            qg = q.reshape(gcount, qt.group, q.shape[-1]).astype(
                jnp.bfloat16)
            acc = jax.lax.dot_general(
                xg, qg,
                dimension_numbers=(((x.ndim,), (1,)), ((x.ndim - 1,), (0,))),
                preferred_element_type=jnp.float32)  # [G, ..., N]
            acc = acc * qt.scale[(slice(None),) + (None,) * (x.ndim - 1)]
            return jnp.sum(acc, axis=0).astype(x.dtype)
        # prefill-sized m: dequantize-then-dot. The per-group batched dot
        # above materializes [G, ..., N] f32 partials — at a full-sequence
        # prefill unembed that is [G, B, T, V] = 25 GB on the 3B (OOMed a
        # real v5e, round 3); the dequantized [K, N] bf16 table is <1 GB
        # and the matmul is compute-bound at this M anyway.
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), dequantize(qt, jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
    if layer is not None and qt.q.ndim == 3:
        in_dim = qt.q.shape[1] * (2 if qt.bits == 4 else 1)
        if kernel_ok:
            from gabby_tpu.ops.pallas import quant_matmul as pqm
            if pqm.supported(m, in_dim, qt.q.shape[2], qt.bits):
                if m > 64:
                    # prefill-sized M: slice the layer's PACKED bytes out
                    # (a copy costing microseconds against a ~10 ms
                    # compute-bound matmul) and run the plain 2-D kernel —
                    # the scalar-prefetch stacked form hits a Mosaic
                    # pathology at large tile_m (measured SECONDS per
                    # call), and the slice-copy avoidance that justifies
                    # it only matters at decode M
                    return pqm.qmatmul(
                        x,
                        jax.lax.dynamic_index_in_dim(qt.q, layer, 0, False),
                        jax.lax.dynamic_index_in_dim(qt.scale, layer, 0,
                                                     False),
                        qt.bits)
                if qt.bits == 4 and pk.w4a8():
                    # opt-in W4A8: int8-quantized activations ride the
                    # MXU's 2x-rate s8 path (quality-gated; see pallas
                    # __init__.w4a8)
                    return pqm.qmatmul_stacked_w4a8(x, qt.q, qt.scale,
                                                    layer)
                return pqm.qmatmul_stacked(x, qt.q, qt.scale, layer, qt.bits)
        # XLA path: slice the layer and let XLA fuse it into its dot
        qt = QTensor(
            q=jax.lax.dynamic_index_in_dim(qt.q, layer, 0, keepdims=False),
            scale=jax.lax.dynamic_index_in_dim(qt.scale, layer, 0,
                                               keepdims=False),
            bits=qt.bits)
    if qt.q.ndim == 2 and kernel_ok:
        from gabby_tpu.ops.pallas import quant_matmul as pqm
        if pqm.supported(m, qt.shape[0], qt.shape[1], qt.bits):
            return pqm.qmatmul(x, qt.q, qt.scale, qt.bits)
    q = unpack_int4(qt.q) if qt.bits == 4 else qt.q
    if (qt.bits == 4 and m > 64
            and os.environ.get("GABBY_INT4_PREFILL_PROMOTE") == "1"):
        # A/B knob (VERDICT r3 item 3): materialize the unpacked int8
        # plane instead of letting XLA fuse the nibble unpack into the
        # dot's operand pipeline — decouples the VPU unpack from the MXU
        # feed at the cost of one [in, out] int8 HBM round-trip (1/L of
        # the model per layer, released after the dot). If this reaches
        # int8-prefill speed it replaces the 2x-HBM resident shadow
        # (EngineConfig.prefill_int8_shadow). Measure: tools A/B
        # `GABBY_INT4_PREFILL_PROMOTE=1 python bench.py --prefill-len ...`
        q = jax.lax.optimization_barrier(q)
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * qt.scale).astype(x.dtype)


def int4_matmul_shapes(params) -> set[tuple[int, int]]:
    """Distinct GLOBAL (k, n) shapes of every per-channel int4 QTensor in
    a params pytree (stacked [L, K/2, N] or flat [K/2, N]); grouped-scale
    tensors (the unembed) are excluded — they ride their own kernel with
    a fixed tile budget. Feeds pallas.quant_matmul.probe_big_tiles."""
    shapes: set[tuple[int, int]] = set()
    leaves = jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor))
    for leaf in leaves:
        if isinstance(leaf, QTensor) and leaf.bits == 4 and not leaf.group:
            q = leaf.q
            if q.ndim == 3:
                shapes.add((q.shape[1] * 2, q.shape[2]))
            else:
                shapes.add((q.shape[0] * 2, q.shape[1]))
    return shapes


def quantize_tree(params, bits: int, *, skip=("embed", "norm"),
                  quantize_unembed: bool = True,
                  unembed_bits: int | None = None,
                  unembed_group: int = 256):
    """Quantize every 2-D+ matmul weight in a params pytree (dicts of arrays).

    Leaves whose key path contains a name in `skip`, and 1-D leaves (norms),
    stay in their original dtype. Stacked [L, in, out] layer weights are
    quantized per-layer via vmap-free slicing (numpy-side, load time).

    quantize_unembed: for tied-embedding models (lm_head is None) the
    unembed matmul otherwise streams the full-precision [V, D] table every
    decode step — the single largest weight stream on Llama-3.2-1B. This
    materializes a SEPARATE quantized [D, V] copy for the unembed while
    the embedding gather keeps reading the bf16 table. Trades V*D bytes of
    HBM capacity for halving (or quartering) that stream.

    unembed_bits: 8 (default, per-vocab-channel scales) or 4 with
    GROUP-wise scales along D (`unembed_group`; plain per-vocab-channel
    INT4 logits measurably hurt quality, group scales recover it — gated
    by tests/test_ppl.py). The default can be flipped via
    GABBY_UNEMBED_BITS=4 (read once here, quantize time — no jit-cache
    hazard since the tree itself changes)."""
    def visit(path, leaf):
        name = "/".join(str(p) for p in path)
        if any(s in name for s in skip) or leaf.ndim < 2:
            return leaf
        if name == "lm_head" and quantize_unembed:
            # untied models: the lm_head IS the unembed stream — same
            # policy as the tied-embedding copy below (per-channel int4
            # logits hurt quality; int8 or int4+group scales don't)
            return quantize_unembed_table(leaf, bits=unembed_bits,
                                          group=unembed_group)
        if leaf.ndim == 2:
            return quantize(leaf, bits)
        assert leaf.ndim == 3  # [L, in, out] stacked layers
        qs = [quantize(leaf[i], bits) for i in range(leaf.shape[0])]
        return QTensor(
            q=jnp.stack([t.q for t in qs]),
            scale=jnp.stack([t.scale for t in qs]),
            bits=bits,
        )

    out = _tree_map_with_name(visit, params)
    if (quantize_unembed and isinstance(out, dict)
            and out.get("lm_head") is None and "embed" in out):
        out["lm_head"] = quantize_unembed_table(
            jnp.asarray(out["embed"], jnp.float32).T,
            bits=unembed_bits, group=unembed_group)
    return out


def promote_int4_to_int8(params):
    """EXACT int8 shadow of an int4-quantized tree, for PREFILL-sized
    matmuls.

    int4 codes ([-7, 7]) are a subset of int8's range, so unpacking the
    nibbles while keeping the same scales reproduces bit-identical
    dequantized values at 2x the weight bytes. Why it exists: at
    prefill-sized M the int4 path must either run the large-tile_m Pallas
    kernel (UNSTABLE on the v5e toolchain — BASELINE.md round 3) or let
    XLA materialize the unpacked weight in HBM per call (int4 prefill 44k
    vs int8's 53k tok/s on the 1B). A persistent shadow pays that unpack
    ONCE at load and prefill rides XLA's measured-fast fused int8 dequant
    dot; decode keeps streaming the packed int4 codes. Zero quality
    change — the shadow is the same numbers.

    Group-scaled tensors (the unembed — prefill unembeds one row per
    slot), int8 tensors, and unquantized leaves are returned AS-IS (same
    arrays, no copy).

    Sharding-preserving: the int4 codes' PartitionSpec is the int8 spec
    (parallel.sharding keys the rule on the weight, not the bit width, and
    the packed in//2 axis shards exactly like the unpacked in axis since
    unpack is shard-local — each shard's contiguous packed rows unpack to
    its contiguous unpacked rows). So a mesh-sharded tree promotes by
    re-pinning each shadow to its source's NamedSharding; no gather."""
    from jax.sharding import NamedSharding

    def visit(leaf):
        if not (isinstance(leaf, QTensor) and leaf.bits == 4
                and not leaf.group):
            return leaf
        if leaf.q.ndim == 3:  # stacked [L, in//2, out]
            q8 = jnp.stack([unpack_int4(leaf.q[i])
                            for i in range(leaf.q.shape[0])])
        else:
            q8 = unpack_int4(leaf.q)
        src_sh = getattr(leaf.q, "sharding", None)
        if isinstance(src_sh, NamedSharding):
            q8 = jax.device_put(q8, src_sh)
        return QTensor(q=q8, scale=leaf.scale, bits=8)

    return jax.tree.map(visit, params,
                        is_leaf=lambda x: isinstance(x, QTensor))


def quantize_unembed_table(table, bits: int | None = None,
                           group: int = 256,
                           pad_to: int = 2048) -> QTensor:
    """Quantize the [D, V] unembed table: INT8 per-vocab-channel (default)
    or INT4 with group-wise scales along D (see quantize_tree). Shared by
    quantize_tree and the checkpoint loader so GABBY_UNEMBED_BITS behaves
    identically on both load paths.

    pad_to (int4 only): the vocab axis pads with zero columns to the next
    multiple, so the grouped kernel can run WIDE n tiles — Llama-3's
    V=128256 only divides 768-wide tiles (167 grid steps per unembed);
    padded to 129024 = 63 x 2048 the grid runs 2048-wide 2 MB tiles at
    +0.6% junk bytes. Consumers slice logits back to the true vocab
    (llama._unembed) — padded columns never reach sampling."""
    if bits is None:
        bits = int(os.environ.get("GABBY_UNEMBED_BITS", "8"))
    assert bits in (4, 8)
    table = jnp.asarray(table, jnp.float32)
    if bits == 4:
        v = table.shape[1]
        if pad_to and v % pad_to:
            table = jnp.pad(table, ((0, 0), (0, pad_to - v % pad_to)))
        while group > 1 and table.shape[0] % group:
            group //= 2
        return quantize(table, 4, group=group)
    return quantize(table, 8)


def _tree_map_with_name(fn, tree, path=()):
    if isinstance(tree, dict):
        return {k: _tree_map_with_name(fn, v, path + (k,)) for k, v in tree.items()}
    if tree is None:
        return None
    return fn(path, tree)
