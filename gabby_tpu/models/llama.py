"""Llama-3 forward pass, TPU-first.

Design notes (vs. the reference, whose generator is a stub —
/root/reference/src/inference/generator.cc:33-38 — this is net-new):

* Layer weights are STACKED along a leading [num_layers] axis and the decoder
  runs as one `lax.scan` over layers: a single traced/compiled block body
  regardless of depth (fast compiles at 70B scale, friendly to XLA's
  scheduler), instead of Python-unrolled layers.
* Everything is shape-static: prefill takes bucketed [B, T] chunks with a
  static `offset`; decode takes [B] tokens with per-slot integer positions
  into a fixed [B, S_max] cache. Nothing in the serving loop retraces.
* Params are a plain dict pytree -> trivially sharded with NamedSharding
  (gabby_tpu/parallel/) and quantized by swapping leaves for QTensor
  (gabby_tpu/ops/quant.py); `linear()` dispatches on leaf type.
* Attention goes through gabby_tpu.ops so the jnp reference and the Pallas
  kernels are interchangeable (select via gabby_tpu.ops.pallas.use_kernels).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from gabby_tpu.config import ModelConfig
from gabby_tpu.ops.attention import (cache_attention,
                                     cache_attention_quantized,
                                     causal_attention,
                                     slot_prefill_attention)
from gabby_tpu.ops.linear import linear
from gabby_tpu.ops.norms import rms_norm
from gabby_tpu.ops.rope import apply_rope, rope_inv_freq
from gabby_tpu.runtime.kv_cache import (KVCache, cache_is_paired,
                                        dequantize_kv, pair_heads,
                                        quantize_kv, unpair_heads)

Params = dict[str, Any]


def init_params(cfg: ModelConfig, key: jax.Array,
                dtype=jnp.bfloat16) -> Params:
    """Random-normal params (tests, benchmarks; real weights via loader.py)."""
    d, f, v, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_layers
    ks = jax.random.split(key, 8)

    def w(k, *shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * fan_in ** -0.5).astype(dtype)

    params: Params = {
        "embed": w(ks[0], v, d, fan_in=d),
        "blocks": {
            "attn_norm": jnp.ones((L, d), dtype),
            "mlp_norm": jnp.ones((L, d), dtype),
            "wq": w(ks[1], L, d, cfg.q_dim, fan_in=d),
            "wk": w(ks[2], L, d, cfg.kv_dim, fan_in=d),
            "wv": w(ks[3], L, d, cfg.kv_dim, fan_in=d),
            "wo": w(ks[4], L, cfg.q_dim, d, fan_in=cfg.q_dim),
            "w_gate": w(ks[5], L, d, f, fan_in=d),
            "w_up": w(ks[6], L, d, f, fan_in=d),
            "w_down": w(ks[7], L, f, d, fan_in=f),
        },
        "final_norm": jnp.ones((d,), dtype),
        "lm_head": None if cfg.tie_word_embeddings else w(ks[0], d, v, fan_in=d),
    }
    return params


def fuse_projections(params: Params, tp: int = 1) -> Params:
    """Concatenate same-activation projections along the OUTPUT axis:
    wq|wk|wv -> wqkv and w_gate|w_up -> w_gup. The forward pass then runs
    ONE matmul per group — for quantized decode that means one stacked
    Pallas call streaming all three weights against a single activation
    slab instead of three opaque calls re-fetching it (fewer kernel-call
    barriers, more DMA for the unpack work to hide behind; the VERDICT-r2
    lever for the INT4 MFU gap).

    tp: the mesh's model-axis size the fused tree will be column-sharded
    over. The columns are laid out per-SHARD — [q0|k0|v0 | q1|k1|v1 | ...]
    where x_i is shard i's slice of x — so a NamedSharding on the output
    axis deals each device exactly its own q/k/v (gate/up) columns, and
    `_split_fused` recovers the logical parts with shard-LOCAL reshapes
    (no collectives under GSPMD). tp=1 is the plain concatenation. Every
    per-projection output dim must divide by tp (the same constraint TP
    itself imposes). Callers must set cfg.fused_tp = tp so the forward
    splits on the matching layout.

    Valid on QTensor leaves (codes and per-channel scales concat along the
    output axis) and dense [L, in, out] leaves. Returns a NEW params dict;
    the unfused leaves are dropped."""
    from gabby_tpu.ops.quant import QTensor

    def shard_cat(arrs):
        if tp == 1:
            return jnp.concatenate(arrs, axis=-1)
        for a in arrs:
            if a.shape[-1] % tp:
                raise ValueError(
                    f"fuse_projections(tp={tp}): output dim {a.shape[-1]} "
                    f"does not divide by the model-axis size")
        parts = [a.reshape(*a.shape[:-1], tp, a.shape[-1] // tp)
                 for a in arrs]
        out = jnp.concatenate(parts, axis=-1)  # [..., tp, block]
        return out.reshape(*out.shape[:-2], -1)

    def cat(leaves):
        if isinstance(leaves[0], QTensor):
            bits = {l.bits for l in leaves}
            assert len(bits) == 1, "cannot fuse mixed-precision projections"
            return QTensor(
                q=shard_cat([l.q for l in leaves]),
                scale=shard_cat([l.scale for l in leaves]),
                bits=leaves[0].bits)
        return shard_cat(leaves)

    blocks = dict(params["blocks"])
    if "wq" in blocks:
        blocks["wqkv"] = cat([blocks.pop("wq"), blocks.pop("wk"),
                              blocks.pop("wv")])
    if "w_gate" in blocks:
        blocks["w_gup"] = cat([blocks.pop("w_gate"), blocks.pop("w_up")])
    out = dict(params)
    out["blocks"] = blocks
    return out


def _split_fused(y: jnp.ndarray, dims: tuple[int, ...],
                 tp: int) -> list[jnp.ndarray]:
    """Split a fused projection output back into its logical parts.
    Fused weights are laid out per shard (see fuse_projections), so for
    tp > 1 the global column order is [shard0: a0|b0|c0, shard1: ...];
    the reshape exposes the shard axis (which carries the "model"
    sharding), the slice is then shard-local, and the merge restores each
    part's own column order."""
    if tp == 1:
        outs, off = [], 0
        for d in dims:
            outs.append(y[..., off:off + d])
            off += d
        return outs
    block = sum(dims) // tp
    ys = y.reshape(*y.shape[:-1], tp, block)
    outs, off = [], 0
    for d in dims:
        part = ys[..., off:off + d // tp]
        outs.append(part.reshape(*part.shape[:-2], d))
        off += d // tp
    return outs


def _qkv(cfg: ModelConfig, blk: Params, x: jnp.ndarray, positions: jnp.ndarray,
         inv_freq, layer=None) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b, t, _ = x.shape
    if "wqkv" in blk:
        qkv = linear(x, blk["wqkv"], layer)
        q, k, v = _split_fused(qkv, (cfg.q_dim, cfg.kv_dim, cfg.kv_dim),
                               cfg.fused_tp)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    else:
        q = linear(x, blk["wq"], layer).reshape(b, t, cfg.num_heads,
                                                cfg.head_dim)
        k = linear(x, blk["wk"], layer).reshape(b, t, cfg.num_kv_heads,
                                                cfg.head_dim)
        v = linear(x, blk["wv"], layer).reshape(b, t, cfg.num_kv_heads,
                                                cfg.head_dim)
    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)
    return q, k, v


def _mlp(cfg: ModelConfig, blk: Params, x: jnp.ndarray,
         layer=None) -> jnp.ndarray:
    if "w_gup" in blk:
        gu = linear(x, blk["w_gup"], layer).astype(jnp.float32)
        f = cfg.intermediate_size
        gate, up = _split_fused(gu, (f, f), cfg.fused_tp)
        gate = jax.nn.silu(gate)
    else:
        gate = jax.nn.silu(linear(x, blk["w_gate"], layer).astype(jnp.float32))
        up = linear(x, blk["w_up"], layer).astype(jnp.float32)
    return linear((gate * up).astype(x.dtype), blk["w_down"], layer)


def _unembed(params: Params, cfg: ModelConfig, h: jnp.ndarray) -> jnp.ndarray:
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if params.get("lm_head") is not None:
        w = params["lm_head"]
        out = linear(h, w).astype(jnp.float32)
        # the int4-grouped unembed table may be vocab-PADDED for wide
        # kernel tiles (quant.quantize_unembed_table pad_to); junk
        # columns must never reach sampling/penalties
        return out[..., :cfg.vocab_size]
    # tied embeddings: contract h [.., D] with embed [V, D] on D
    return jax.lax.dot_general(
        h, params["embed"],
        dimension_numbers=(((h.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def prefill(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            cache: Optional[KVCache], *, offset: int = 0
            ) -> tuple[jnp.ndarray, Optional[KVCache]]:
    """Process a [B, T] chunk of prompt tokens at global positions
    offset..offset+T-1, writing k/v into the cache (if given) and returning
    f32 logits [B, T, V]. `offset` is static (chunked-prefill schedules are
    fixed), so cache reads/writes are static slices, not gathers."""
    h, cache = prefill_hidden(params, cfg, tokens, cache, offset=offset)
    return _unembed(params, cfg, h), cache


def prefill_hidden(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                   cache: Optional[KVCache], *, offset: int = 0,
                   lane_mask: Optional[jnp.ndarray] = None
                   ) -> tuple[jnp.ndarray, Optional[KVCache]]:
    """prefill() without the unembed: returns final hidden states [B, T, D]
    (serving only needs logits at each row's last valid position — callers
    gather first, then unembed a [B, 1, D] slice).

    lane_mask: optional [B] bool — cache rows are written ONLY for masked
    lanes (partial-burst admission: a group of free slots batch-prefills
    while other slots' live decode state stays untouched)."""
    from gabby_tpu.runtime.paged import PagedKVCache
    if isinstance(cache, PagedKVCache):
        return _prefill_hidden_paged(params, cfg, tokens, cache,
                                     offset=offset, lane_mask=lane_mask)
    b, t = tokens.shape
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    positions = jnp.broadcast_to(offset + jnp.arange(t, dtype=jnp.int32), (b, t))
    h = jnp.take(params["embed"], tokens, axis=0)

    quantized = cache is not None and cache.quantized
    paired = cache is not None and cache.k.shape[-1] == 2 * cfg.head_dim

    blocks = params["blocks"]

    def body(carry, xs):
        h, layer = carry
        if cache is None:
            ((attn_norm, mlp_norm),) = xs
        elif quantized:
            (attn_norm, mlp_norm), kc, vc, ksc, vsc = xs
        else:
            (attn_norm, mlp_norm), kc, vc = xs
        xn = rms_norm(h, attn_norm, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, blocks, xn, positions, inv_freq, layer=layer)

        ys = ()
        if cache is not None:
            # cache is head-major [B, Nk, S, H]: transpose the chunk once
            kT = jnp.swapaxes(k, 1, 2)  # [B, Nk, T, H]
            vT = jnp.swapaxes(v, 1, 2)

            def masked(update, cur):
                # partial burst: unmasked lanes keep their existing rows
                if lane_mask is None:
                    return update
                m = lane_mask.reshape((-1,) + (1,) * (update.ndim - 1))
                return jnp.where(m, update, cur)

            if quantized:
                k_codes, k_s = quantize_kv(kT)  # scales [B, Nk, T]
                v_codes, v_s = quantize_kv(vT)
                if paired:  # store head pairs lane-interleaved
                    k_codes = pair_heads(k_codes)
                    v_codes = pair_heads(v_codes)
                kc = jax.lax.dynamic_update_slice(
                    kc, masked(k_codes, kc[:, :, offset:offset + t]),
                    (0, 0, offset, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, masked(v_codes, vc[:, :, offset:offset + t]),
                    (0, 0, offset, 0))
                ksc = jax.lax.dynamic_update_slice(
                    ksc, masked(k_s, ksc[:, :, offset:offset + t]),
                    (0, 0, offset))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, masked(v_s, vsc[:, :, offset:offset + t]),
                    (0, 0, offset))
                ys = (kc, vc, ksc, vsc)
            else:
                kw_, vw_ = kT, vT
                if paired:
                    kw_ = pair_heads(kT)
                    vw_ = pair_heads(vT)
                kc = jax.lax.dynamic_update_slice(
                    kc, masked(kw_.astype(kc.dtype),
                               kc[:, :, offset:offset + t]),
                    (0, 0, offset, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, masked(vw_.astype(vc.dtype),
                               vc[:, :, offset:offset + t]),
                    (0, 0, offset, 0))
                ys = (kc, vc)

        if offset == 0:
            kk, vv = k, v  # fresh prompt: attend over the chunk itself
        else:
            # chunked prefill: attend over everything written so far
            kp = kc[:, :, : offset + t]
            vp = vc[:, :, : offset + t]
            if paired:
                kp = unpair_heads(kp)
                vp = unpair_heads(vp)
            if quantized:
                kk = dequantize_kv(kp, ksc[:, :, : offset + t], k.dtype)
                vv = dequantize_kv(vp, vsc[:, :, : offset + t], v.dtype)
            else:
                kk = kp.astype(k.dtype)
                vv = vp.astype(v.dtype)
            kk = jnp.swapaxes(kk, 1, 2)  # back to [B, S', Nk, H]
            vv = jnp.swapaxes(vv, 1, 2)
        attn = causal_attention(q, kk, vv, q_offset=offset)
        h = h + linear(attn.reshape(b, t, cfg.q_dim), blocks["wo"],
                       layer=layer)
        xn2 = rms_norm(h, mlp_norm, cfg.rms_norm_eps)
        h = h + _mlp(cfg, blocks, xn2, layer=layer)
        return (h, layer + 1), ys

    norms = (blocks["attn_norm"], blocks["mlp_norm"])
    if cache is None:
        xs = (norms,)
    elif quantized:
        xs = (norms, cache.k, cache.v, cache.k_scale, cache.v_scale)
    else:
        xs = (norms, cache.k, cache.v)
    (h, _), ys = jax.lax.scan(body, (h, jnp.int32(0)), xs)

    if cache is None:
        return h, None
    if quantized:
        new_cache = KVCache(k=ys[0], v=ys[1], k_scale=ys[2], v_scale=ys[3])
    else:
        new_cache = KVCache(k=ys[0], v=ys[1], k_scale=None, v_scale=None)
    return h, new_cache


def _prefill_hidden_paged(params: Params, cfg: ModelConfig,
                          tokens: jnp.ndarray, cache, *, offset: int = 0,
                          lane_mask: Optional[jnp.ndarray] = None):
    """Batched (burst) chunk prefill against the paged pool: every lane's
    chunk rows land in its own pages via ONE lane-masked page-granular
    write per layer stack (paged.write_batch_chunk; masked-out lanes
    write to the scratch page). Prior rows (chunked prefill, offset > 0)
    are gathered to a dense [B, ...] view once per chunk — a
    per-admission cost, never per-step. offset and the chunk length must
    be page-aligned (the engine's paged bucket ladder guarantees it)."""
    from gabby_tpu.runtime.paged import write_batch_chunk

    b, t = tokens.shape
    ps = cache.page_size
    assert offset % ps == 0 and t % ps == 0, (offset, t, ps)
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    positions = jnp.broadcast_to(offset + jnp.arange(t, dtype=jnp.int32),
                                 (b, t))
    h = jnp.take(params["embed"], tokens, axis=0)
    quantized = cache.quantized
    blocks = params["blocks"]
    paired = cache_is_paired(cache, cfg)
    mask = (jnp.ones((b,), bool) if lane_mask is None else lane_mask)

    xs_prior = ()
    if offset > 0:
        phys = cache.page_table[:, :offset // ps]  # [B, np]

        def densify(pool):
            g = jnp.take(pool, phys, axis=0)   # [B, np, L, Nk, page, ...]
            g = jnp.moveaxis(g, 1, 3)          # [B, L, Nk, np, page, ...]
            g = g.reshape(b, g.shape[1], g.shape[2], -1, *g.shape[5:])
            return jnp.moveaxis(g, 1, 0)       # [L, B, Nk, S', ...]

        xs_prior = (densify(cache.k), densify(cache.v))
        if quantized:
            xs_prior += (densify(cache.k_scale), densify(cache.v_scale))

    def body(carry, xs):
        h, layer = carry
        (attn_norm, mlp_norm), *prior = xs
        xn = rms_norm(h, attn_norm, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, blocks, xn, positions, inv_freq, layer=layer)
        if offset == 0:
            kk, vv = k, v  # fresh prompt: the chunk attends itself
        else:
            kc, vc = prior[0], prior[1]
            if paired:
                # paired pool rows -> head-major for the dense reference
                # attention (a per-admission chunk cost, never per-step)
                kc, vc = unpair_heads(kc), unpair_heads(vc)
            if quantized:
                kk = dequantize_kv(kc, prior[2], k.dtype)
                vv = dequantize_kv(vc, prior[3], v.dtype)
            else:
                kk, vv = kc.astype(k.dtype), vc.astype(v.dtype)
            kk = jnp.swapaxes(kk, 1, 2)  # [B, S', Nk, H]
            vv = jnp.swapaxes(vv, 1, 2)
            kk = jnp.concatenate([kk, k], axis=1)
            vv = jnp.concatenate([vv, v], axis=1)
        attn = causal_attention(q, kk, vv, q_offset=offset)
        kT = jnp.swapaxes(k, 1, 2)  # [B, Nk, T, H]
        vT = jnp.swapaxes(v, 1, 2)
        if quantized:
            k_codes, k_s = quantize_kv(kT)
            v_codes, v_s = quantize_kv(vT)
            ys = (k_codes, v_codes, k_s, v_s)
        else:
            ys = (kT.astype(cache.k.dtype), vT.astype(cache.v.dtype))
        h = h + linear(attn.reshape(b, t, cfg.q_dim), blocks["wo"],
                       layer=layer)
        xn2 = rms_norm(h, mlp_norm, cfg.rms_norm_eps)
        h = h + _mlp(cfg, blocks, xn2, layer=layer)
        return (h, layer + 1), ys

    norms = (blocks["attn_norm"], blocks["mlp_norm"])
    (h, _), ys = jax.lax.scan(body, (h, jnp.int32(0)), (norms,) + xs_prior)

    kw, vw = ys[0], ys[1]
    if paired:
        # [L, B, Nk, T, H] -> [L, B, Nk/2, T, 2H] (one chunk transpose)
        kw, vw = pair_heads(kw), pair_heads(vw)
    if quantized:
        new_cache = write_batch_chunk(cache, offset, kw, vw, ys[2],
                                      ys[3], mask)
    else:
        new_cache = write_batch_chunk(cache, offset, kw, vw, None,
                                      None, mask)
    return h, new_cache


def decode_step(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                positions: jnp.ndarray, cache, *,
                window: Optional[int] = None,
                attn_positions: Optional[jnp.ndarray] = None
                ) -> tuple[jnp.ndarray, "KVCache"]:
    """One decode step for a batch of slots.

    tokens: [B] int32 — current token per slot.
    positions: [B] int32 — cache index where this token's k/v land
      (== number of tokens already in the slot).
    cache: dense KVCache or runtime/paged.PagedKVCache (dispatched here so
    every caller — decode_loop, tests, the engine — is layout-agnostic).
    window: STATIC upper bound on every slot's live context (attention
      reads only the first `window` cache rows; the flash kernel's grid
      shrinks to match — an 8k-provisioned cache serving 512-token contexts
      prices like a 512-row cache). Caller guarantees positions whose
      output matters are < window.
    attn_positions: [B] i32 — attention read bound per slot when it should
      differ from `positions` (the engine pins PARKED slots to 1 so a dead
      lane streams one chunk, not the whole window; writes still land at
      `positions`, preserving the park-row invariant).
    Returns (f32 logits [B, V], updated cache).
    """
    from gabby_tpu.runtime.paged import PagedKVCache
    if isinstance(cache, PagedKVCache):
        return _decode_step_paged(params, cfg, tokens, positions, cache,
                                  attn_positions=attn_positions)
    read_pos = positions if attn_positions is None else attn_positions
    b = tokens.shape[0]
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    pos2d = positions[:, None]  # [B, 1]
    h = jnp.take(params["embed"], tokens[:, None], axis=0)  # [B, 1, D]
    quantized = cache.quantized
    paired = cache_is_paired(cache, cfg)  # kv_cache.create_cache

    # Cache-traffic design (profiled; the naive forms were the bottleneck):
    # the stacked cache is READ-ONLY inside the layer scan — attention takes
    # the full [L, ...] arrays plus a traced layer index (the Pallas kernel
    # indexes the layer via scalar prefetch; zero copies) and attends cache
    # rows j < pos plus the CURRENT token's k/v passed separately at full
    # precision (`fresh_k/v`). Each layer's new row is collected through ys
    # and written back in ONE batched scatter after the scan, in place on
    # the donated buffers. Writing inside the scan instead — whether
    # streaming layers through xs/ys or carrying the whole cache — made XLA
    # materialize cache copies (measured at 2/3 of the step, or worse).
    #
    # WEIGHTS get the same treatment as the cache: the scan streams only
    # the tiny norm vectors through xs; the big stacked [L, in, out]
    # matmul weights are captured whole and indexed by the traced layer
    # inside linear() (the quantized Pallas kernels take the layer via
    # scalar prefetch — streaming weights through xs dynamic-sliced a full
    # HBM copy of every layer's weights per step, which the profile showed
    # costing as much as the matmuls themselves).
    blocks = params["blocks"]

    def body(carry, norms):
        h, layer = carry
        attn_norm, mlp_norm = norms
        xn = rms_norm(h, attn_norm, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, blocks, xn, pos2d, inv_freq, layer=layer)
        fresh_k, fresh_v = k[:, 0], v[:, 0]  # [B, Nk, H]

        if quantized:
            attn = cache_attention_quantized(
                q, cache.k, cache.v, cache.k_scale, cache.v_scale,
                read_pos, layer=layer, fresh_k=fresh_k, fresh_v=fresh_v,
                window=window)
            k_codes, k_s = quantize_kv(k)  # [B, 1, Nk, H], [B, 1, Nk]
            v_codes, v_s = quantize_kv(v)
            kr, vr = k_codes[:, 0], v_codes[:, 0]
            if paired:  # [B, Nk, H] -> [B, Nk/2, 2H]: free, heads adjacent
                kr = kr.reshape(b, *cache.k.shape[2:3], -1)
                vr = vr.reshape(b, *cache.v.shape[2:3], -1)
            ys = (kr, vr, k_s[:, 0], v_s[:, 0])
        else:
            attn = cache_attention(q, cache.k, cache.v, read_pos,
                                   layer=layer, fresh_k=fresh_k,
                                   fresh_v=fresh_v, window=window)
            kr = fresh_k.astype(cache.k.dtype)
            vr = fresh_v.astype(cache.v.dtype)
            if paired:
                kr = kr.reshape(b, *cache.k.shape[2:3], -1)
                vr = vr.reshape(b, *cache.v.shape[2:3], -1)
            ys = (kr, vr)
        h = h + linear(attn.reshape(b, 1, cfg.q_dim), blocks["wo"],
                       layer=layer)
        xn2 = rms_norm(h, mlp_norm, cfg.rms_norm_eps)
        h = h + _mlp(cfg, blocks, xn2, layer=layer)
        return (h, layer + 1), ys

    (h, _), ys = jax.lax.scan(
        body, (h, jnp.int32(0)),
        (blocks["attn_norm"], blocks["mlp_norm"]))
    logits = _unembed(params, cfg, h)[:, 0]  # [B, V]

    # write every layer's new row with an UNROLLED chain of per-slot
    # dynamic-update-slices (one [L,1,Nk,1,H] block per slot at its own
    # position) — the form XLA reliably turns into in-place updates of the
    # donated while-carry buffers. Both the advanced-index scatter and a
    # fori_loop of the same DUSes made copy-insertion clone the cache every
    # step (~2 ms/step on the 1B bench); B is a static serving constant, so
    # unrolling costs nothing.
    zero = jnp.int32(0)

    def write_all(arr, rows, with_h: bool):
        for i in range(b):
            pos_i = positions[i]
            if with_h:
                upd = rows[:, i][:, None, :, None, :]  # [L,1,Nk,1,H]
                arr = jax.lax.dynamic_update_slice(
                    arr, upd, (zero, jnp.int32(i), zero, pos_i, zero))
            else:
                upd = rows[:, i][:, None, :, None]     # [L,1,Nk,1]
                arr = jax.lax.dynamic_update_slice(
                    arr, upd, (zero, jnp.int32(i), zero, pos_i))
        return arr

    if quantized:
        new_cache = KVCache(
            k=write_all(cache.k, ys[0], True),
            v=write_all(cache.v, ys[1], True),
            k_scale=write_all(cache.k_scale, ys[2], False),
            v_scale=write_all(cache.v_scale, ys[3], False),
        )
    else:
        new_cache = KVCache(k=write_all(cache.k, ys[0], True),
                            v=write_all(cache.v, ys[1], True),
                            k_scale=None, v_scale=None)
    return logits, new_cache


def _decode_step_paged(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                       positions: jnp.ndarray, cache, *,
                       attn_positions: Optional[jnp.ndarray] = None):
    """decode_step against a paged pool: attention reads physical pages via
    the scalar-prefetched page table; the post-scan write chain resolves
    each slot's physical page with one device-side table lookup."""
    from gabby_tpu.ops.attention import paged_cache_attention

    read_pos = positions if attn_positions is None else attn_positions
    b = tokens.shape[0]
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    pos2d = positions[:, None]
    h = jnp.take(params["embed"], tokens[:, None], axis=0)
    quantized = cache.quantized
    blocks = params["blocks"]

    def body(carry, norms):
        h, layer = carry
        attn_norm, mlp_norm = norms
        xn = rms_norm(h, attn_norm, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, blocks, xn, pos2d, inv_freq, layer=layer)
        fresh_k, fresh_v = k[:, 0], v[:, 0]
        attn = paged_cache_attention(
            q, cache.k, cache.v, cache.page_table, read_pos,
            cache.k_scale, cache.v_scale, layer=layer,
            fresh_k=fresh_k, fresh_v=fresh_v)
        if quantized:
            k_codes, k_s = quantize_kv(k)
            v_codes, v_s = quantize_kv(v)
            ys = (k_codes[:, 0], v_codes[:, 0], k_s[:, 0], v_s[:, 0])
        else:
            ys = (fresh_k.astype(cache.k.dtype),
                  fresh_v.astype(cache.v.dtype))
        h = h + linear(attn.reshape(b, 1, cfg.q_dim), blocks["wo"],
                       layer=layer)
        xn2 = rms_norm(h, mlp_norm, cfg.rms_norm_eps)
        h = h + _mlp(cfg, blocks, xn2, layer=layer)
        return (h, layer + 1), ys

    (h, _), ys = jax.lax.scan(
        body, (h, jnp.int32(0)),
        (blocks["attn_norm"], blocks["mlp_norm"]))
    logits = _unembed(params, cfg, h)[:, 0]

    # per-slot unrolled write, same as dense, but the row target is
    # (physical page, row-in-page) resolved through the page table
    ps = cache.page_size
    zero = jnp.int32(0)
    paired = cache_is_paired(cache, cfg)

    max_seq = cache.page_table.shape[1] * ps

    def write_all(pool, rows, with_h: bool):
        for i in range(b):
            pos_i = positions[i]
            # a slot the fused loop deactivated at the cache cap keeps
            # writing (no active gating, same as dense) with its position
            # frozen at max_seq — that row must land on the SCRATCH page
            # (physical 0): the un-clamped table lookup would wrap it to
            # row 0 of the slot's last page, which may be prefix-SHARED
            # with another slot (full-allocation donor adoption)
            lp = jnp.minimum(pos_i // ps, cache.page_table.shape[1] - 1)
            phys = jnp.where(pos_i < max_seq, cache.page_table[i, lp], 0)
            row = pos_i % ps
            if with_h:
                r = rows[:, i]                         # [L, Nk, H]
                if paired:
                    # single rows pair by free reshape (adjacent heads
                    # contiguous): [L, Nk, H] -> [L, Nk/2, 2H]
                    r = r.reshape(r.shape[0], r.shape[1] // 2,
                                  2 * r.shape[2])
                upd = r[None, :, :, None, :]           # [1, L, Nk', 1, H']
                pool = jax.lax.dynamic_update_slice(
                    pool, upd, (phys, zero, zero, row, zero))
            else:
                upd = rows[:, i][None, :, :, None]     # [1, L, Nk, 1]
                pool = jax.lax.dynamic_update_slice(
                    pool, upd, (phys, zero, zero, row))
        return pool

    # ys leaves are [L, B, ...]: transpose slot axis out per write
    if quantized:
        new_cache = dataclasses.replace(
            cache,
            k=write_all(cache.k, ys[0], True),
            v=write_all(cache.v, ys[1], True),
            k_scale=write_all(cache.k_scale, ys[2], False),
            v_scale=write_all(cache.v_scale, ys[3], False))
    else:
        new_cache = dataclasses.replace(
            cache, k=write_all(cache.k, ys[0], True),
            v=write_all(cache.v, ys[1], True))
    return logits, new_cache


def prefill_slot(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                 length: jnp.ndarray, slot: jnp.ndarray, offset: jnp.ndarray,
                 cache) -> tuple[jnp.ndarray, "KVCache"]:
    """Prefill ONE cache slot with a (padded) chunk of prompt tokens.

    The continuous-batching building block: requests arrive at different
    times, so each is prefilled individually into its slot while the other
    slots' state stays put. All of `length`/`slot`/`offset` are TRACED
    scalars — one compile per chunk-length bucket, no matter which slot or
    position the chunk lands at (the no-retrace rule, SURVEY.md §7).

    tokens: [T] int32, valid in [:length], padding after.
    length: scalar int32, number of valid tokens in this chunk.
    slot: scalar int32, cache row to fill.
    offset: scalar int32, global position of tokens[0] (chunked prefill).
    Returns (f32 logits [V] at the LAST VALID token, updated cache).

    Attention reads the full [S_max] cache row with a position mask instead
    of a dynamic slice — static shapes beat saved FLOPs under XLA here, and
    it makes quantized-KV behaviour exactly match the decode path (the
    chunk's own k/v are read back through the cache's quantization).
    """
    from gabby_tpu.runtime.paged import PagedKVCache
    if isinstance(cache, PagedKVCache):
        return _prefill_slot_paged(params, cfg, tokens, length, slot, offset,
                                   cache)
    t = tokens.shape[0]
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    positions = offset + jnp.arange(t, dtype=jnp.int32)  # [T]
    h = jnp.take(params["embed"], tokens[None, :], axis=0)  # [1, T, D]
    quantized = cache.quantized
    paired = cache_is_paired(cache, cfg)
    zero = jnp.zeros((), jnp.int32)

    # Same cache-traffic design as decode_step: the stacked cache is
    # READ-ONLY inside the layer scan (attention reads rows j < offset via
    # the kernel's scalar-prefetched (slot, offset, layer) and attends the
    # chunk's own k/v as a separate full-precision causal block); each
    # layer's new rows collect through ys and land in ONE in-place
    # dynamic-update-slice after the scan.
    blocks = params["blocks"]

    def body(carry, norms):
        h, layer = carry
        attn_norm, mlp_norm = norms
        xn = rms_norm(h, attn_norm, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, blocks, xn, positions[None, :], inv_freq,
                       layer=layer)
        kT = jnp.swapaxes(k, 1, 2)  # [1, Nk, T, H] (head-major cache)
        vT = jnp.swapaxes(v, 1, 2)

        if quantized:
            attn = slot_prefill_attention(
                q, cache.k, cache.v, slot, offset,
                cache.k_scale, cache.v_scale,
                fresh_k=kT[0], fresh_v=vT[0], layer=layer)
            k_codes, k_s = quantize_kv(kT)
            v_codes, v_s = quantize_kv(vT)
            kr, vr = k_codes[0], v_codes[0]
            if paired:
                kr, vr = pair_heads(kr), pair_heads(vr)
            ys = (kr, vr, k_s[0], v_s[0])
        else:
            attn = slot_prefill_attention(q, cache.k, cache.v, slot, offset,
                                          fresh_k=kT[0], fresh_v=vT[0],
                                          layer=layer)
            kr = kT[0].astype(cache.k.dtype)
            vr = vT[0].astype(cache.v.dtype)
            if paired:
                kr, vr = pair_heads(kr), pair_heads(vr)
            ys = (kr, vr)
        h = h + linear(attn.reshape(1, t, cfg.q_dim), blocks["wo"],
                       layer=layer)
        xn2 = rms_norm(h, mlp_norm, cfg.rms_norm_eps)
        h = h + _mlp(cfg, blocks, xn2, layer=layer)
        return (h, layer + 1), ys

    (h, _), ys = jax.lax.scan(
        body, (h, jnp.int32(0)),
        (blocks["attn_norm"], blocks["mlp_norm"]))

    # unembed only the last valid position (cheap: 1 row, not T)
    h_last = jax.lax.dynamic_slice(
        h, (zero, length - 1, zero), (1, 1, cfg.hidden_size))
    logits = _unembed(params, cfg, h_last)[0, 0]  # [V]

    # one in-place write of all layers' chunk rows: ys k/v are
    # [L, Nk, T, H] (+ scales [L, Nk, T])
    if quantized:
        new_cache = KVCache(
            k=jax.lax.dynamic_update_slice(
                cache.k, ys[0][:, None], (zero, slot, zero, offset, zero)),
            v=jax.lax.dynamic_update_slice(
                cache.v, ys[1][:, None], (zero, slot, zero, offset, zero)),
            k_scale=jax.lax.dynamic_update_slice(
                cache.k_scale, ys[2][:, None], (zero, slot, zero, offset)),
            v_scale=jax.lax.dynamic_update_slice(
                cache.v_scale, ys[3][:, None], (zero, slot, zero, offset)),
        )
    else:
        new_cache = KVCache(
            k=jax.lax.dynamic_update_slice(
                cache.k, ys[0][:, None], (zero, slot, zero, offset, zero)),
            v=jax.lax.dynamic_update_slice(
                cache.v, ys[1][:, None], (zero, slot, zero, offset, zero)),
            k_scale=None, v_scale=None,
        )
    return logits, new_cache


def verify_step(params: Params, cfg: ModelConfig, tokens_bt: jnp.ndarray,
                positions0: jnp.ndarray, cache: KVCache, *,
                window: Optional[int] = None,
                attn_positions: Optional[jnp.ndarray] = None
                ) -> tuple[jnp.ndarray, KVCache]:
    """Speculative-decoding verify pass: score T candidate tokens per slot
    in ONE forward (the whole point: the weights stream once for T
    positions instead of once per token).

    tokens_bt: [B, T] — tokens_bt[:, 0] is each slot's CURRENT token (at
    cache position positions0[b]); columns 1.. are draft tokens for the
    following positions. Returns (f32 logits [B, T, V], cache with ALL T
    rows written at positions0[b]..positions0[b]+T-1).

    No rollback is ever needed: rows written for rejected drafts sit at
    positions the slot has not reached — by the engine's positions
    invariant they are overwritten (by the next verify at that position)
    before anything can read them. Rejection = simply not advancing.

    Queries attend cache rows j < positions0[b] plus the T-token block
    itself causally at full precision (the batched, per-slot-offset
    generalization of the fresh-row decode contract).
    """
    from gabby_tpu.runtime.paged import PagedKVCache
    if isinstance(cache, PagedKVCache):
        return _verify_step_paged(params, cfg, tokens_bt, positions0, cache,
                                  attn_positions=attn_positions)
    b, t = tokens_bt.shape
    read_pos = positions0 if attn_positions is None else attn_positions
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    positions = positions0[:, None] + jnp.arange(t, dtype=jnp.int32)  # [B,T]
    h = jnp.take(params["embed"], tokens_bt, axis=0)  # [B, T, D]
    quantized = cache.quantized
    paired = cache_is_paired(cache, cfg)
    blocks = params["blocks"]
    s_max = cache.max_seq
    # a [T]-row write at the slot's position: clamp so the block can never
    # shift-corrupt earlier rows (parked slots sit at max_seq-1; the
    # clamped tail rows are garbage that is written-before-read like any
    # other not-yet-reached position)
    write_pos = jnp.minimum(positions0, s_max - t)  # [B]

    from gabby_tpu.ops import pallas as pk
    use_kernel = pk.kernels_enabled() and cfg.num_heads % cfg.num_kv_heads == 0

    def body(carry, norms):
        h, layer = carry
        attn_norm, mlp_norm = norms
        xn = rms_norm(h, attn_norm, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, blocks, xn, positions, inv_freq, layer=layer)
        kT = jnp.swapaxes(k, 1, 2)  # [B, Nk, T, H]
        vT = jnp.swapaxes(v, 1, 2)

        if use_kernel:
            # flash verify: one kernel pass over the stacked cache (layer
            # via scalar prefetch — no slice copy, no dense concat) serves
            # all T candidate queries
            from gabby_tpu.ops.pallas import attention as pattn
            attn = pattn.verify_attention(
                q, cache.k, cache.v, read_pos,
                cache.k_scale if quantized else None,
                cache.v_scale if quantized else None,
                layer=layer, fresh_k=kT.astype(q.dtype),
                fresh_v=vT.astype(q.dtype), window=window)
        else:
            # reference path: [B, S] cache rows masked j < positions0,
            # plus the block itself with a causal mask
            kc = jax.lax.dynamic_index_in_dim(cache.k, layer, 0, False)
            vc = jax.lax.dynamic_index_in_dim(cache.v, layer, 0, False)
            if paired:
                kc, vc = unpair_heads(kc), unpair_heads(vc)
            if quantized:
                ksc = jax.lax.dynamic_index_in_dim(cache.k_scale, layer,
                                                   0, False)
                vsc = jax.lax.dynamic_index_in_dim(cache.v_scale, layer,
                                                   0, False)
                kk = dequantize_kv(kc, ksc, q.dtype)
                vv = dequantize_kv(vc, vsc, q.dtype)
            else:
                kk, vv = kc.astype(q.dtype), vc.astype(q.dtype)
            kk = jnp.swapaxes(kk, 1, 2)  # [B, S, Nk, H]
            vv = jnp.swapaxes(vv, 1, 2)
            kk = jnp.concatenate([kk, k.astype(q.dtype)], axis=1)
            vv = jnp.concatenate([vv, v.astype(q.dtype)], axis=1)
            s = s_max
            cache_mask = (jnp.arange(s)[None, None, :]
                          < read_pos[:, None, None])        # [B, 1, S]
            cache_mask = jnp.broadcast_to(cache_mask, (b, t, s))
            self_mask = (jnp.arange(t)[None, :, None]
                         >= jnp.arange(t)[None, None, :])   # [1, T, T]
            self_mask = jnp.broadcast_to(self_mask, (b, t, t))
            mask = jnp.concatenate([cache_mask, self_mask], axis=2)
            from gabby_tpu.ops.attention import _gqa_core, _split_groups
            attn = _gqa_core(_split_groups(q, cfg.num_kv_heads), kk, vv,
                             mask, cfg.head_dim ** -0.5).astype(q.dtype)
        if quantized:
            k_codes, k_s = quantize_kv(kT)
            v_codes, v_s = quantize_kv(vT)
            kr, vr = k_codes, v_codes
            if paired:
                kr, vr = pair_heads(kr), pair_heads(vr)
            ys = (kr, vr, k_s, v_s)
        else:
            kr = kT.astype(cache.k.dtype)
            vr = vT.astype(cache.v.dtype)
            if paired:
                kr, vr = pair_heads(kr), pair_heads(vr)
            ys = (kr, vr)
        h = h + linear(attn.reshape(b, t, cfg.q_dim), blocks["wo"],
                       layer=layer)
        xn2 = rms_norm(h, mlp_norm, cfg.rms_norm_eps)
        h = h + _mlp(cfg, blocks, xn2, layer=layer)
        return (h, layer + 1), ys

    (h, _), ys = jax.lax.scan(
        body, (h, jnp.int32(0)),
        (blocks["attn_norm"], blocks["mlp_norm"]))
    logits = _unembed(params, cfg, h)  # [B, T, V]

    # one contiguous [L, 1, Nk, T, H] write per slot (unrolled; B static).
    # Near the cap (positions0 > s_max - t) the clamped block would land
    # o = positions0 - write_pos rows BEFORE the slot's position and
    # shift-corrupt real history (reachable via prefix-reuse donors, and
    # what forced spec lanes to finish d tokens early): blend the update
    # so rows r < o replicate the existing cache (identity write) and
    # fresh rows land at their true positions. All reads come from the
    # PRE-write array (slot lanes are disjoint) so XLA schedules them
    # before the in-place update chain.
    zero = jnp.int32(0)
    offs = positions0 - write_pos  # [B]; 0 unless within t of the cap
    ridx = jnp.arange(t, dtype=jnp.int32)

    def write_all(arr, rows, with_h: bool):
        l, nk = arr.shape[0], arr.shape[2]
        if with_h:
            curs = [jax.lax.dynamic_slice(
                arr, (zero, jnp.int32(i), zero, write_pos[i], zero),
                (l, 1, nk, t, arr.shape[4])) for i in range(b)]
        else:
            curs = [jax.lax.dynamic_slice(
                arr, (zero, jnp.int32(i), zero, write_pos[i]),
                (l, 1, nk, t)) for i in range(b)]
        for i in range(b):
            fresh = rows[:, i][:, None]  # [L, 1, Nk, T(, H)]
            mask = (ridx < offs[i]).reshape(
                (1, 1, 1, t) + ((1,) if with_h else ()))
            upd = jnp.where(mask, curs[i],
                            jnp.roll(fresh, offs[i], axis=3))
            if with_h:
                arr = jax.lax.dynamic_update_slice(
                    arr, upd, (zero, jnp.int32(i), zero, write_pos[i],
                               zero))
            else:
                arr = jax.lax.dynamic_update_slice(
                    arr, upd, (zero, jnp.int32(i), zero, write_pos[i]))
        return arr

    if quantized:
        new_cache = KVCache(
            k=write_all(cache.k, ys[0], True),
            v=write_all(cache.v, ys[1], True),
            k_scale=write_all(cache.k_scale, ys[2], False),
            v_scale=write_all(cache.v_scale, ys[3], False))
    else:
        new_cache = KVCache(k=write_all(cache.k, ys[0], True),
                            v=write_all(cache.v, ys[1], True),
                            k_scale=None, v_scale=None)
    return logits, new_cache


def _verify_step_paged(params: Params, cfg: ModelConfig,
                       tokens_bt: jnp.ndarray, positions0: jnp.ndarray,
                       cache, *, attn_positions=None):
    """verify_step against the paged pool. Attention uses the paged flash
    verify kernel (one pool pass for all T candidates; physical pages via
    scalar prefetch); off-kernel (CPU tests) it gathers a dense view and
    reuses the dense verify math. Writes land ROW-at-a-time through the
    page table (a [T]-row block may straddle a page boundary; T is small,
    so T*B tiny in-place writes beat gather/scatter gymnastics). Rows for
    positions past a slot's current page allocation are routed to the
    SCRATCH page (stale table entries), so no clamping is needed — the
    engine provisions pages to the verify horizon before each call."""
    from gabby_tpu.ops import pallas as pk
    from gabby_tpu.ops.attention import paged_cache_attention

    b, t = tokens_bt.shape
    read_pos = positions0 if attn_positions is None else attn_positions
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    positions = positions0[:, None] + jnp.arange(t, dtype=jnp.int32)
    h = jnp.take(params["embed"], tokens_bt, axis=0)
    quantized = cache.quantized
    blocks = params["blocks"]
    use_kernel = pk.kernels_enabled() and cfg.num_heads % cfg.num_kv_heads == 0
    paired = cache_is_paired(cache, cfg)

    def body(carry, norms):
        h, layer = carry
        attn_norm, mlp_norm = norms
        xn = rms_norm(h, attn_norm, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, blocks, xn, positions, inv_freq, layer=layer)
        kT = jnp.swapaxes(k, 1, 2)  # [B, Nk, T, H]
        vT = jnp.swapaxes(v, 1, 2)
        if use_kernel:
            from gabby_tpu.ops.pallas import attention as pattn
            attn = pattn.paged_verify_attention(
                q, cache.k, cache.v, cache.page_table, read_pos,
                cache.k_scale, cache.v_scale, layer=layer,
                fresh_k=kT.astype(q.dtype), fresh_v=vT.astype(q.dtype))
        else:
            # reference path: gather the pool dense, then the T-query
            # block attends rows j < read_pos plus itself causally —
            # expressed as T single-row paged attentions would lose the
            # causal self-block, so densify and mask directly
            def dense(pool):
                plane = jax.lax.dynamic_index_in_dim(pool, layer, 1, False)
                g = jnp.take(plane, cache.page_table, axis=0)
                g = jnp.moveaxis(g, 1, 2)
                return g.reshape(g.shape[0], g.shape[1], -1, *g.shape[4:])

            kk, vv = dense(cache.k), dense(cache.v)
            if paired:
                kk, vv = unpair_heads(kk), unpair_heads(vv)
            if quantized:
                kk = dequantize_kv(kk, dense(cache.k_scale), q.dtype)
                vv = dequantize_kv(vv, dense(cache.v_scale), q.dtype)
            kk = jnp.swapaxes(kk.astype(q.dtype), 1, 2)  # [B, S, Nk, H]
            vv = jnp.swapaxes(vv.astype(q.dtype), 1, 2)
            kk = jnp.concatenate([kk, k.astype(q.dtype)], axis=1)
            vv = jnp.concatenate([vv, v.astype(q.dtype)], axis=1)
            s = kk.shape[1] - t
            cache_mask = (jnp.arange(s)[None, None, :]
                          < read_pos[:, None, None])
            cache_mask = jnp.broadcast_to(cache_mask, (b, t, s))
            self_mask = (jnp.arange(t)[None, :, None]
                         >= jnp.arange(t)[None, None, :])
            self_mask = jnp.broadcast_to(self_mask, (b, t, t))
            mask = jnp.concatenate([cache_mask, self_mask], axis=2)
            from gabby_tpu.ops.attention import _gqa_core, _split_groups
            attn = _gqa_core(_split_groups(q, cfg.num_kv_heads), kk, vv,
                             mask, cfg.head_dim ** -0.5).astype(q.dtype)
        if quantized:
            k_codes, k_s = quantize_kv(kT)
            v_codes, v_s = quantize_kv(vT)
            ys = (k_codes, v_codes, k_s, v_s)
        else:
            ys = (kT.astype(cache.k.dtype), vT.astype(cache.v.dtype))
        h = h + linear(attn.reshape(b, t, cfg.q_dim), blocks["wo"],
                       layer=layer)
        xn2 = rms_norm(h, mlp_norm, cfg.rms_norm_eps)
        h = h + _mlp(cfg, blocks, xn2, layer=layer)
        return (h, layer + 1), ys

    (h, _), ys = jax.lax.scan(
        body, (h, jnp.int32(0)),
        (blocks["attn_norm"], blocks["mlp_norm"]))
    logits = _unembed(params, cfg, h)  # [B, T, V]

    # row-at-a-time page-table writes: ys leaves are [L, B, Nk, T(, H)]
    ps = cache.page_size
    zero = jnp.int32(0)

    max_seq = cache.page_table.shape[1] * ps

    def write_all(pool, rows, with_h: bool):
        for i in range(b):
            for tt in range(t):
                pos_it = positions0[i] + tt
                # verify writes the WHOLE t-row block even when the device
                # loop stopped drafting near the cache cap (count == 0) —
                # rows at pos >= max_seq must go to the SCRATCH page
                # (physical 0, never read). Clamping lp alone is NOT
                # enough: a slot with its full page allocation live would
                # wrap those rows into its own last page at row pos%ps,
                # corrupting real KV history near the cap.
                lp = jnp.minimum(pos_it // ps,
                                 cache.page_table.shape[1] - 1)
                phys = jnp.where(pos_it < max_seq,
                                 cache.page_table[i, lp], 0)
                row = pos_it % ps
                if with_h:
                    r = rows[:, i, :, tt]              # [L, Nk, H]
                    if paired:
                        r = r.reshape(r.shape[0], r.shape[1] // 2,
                                      2 * r.shape[2])
                    upd = r[None, :, :, None, :]
                    pool = jax.lax.dynamic_update_slice(
                        pool, upd, (phys, zero, zero, row, zero))
                else:
                    upd = rows[:, i, :, tt][None, :, :, None]
                    pool = jax.lax.dynamic_update_slice(
                        pool, upd, (phys, zero, zero, row))
        return pool

    if quantized:
        new_cache = dataclasses.replace(
            cache,
            k=write_all(cache.k, ys[0], True),
            v=write_all(cache.v, ys[1], True),
            k_scale=write_all(cache.k_scale, ys[2], False),
            v_scale=write_all(cache.v_scale, ys[3], False))
    else:
        new_cache = dataclasses.replace(
            cache, k=write_all(cache.k, ys[0], True),
            v=write_all(cache.v, ys[1], True))
    return logits, new_cache


def _prefill_slot_paged(params: Params, cfg: ModelConfig,
                        tokens: jnp.ndarray, length: jnp.ndarray,
                        slot: jnp.ndarray, offset: jnp.ndarray, cache):
    """prefill_slot against a paged pool. The slot's pages are gathered
    into a dense per-slot view ONCE per chunk (a per-admission cost on the
    order of the rows attention must read anyway — stale table entries
    beyond the allocation are masked by `offset`), the chunk runs the
    dense slot-prefill attention over it, and the new rows land with one
    page-granular write per spanned page. Chunk length and offset must be
    page-aligned (the engine's paged bucket ladder guarantees it)."""
    from gabby_tpu.runtime.paged import write_slot_chunk

    t = tokens.shape[0]
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    positions = offset + jnp.arange(t, dtype=jnp.int32)
    h = jnp.take(params["embed"], tokens[None, :], axis=0)
    quantized = cache.quantized
    blocks = params["blocks"]
    paired = cache_is_paired(cache, cfg)
    zero = jnp.zeros((), jnp.int32)

    phys = cache.page_table[slot]  # [max_pages]

    def densify(pool):
        g = jnp.take(pool, phys, axis=0)      # [mp, L, Nk, page, ...]
        g = jnp.moveaxis(g, 0, 2)             # [L, Nk, mp, page, ...]
        return g.reshape(g.shape[0], g.shape[1], -1, *g.shape[4:])

    gk, gv = densify(cache.k), densify(cache.v)
    gks = densify(cache.k_scale) if quantized else None
    gvs = densify(cache.v_scale) if quantized else None

    def body(carry, xs):
        h, layer = carry
        if quantized:
            (attn_norm, mlp_norm), kc, vc, ksc, vsc = xs
        else:
            (attn_norm, mlp_norm), kc, vc = xs
            ksc = vsc = None
        xn = rms_norm(h, attn_norm, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, blocks, xn, positions[None, :], inv_freq,
                       layer=layer)
        kT = jnp.swapaxes(k, 1, 2)
        vT = jnp.swapaxes(v, 1, 2)
        attn = slot_prefill_attention(
            q, kc[None], vc[None], zero, offset,
            ksc[None] if quantized else None,
            vsc[None] if quantized else None,
            fresh_k=kT[0], fresh_v=vT[0])
        if quantized:
            k_codes, k_s = quantize_kv(kT)
            v_codes, v_s = quantize_kv(vT)
            ys = (k_codes[0], v_codes[0], k_s[0], v_s[0])
        else:
            ys = (kT[0].astype(cache.k.dtype), vT[0].astype(cache.v.dtype))
        h = h + linear(attn.reshape(1, t, cfg.q_dim), blocks["wo"],
                       layer=layer)
        xn2 = rms_norm(h, mlp_norm, cfg.rms_norm_eps)
        h = h + _mlp(cfg, blocks, xn2, layer=layer)
        return (h, layer + 1), ys

    norms = (blocks["attn_norm"], blocks["mlp_norm"])
    xs = (norms, gk, gv) + ((gks, gvs) if quantized else ())
    (h, _), ys = jax.lax.scan(body, (h, jnp.int32(0)), xs)

    h_last = jax.lax.dynamic_slice(
        h, (zero, length - 1, zero), (1, 1, cfg.hidden_size))
    logits = _unembed(params, cfg, h_last)[0, 0]

    kw, vw = ys[0], ys[1]
    if paired:
        kw, vw = pair_heads(kw), pair_heads(vw)
    if quantized:
        new_cache = write_slot_chunk(cache, slot, offset, kw, vw,
                                     ys[2], ys[3])
    else:
        new_cache = write_slot_chunk(cache, slot, offset, kw, vw,
                                     None, None)
    return logits, new_cache


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Cache-free full forward (perplexity eval, golden tests): [B,T] -> [B,T,V] f32."""
    logits, _ = prefill(params, cfg, tokens, None)
    return logits
