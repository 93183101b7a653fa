"""Sequence parallelism for long-prompt prefill (SURVEY §2b SP/CP row).

A single long admission leaves the mesh's "data" axis idle — decode slots
shard over it, but one prompt occupies one slot. Sequence-sharded prefill
puts that idle axis to work on the prompt's TOKEN axis instead: the
chunk's hidden states carry a P(None, "data", None) sharding constraint
through every layer, so

  * embeddings, norms, projections, RoPE and the MLP run on 1/dp of the
    tokens per device-group (token-wise data parallelism — zero
    communication: every op is pointwise over the token axis), and
  * causal attention's cross-shard token mixing is compiled by GSPMD:
    with queries token-sharded and keys/values needed globally, XLA
    inserts the all-gather of the chunk's K/V heads over the data axis
    (K/V are GQA-narrow — Nk*H lanes — so the gathered bytes are ~1/G of
    an activation all-gather) and keeps the [T_shard, T] score tiles
    local. This is the Ulysses trade expressed declaratively: shard the
    long axis, gather the narrow one, and let the compiler place the
    collectives on ICI.

The prompt-side capacity story for BASELINE config 5 (70B chunked
prefill): activation memory per chip drops by 1/dp for the in-flight
chunk, so the chunk bucket — and with it prefill MXU efficiency — can
grow by dp at fixed HBM.

Numerically identical to the unsharded prefill (pure sharding
annotations; tests/test_sp.py proves it on the virtual mesh).

Reference: dhconnelly/gabby has no parallelism of any kind (SURVEY §2b);
this subsystem is net-new, specified by BASELINE.json config 5.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gabby_tpu.config import ModelConfig
from gabby_tpu.models import llama
from gabby_tpu.ops.linear import linear
from gabby_tpu.ops.norms import rms_norm
from gabby_tpu.ops.rope import rope_inv_freq
from gabby_tpu.runtime.kv_cache import quantize_kv


def _seq_constraint(mesh: Mesh):
    """Token-axis constraint for [B=1, T, ...] activations."""
    def pin(x):
        spec = P(None, "data", *([None] * (x.ndim - 2)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    return pin


def sp_prefill_slot(params, cfg: ModelConfig, tokens: jnp.ndarray,
                    length: jnp.ndarray, slot: jnp.ndarray,
                    offset: jnp.ndarray, cache, *, mesh: Mesh,
                    ring: bool = False):
    """Sequence-sharded analogue of generate.prefill_slot for ONE slot.

    tokens: [T] (T divisible by the mesh's data-axis size), length/slot/
    offset traced scalars, `cache` a dense KVCache (stacked [L, B, Nk, S,
    H]). Returns (last-valid logits [V], updated cache) — bit-compatible
    with llama.prefill_slot (the constraint changes placement, not math).

    Attention here is the chunk-local causal form over [offset, offset+T)
    plus a masked read of rows [0, offset) — the same contract as
    llama._prefill_slot's fresh-chunk path — with every [1, T, ...]
    intermediate pinned to the token sharding.

    ring=True swaps the chunk self-attention from the GSPMD all-gather
    (Ulysses: the whole chunk's K/V materialize on every device) to RING
    attention over ICI (parallel/ring.py): K/V stay token-sharded and
    rotate neighbor-to-neighbor, so per-device chunk K/V memory is
    O(T/dp) — the form for chunks whose gathered K/V would not fit
    (BASELINE config 5 long-prompt prefill). Same numerics either way."""
    dp = mesh.shape.get("data", 1)
    t = tokens.shape[0]
    assert t % dp == 0, f"chunk {t} must divide over data axis {dp}"
    run = _build_sp_prefill(mesh, ring)
    with mesh:
        return run(params, cfg, tokens, length, slot, offset, cache)


import functools


@functools.lru_cache(maxsize=None)
def _build_sp_prefill(mesh: Mesh, ring: bool = False):
    """One jitted program set per (mesh, ring) (jit caches per shape/dtype
    under it — a fresh closure per call would retrace every prefill)."""
    pin = _seq_constraint(mesh)

    @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
    def run(params, cfg, tokens, length, slot, offset, cache):
        t = tokens.shape[0]
        quantized = cache.quantized
        from gabby_tpu.runtime.kv_cache import cache_is_paired
        paired = cache_is_paired(cache, cfg)
        inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta,
                                 cfg.rope_scaling)
        positions = offset + jnp.arange(t, dtype=jnp.int32)
        h = pin(jnp.take(params["embed"], tokens[None, :], axis=0))
        blocks = params["blocks"]

        def body(carry, norms):
            h, layer = carry
            attn_norm, mlp_norm = norms
            xn = pin(rms_norm(h, attn_norm, cfg.rms_norm_eps))
            q, k, v = llama._qkv(cfg, blocks, xn, positions[None, :],
                                 inv_freq, layer=layer)
            q, k, v = pin(q), pin(k), pin(v)
            # prior cache rows [0, offset) for this slot + the chunk's own
            # k/v causally. The cache read is the standard masked slice;
            # the chunk self-attention is where GSPMD inserts the K/V
            # all-gather over the token shards.
            kc = jax.lax.dynamic_index_in_dim(cache.k, layer, 0, False)
            vc = jax.lax.dynamic_index_in_dim(cache.v, layer, 0, False)
            kc = jax.lax.dynamic_index_in_dim(kc, slot, 0, True)  # [1,Nk,S,H]
            vc = jax.lax.dynamic_index_in_dim(vc, slot, 0, True)
            if paired:
                from gabby_tpu.runtime.kv_cache import unpair_heads
                kc, vc = unpair_heads(kc), unpair_heads(vc)
            if quantized:
                from gabby_tpu.runtime.kv_cache import dequantize_kv
                ks = jax.lax.dynamic_index_in_dim(
                    cache.k_scale, layer, 0, False)
                vs = jax.lax.dynamic_index_in_dim(
                    cache.v_scale, layer, 0, False)
                ks = jax.lax.dynamic_index_in_dim(ks, slot, 0, True)
                vs = jax.lax.dynamic_index_in_dim(vs, slot, 0, True)
                kcd = dequantize_kv(kc, ks, q.dtype)
                vcd = dequantize_kv(vc, vs, q.dtype)
            else:
                kcd, vcd = kc.astype(q.dtype), vc.astype(q.dtype)
            kcd = jnp.swapaxes(kcd, 1, 2)  # [1, S, Nk, H]
            vcd = jnp.swapaxes(vcd, 1, 2)
            if ring:
                # K/V stay token-sharded; dp-1 ppermute hops instead of
                # the chunk-wide all-gather (parallel/ring.py); prior
                # cache rows fold into the same online softmax replicated
                from gabby_tpu.parallel.ring import ring_self_attention
                attn = ring_self_attention(
                    q, k.astype(q.dtype), v.astype(q.dtype), mesh=mesh,
                    sm_scale=cfg.head_dim ** -0.5,
                    cache_k=kcd.astype(q.dtype), cache_v=vcd.astype(q.dtype),
                    cache_len=offset)
            else:
                kk = jnp.concatenate([kcd, k.astype(q.dtype)], axis=1)
                vv = jnp.concatenate([vcd, v.astype(q.dtype)], axis=1)
                s = kcd.shape[1]
                # mask: cache rows j < offset; chunk rows causal at
                # q_offset
                from gabby_tpu.ops.attention import _gqa_core, _split_groups
                cache_mask = jnp.arange(s)[None, None, :] < offset
                cache_mask = jnp.broadcast_to(cache_mask, (1, t, s))
                self_mask = (jnp.arange(t)[None, :, None]
                             >= jnp.arange(t)[None, None, :])
                self_mask = jnp.broadcast_to(self_mask, (1, t, t))
                mask = jnp.concatenate([cache_mask, self_mask], axis=2)
                attn = _gqa_core(_split_groups(q, cfg.num_kv_heads), kk, vv,
                                 mask, cfg.head_dim ** -0.5).astype(q.dtype)
            attn = pin(attn)
            h = h + pin(linear(attn.reshape(1, t, cfg.q_dim), blocks["wo"],
                               layer=layer))
            xn2 = pin(rms_norm(h, mlp_norm, cfg.rms_norm_eps))
            h = h + pin(llama._mlp(cfg, blocks, xn2, layer=layer))
            kT = jnp.swapaxes(k, 1, 2)  # [1, Nk, T, H]
            vT = jnp.swapaxes(v, 1, 2)
            if quantized:
                k_codes, k_s = quantize_kv(kT)
                v_codes, v_s = quantize_kv(vT)
                ys = (k_codes[0], v_codes[0], k_s[0], v_s[0])
            else:
                ys = (kT[0].astype(cache.k.dtype),
                      vT[0].astype(cache.v.dtype))
            return (h, layer + 1), ys

        norms = (blocks["attn_norm"], blocks["mlp_norm"])
        (h, _), ys = jax.lax.scan(body, (h, jnp.int32(0)), norms)

        # cache write: [L, Nk, T, H(')] rows at (slot, offset)
        def write(buf, rows, with_h):
            if with_h and paired:
                from gabby_tpu.runtime.kv_cache import pair_heads
                rows = pair_heads(rows)
            upd = rows[:, None]  # [L, 1, Nk', T, H']
            start = ((jnp.int32(0), slot, jnp.int32(0), offset, jnp.int32(0))
                     if with_h else
                     (jnp.int32(0), slot, jnp.int32(0), offset))
            return jax.lax.dynamic_update_slice(buf, upd, start)

        import dataclasses
        if quantized:
            cache2 = dataclasses.replace(
                cache, k=write(cache.k, ys[0], True),
                v=write(cache.v, ys[1], True),
                k_scale=write(cache.k_scale, ys[2], False),
                v_scale=write(cache.v_scale, ys[3], False))
        else:
            cache2 = dataclasses.replace(
                cache, k=write(cache.k, ys[0], True),
                v=write(cache.v, ys[1], True))
        h_last = jax.lax.dynamic_slice(
            h, (jnp.int32(0), length - 1, jnp.int32(0)),
            (1, 1, cfg.hidden_size))
        logits = llama._unembed(params, cfg, h_last)[0, 0]
        return logits, cache2

    return run
