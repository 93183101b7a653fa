"""Fixed-shape slot KV cache, optionally INT8-quantized.

Shapes are static for the life of the server — [layers, slots, max_seq, ...]
— so the decode step compiles exactly once no matter how batch composition
churns (the load-bearing design choice for continuous batching under XLA; see
SURVEY.md §7). Per-slot validity is carried by integer lengths, enforced with
masks inside attention.

INT8 mode stores codes plus a per-(token, kv-head) f32 scale, halving the
HBM bytes decode attention must stream — decode is bandwidth-bound, so this
is a direct throughput win (BASELINE.json config 3).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gabby_tpu.config import ModelConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """k, v: [L, B, Nk, S, H] (bf16/f32, or int8 codes when quantized).
    k_scale, v_scale: [L, B, Nk, S] f32 when quantized, else None.

    Head-major layout: each (slot, kv head) owns a contiguous [S, H] plane,
    which is exactly what the Pallas decode kernel streams HBM->VMEM per
    grid step (and what Mosaic's block-shape rules want); sequence-major
    [S, Nk, H] would force either relayouts per step or illegal blocks."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    def nbytes(self) -> int:
        n = self.k.nbytes + self.v.nbytes
        if self.quantized:
            n += self.k_scale.nbytes + self.v_scale.nbytes
        return n


def create_cache(cfg: ModelConfig, batch: int, max_seq: int,
                 dtype=jnp.bfloat16, quantized: bool = False,
                 paired: bool = False) -> KVCache:
    """paired=True stores adjacent kv-head PAIRS interleaved on the lane
    axis — k/v become [L, B, Nk/2, S, 2H] (scales stay per-head
    [L, B, Nk, S]). Decode GQA leaves the MXU at ~G/128 x H/128
    utilization (G=4 query rows, H=64-deep contraction on the 1B); the
    paired layout lets the flash kernel run block-diagonal [2G, 2H] dots —
    128-deep contraction, half the MXU passes — with zero relayout cost
    anywhere (writers pair by free reshape, heads being adjacent in
    memory). Consumers detect pairing by shape: k.shape[-1] == 2*head_dim."""
    if paired:
        assert cfg.num_kv_heads % 2 == 0, "pairing needs an even kv-head count"
        shape = (cfg.num_layers, batch, cfg.num_kv_heads // 2, max_seq,
                 2 * cfg.head_dim)
    else:
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_seq,
                 cfg.head_dim)
    sshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_seq)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32),
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   k_scale=None, v_scale=None)


def cache_is_paired(cache, cfg) -> bool:
    """True when `cache` (dense KVCache or PagedKVCache) stores
    lane-interleaved kv-head PAIRS (created with paired=True). Lane width
    is the single source of truth — use this instead of inlining the
    shape test at call sites."""
    return cache.k.shape[-1] == 2 * cfg.head_dim


def pair_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[..., Nk, T, H] -> [..., Nk/2, T, 2H]: interleave adjacent head
    pairs on the lane axis (the paired-cache storage transform). For T == 1
    rows this is layout-free; T > 1 (prefill chunks, verify blocks) pays
    one small transpose of the chunk, never of the cache."""
    *lead, nk, t, h = x.shape
    x = x.reshape(*lead, nk // 2, 2, t, h)
    x = jnp.moveaxis(x, -3, -2)  # [..., Nk/2, T, 2, H]
    return x.reshape(*lead, nk // 2, t, 2 * h)


def unpair_heads(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pair_heads: [..., Nk/2, T, 2H] -> [..., Nk, T, H]."""
    *lead, np_, t, h2 = x.shape
    x = x.reshape(*lead, np_, t, 2, h2 // 2)
    x = jnp.moveaxis(x, -2, -3)  # [..., Nk/2, 2, T, H]
    return x.reshape(*lead, np_ * 2, t, h2 // 2)


# ---- per-layer helpers (used inside the layer scan; arrays lack the L dim) --

def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, Nk, H] -> (int8 codes, f32 scales [B, T, Nk])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                     -127, 127).astype(jnp.int8)
    return codes, scale


def dequantize_kv(codes: jnp.ndarray, scale: jnp.ndarray,
                  dtype=jnp.bfloat16) -> jnp.ndarray:
    return (codes.astype(jnp.float32) * scale[..., None]).astype(dtype)
