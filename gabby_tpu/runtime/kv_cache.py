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
                 dtype=jnp.bfloat16, quantized: bool = False) -> KVCache:
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_seq, cfg.head_dim)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   k_scale=None, v_scale=None)


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
