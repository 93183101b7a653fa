"""Rotary position embeddings (rotate-half convention, HF weight-compatible)
with Llama-3 wavelength-dependent frequency scaling.

sin/cos are computed inline from integer positions rather than gathered from a
precomputed table: on TPU the transcendentals are VPU-cheap and XLA fuses them
into the surrounding QK projection, while a table gather is an HBM round-trip.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gabby_tpu.config import RopeScaling


def rope_inv_freq(head_dim: int, theta: float,
                  scaling: Optional[RopeScaling]) -> np.ndarray:
    """Per-frequency inverse wavelengths, f32, shape [head_dim // 2].

    Applies the "llama3" rope_type rescaling: long wavelengths (low
    frequencies) are stretched by `factor`, short ones kept, with a smooth
    ramp in between (see the rope_scaling block of Llama-3.2's config.json).
    """
    exponents = np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    inv_freq = 1.0 / (theta ** exponents)
    if scaling is not None:
        low_wavelen = scaling.original_max_position_embeddings / scaling.low_freq_factor
        high_wavelen = scaling.original_max_position_embeddings / scaling.high_freq_factor
        wavelen = 2.0 * math.pi / inv_freq
        # smooth factor in [0, 1]: 1 => keep, 0 => divide by factor
        smooth = (scaling.original_max_position_embeddings / wavelen
                  - scaling.low_freq_factor) / (
                      scaling.high_freq_factor - scaling.low_freq_factor)
        smooth = np.clip(smooth, 0.0, 1.0)
        scaled = (1.0 - smooth) * inv_freq / scaling.factor + smooth * inv_freq
        inv_freq = np.where(wavelen > low_wavelen, inv_freq / scaling.factor,
                            np.where(wavelen < high_wavelen, inv_freq, scaled))
    return inv_freq.astype(np.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray,
               inv_freq: np.ndarray) -> jnp.ndarray:
    """Rotate x: [B, T, heads, head_dim] by positions: [B, T] (int32)."""
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [B, T, hd]
    cos = jnp.cos(emb)[:, :, None, :]
    sin = jnp.sin(emb)[:, :, None, :]
    out = x.astype(jnp.float32) * cos + _rotate_half(x.astype(jnp.float32)) * sin
    return out.astype(x.dtype)
