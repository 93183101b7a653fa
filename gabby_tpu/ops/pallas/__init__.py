"""Pallas TPU kernels for the serving hot path.

Decode is HBM-bandwidth-bound: every step streams the full weight set plus
the KV cache through the chip. These kernels exist to touch the MINIMUM
number of HBM bytes — int8/int4 weights are contracted as codes (scales
applied to the f32 accumulator), and the quantized KV cache feeds attention
directly (no dequantized [B, S, Nk, H] ever materializes in HBM, which the
jnp reference path does per layer per step).

The jnp implementations in gabby_tpu/ops/{attention,quant}.py are the
semantics contracts; tests compare kernels against them in interpret mode
on CPU (SURVEY.md §4) and the integration is a swap behind `kernels_enabled`.

Enablement: auto on TPU backends, off elsewhere; override with
GABBY_KERNELS=1/0 or set_kernels(True/False). Kernels fall back to jnp for
shapes that don't tile (tiny test models).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_FORCED: Optional[bool] = None
_env = os.environ.get("GABBY_KERNELS")
if _env is not None:
    _FORCED = _env not in ("0", "false", "off")


def kernels_enabled() -> bool:
    if _FORCED is not None:
        return _FORCED
    return jax.default_backend() == "tpu"


def set_kernels(enabled: Optional[bool]) -> None:
    """True/False force; None restores auto (TPU only)."""
    global _FORCED
    _FORCED = enabled


def interpret_mode() -> bool:
    """Run kernels through the Pallas interpreter off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def vmem_limit_bytes() -> Optional[int]:
    """Explicit Mosaic scoped-VMEM limit for our kernels (CompilerParams
    .vmem_limit_bytes). The toolchain default floats around 16 MB and has
    been observed to TIGHTEN across terminal restarts ("Scoped allocation
    24.26M, limit 16.00M" on a previously-compiling program) — which is
    what forced the 4 MB weight-tile budget (56.0% SOL measured) to stay
    opt-in behind probe_big_tiles. v5e has 128 MB of physical VMEM; an
    explicit 64 MB limit (2.5x the big-tile budget's ~25 MB request) pins
    the ceiling so the big-tile compile stops depending on ambient
    toolchain state. GABBY_VMEM_LIMIT_MB overrides; 0 restores the
    toolchain default."""
    mb = int(os.environ.get("GABBY_VMEM_LIMIT_MB", "64"))
    return mb * 1024 * 1024 if mb > 0 else None


def w4a8() -> bool:
    """W4A8 mode: INT4 weights with INT8-quantized activations, so the
    fused matmul kernel's dots run on the MXU's 2x-rate s8 path. Changes
    numerics (per-token activation quantization) — opt-in, quality-gated
    by the ppl harness. GABBY_W4A8=1 (read at trace time)."""
    return os.environ.get("GABBY_W4A8") == "1"


def int4_prefill_kernel() -> bool:
    """Whether the INT4 fused matmul kernel also takes PREFILL-sized M
    (large-tile_m variant, layer sliced out + the 2-D kernel). Default
    OFF: on this v5e toolchain large-tile_m pallas_calls are UNSTABLE —
    the identical compiled call swings between ~10 ms and 40+ s across
    processes (the scalar-prefetch stacked form is reliably pathological
    at seconds per call) — so the measured-good XLA amortized-unpack path
    stays the prefill default. GABBY_QMM_PREFILL=1 opts in to re-measure
    on other toolchains/hardware."""
    return os.environ.get("GABBY_QMM_PREFILL", "0") == "1"


def int8_matmul_kernel() -> bool:
    """Whether the fused matmul kernel also takes INT8 (not just INT4).
    Default off: XLA's int8 dequant matmul measured faster in the
    XLA-attention configuration; flip with GABBY_QMM_INT8=1 to re-measure
    as the surrounding op mix changes."""
    return os.environ.get("GABBY_QMM_INT8") == "1"
