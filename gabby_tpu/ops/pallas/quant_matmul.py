"""Fused dequant + matmul Pallas kernels (INT8 / INT4 weight-only).

x [M, K] (bf16/f32) @ QTensor([K, N], int8 codes or int4 packed) -> [M, N].

Why a kernel at all: XLA will happily fuse `codes.astype(bf16) * scale` into
a matmul, but for int4 it first materializes the UNPACKED int8 weight in HBM
(the stack+reshape in ops/quant.unpack_int4 is not fusable into the dot),
doubling the bytes decode must stream. Here the packed bytes go straight
from HBM to VMEM and nibbles are expanded in-register.

INT4 layout note: bytes pack HALF-SPLIT row pairs (row j lo, row j+K/2
hi; see ops/quant.pack_int4) so the two nibble planes' activation slabs
are CONTIGUOUS halves x[:, :K/2] / x[:, K/2:] — plain slices, no
de-interleave copies (the old adjacent-row pairing's [M, K/2, 2]
reshape measured ~82 us/step of layout-hostile copies in the compiled
decode loop). Each packed tile contributes
dot(x_even_tile, lo) + dot(x_odd_tile, hi).

Accumulation is always f32 on the MXU; the per-output-channel scale hits
the accumulator once, on the last K step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabby_tpu.ops import pallas as pk

import os

# Tile budgets, switchable at runtime (set_tile_budget / probe_big_tiles):
#   big: aggressive 4 MB weight tiles — measured 1.655 ms/step / 56.0% SOL
#        on the 1B bench (vs 1.919 / 48.3% with the round-1 tiling, same
#        session) — but the compile is at the mercy of the terminal's
#        scoped-VMEM limit: after a terminal restart the identical program
#        OOM'd at compile ("Scoped allocation 24.26M, limit 16.00M").
#        probe_big_tiles() compile-tests it on the live toolchain and
#        falls back to "mid" when the limit is tight.
#   mid (default): after the half-split repack removed the activation
#        copies, the stacked matmuls still ran ~1.57x their DMA floor on
#        per-grid-step overhead (~960 weight tiles per decode step at
#        512-wide tile_n). Wide tile_n under the PROVEN-SAFE 2 MB block
#        budget (the round-1 tiling already shipped 2 MB w_down blocks
#        through every terminal restart) cuts the step count ~4x at the
#        same bytes — most of "big"'s win without its compile risk.
#   0:   the round-1 narrow tiling, kept for A/B.
# (tile_n candidates, weight-tile byte budget, VMEM working-set cap).
# The working-set cap bounds the BLOCK memory (double-buffered weight +
# slabs + output + accumulator); Mosaic's scoped transients (the bf16
# nibble planes, ~4x the packed tile) ride above it, under the explicit
# vmem_limit_bytes ceiling (ops/pallas.vmem_limit_bytes, 64 MB).
_BUDGETS = {
    "huge": ((4096, 2048, 1024, 512, 256, 128), 8 * 1024 * 1024,
             20 * 1024 * 1024),
    "big": ((2048, 1024, 512, 256, 128), 4 * 1024 * 1024,
            9 * 1024 * 1024),
    "mid": ((2048, 1024, 512, 256, 128), 2 * 1024 * 1024,
            9 * 1024 * 1024),
    "0": ((512, 256, 128), 2 * 1024 * 1024, 9 * 1024 * 1024),
}
_TILES = os.environ.get("GABBY_QMM_BIGTILES", "mid")
if _TILES == "1":
    _TILES = "big"
if _TILES not in _BUDGETS:
    _TILES = "mid"
TILE_N_CANDIDATES, TILE_BYTES, WS_CAP = _BUDGETS[_TILES]
TILE_K_CANDIDATES = (8192, 4096, 2048, 1024, 512, 256, 128, 64, 32)


def _cparams(**kw) -> pltpu.CompilerParams:
    """CompilerParams for the quant-matmul kernels: always carries the
    explicit scoped-VMEM limit (pk.vmem_limit_bytes) so the big-tile
    budget's ~25 MB scoped request compiles regardless of the ambient
    toolchain default (observed tightening to 16 MB across terminal
    restarts; see _BUDGETS['big'])."""
    return pltpu.CompilerParams(vmem_limit_bytes=pk.vmem_limit_bytes(),
                                **kw)


def tile_budget() -> str:
    return _TILES


def set_tile_budget(mode: str) -> None:
    """Switch the weight-tile budget ("big"/"mid"/"0"). Must run BEFORE
    the serving programs trace — tile sizes are chosen at trace time and
    jit does not retrace on a module-global flip."""
    global _TILES, TILE_N_CANDIDATES, TILE_BYTES, WS_CAP
    _TILES = mode if mode in _BUDGETS else "mid"
    TILE_N_CANDIDATES, TILE_BYTES, WS_CAP = _BUDGETS[_TILES]


def probe_big_tiles(shapes) -> bool:
    """Compile-test the 4 MB "big" tile budget against the live
    toolchain's scoped-VMEM limit and adopt it if it holds.

    shapes: iterable of GLOBAL (k, n) int4 matmul shapes the serving
    programs will hit (the model's distinct weight shapes). For each, a
    single-layer stacked int4 kernel is lowered AND compiled on the
    default backend; any compile failure (Mosaic "Scoped allocation ...
    limit ..." under a tight terminal) restores the proven "mid" budget.

    No-ops (returns current==big) when the operator pinned the budget via
    GABBY_QMM_BIGTILES, when kernels are off, or off-TPU (interpret mode
    has no scoped-VMEM limit to probe — nothing to learn). Probe compiles
    land in the persistent compilation cache, so a successful probe is
    ~free on later cold starts. Call before tracing serving programs
    (see set_tile_budget)."""
    if os.environ.get("GABBY_QMM_BIGTILES") is not None:
        return _TILES == "big"
    if not pk.kernels_enabled() or pk.interpret_mode():
        return False
    prev = _TILES
    set_tile_budget("big")
    try:
        # probe at the decode-sized Ms the serving programs actually hit:
        # tile selection depends on tile_m (the VMEM search trades
        # activation slabs against weight tiles), so m=8 (plain decode,
        # tile_m 16 — picks the LARGEST weight tiles and their bf16
        # nibble-plane transients, the config that OOMs a 16 MB scoped
        # limit) and m=64 (the verify/burst cap) must BOTH compile
        for k, n in shapes:
            if k % 2:
                continue
            kp = k // 2
            codes = jnp.zeros((1, kp, n), jnp.int8)
            scale = jnp.ones((1, n), jnp.float32)
            for m in (8, 64):
                if not supported(m, k, n, 4):
                    continue
                x = jnp.zeros((m, k), jnp.bfloat16)
                jax.jit(functools.partial(qmatmul_stacked, bits=4)).lower(
                    x, codes, scale, jnp.int32(0)).compile()
        return True
    except Exception as e:  # Mosaic/XLA compile error: budget too rich
        set_tile_budget(prev)
        import sys
        print(f"gabby_tpu: big-tile probe failed ({type(e).__name__}); "
              f"keeping the {prev!r} tile budget", file=sys.stderr)
        return False


def _pick(total: int, candidates) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    return 0


def _pick_tiles(k: int, n: int, tile_m: int, bits: int) -> tuple[int, int]:
    """(tile_k, tile_n) hitting ~TILE_BYTES of weight per step while the
    whole working set (double-buffered weight + activation slabs + output
    + accumulator) fits VMEM. k is the PACKED contraction dim for int4.
    Searches smaller tile_n when the first choice can't fit next to a
    large tile_m (the prefill shapes). Returns (0, 0) when nothing fits —
    the caller falls back to XLA."""
    xfac = 2 if bits == 4 else 1  # int4 feeds two activation slabs

    def vmem(c, tile_n):
        return (2 * c * tile_n                  # weight, double-buffered
                + 2 * xfac * tile_m * c * 2     # x slabs (bf16)
                + 2 * tile_n * 4                # scale row (f32)
                + 2 * tile_m * tile_n * 2       # output, double-buffered
                + tile_m * tile_n * 4)          # f32 accumulator

    if os.environ.get("GABBY_QMM_KMAJOR") == "1" and tile_m <= 256:
        # K-MAJOR tiles (experiment, `ab_decode kmajor`): tile_n = n makes
        # every weight block a run of FULL consecutive rows of the
        # row-major [kp, n] codes — one contiguous HBM stream per tile
        # instead of n-strided 2 KB column-panel runs — with the existing
        # k grid accumulating into the f32 scratch. Hypothesis from the
        # r5 profile: the XLA int8 unembed (contiguous stream) runs at
        # ~1.0x its DMA floor while every tiled kernel sits at 1.4-1.7x;
        # if the residual is strided-read inefficiency this recovers it,
        # if it is the VPU unpack this is neutral. c halves until the
        # working set fits and the k grid keeps >= 2 steps (Mosaic
        # double-buffers across grid steps; a 1-step grid cannot overlap
        # DMA with compute).
        c = min(TILE_BYTES // n, k) // 128 * 128
        while c >= 128:
            if (k % c == 0 and vmem(c, n) <= WS_CAP and k // c >= 2):
                return c, n
            c -= 128
        # nothing fit with a >= 2-step k grid: fall through to the
        # standard column-panel search
    if tile_m > 256:
        # Prefill-sized tiles take the WHOLE contraction per step (k-grid
        # of 1): with any k-grid > 1 the x slab's block index changes
        # between consecutive steps, so Pallas re-streams the activations
        # once per (j, k) — measured 16 s per 8x512 prefill when the VMEM
        # search settled on 32-wide k tiles. With k whole, the x slab is
        # fetched once per M-row and the (small, packed) weights re-stream
        # n_i times — noise against prefill's MXU time.
        for tile_n in TILE_N_CANDIDATES:
            if n % tile_n:
                continue
            if vmem(k, tile_n) <= 9 * 1024 * 1024:
                return k, tile_n
        return 0, 0
    for tile_n in TILE_N_CANDIDATES:
        if n % tile_n:
            continue
        for c in TILE_K_CANDIDATES:
            if k % c or c * tile_n > TILE_BYTES:
                continue
            if c % 128 and c != k:
                # Mosaic: a block's LAST dim must divide 128 or equal the
                # array dim (the x slab's lane axis is tile_k)
                continue
            if vmem(c, tile_n) <= WS_CAP:
                return c, tile_n
    return 0, 0


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile_m(m: int) -> int:
    """Decode-sized M keeps the small sublane-aligned tile; prefill-sized
    M takes the LARGEST tile the VMEM search can seat. Big tile_m is what
    makes the int4 kernel viable at prefill: the per-tile nibble unpack
    (VPU) amortizes against a [tile_m, K]x[K, N] dot's MXU time — at
    tile_m 256 the unpack was ~half the step (XLA's amortized-unpack path
    won); at tile_m >= 1024 it is noise, and the kernel keeps XLA's
    HBM-materialized unpacked weights out of the picture entirely."""
    if m <= 256:
        return min(_round_up(m, 16), 256)
    return 512  # whole-K blocks cap the x slab; see _pick_tiles


def _int8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


def _int4_kernel(xe_ref, xo_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Cheap nibble unpack enabled by the biased packing
    # (ops/quant.pack_int4): a byte read as signed int8 is exactly
    # 16*hi + (lo+8), so
    #     hi  = b >> 4   (arithmetic shift sign-extends the high nibble)
    #     lo8 = b & 15   (biased low nibble, in [1, 15])
    # — ONE shift + ONE mask after the i32 widen (Mosaic has no sub-i32
    # vector shifts), vs the round-1 kernel's four shifts for two
    # sign-extensions. The +8 bias is constant per element, so its
    # contribution contracts to a rank-1 correction on the accumulator:
    # acc -= 8 * rowsum(x_even), a [tile_m] vector — ~3% of the unpack
    # cost. (The kernel was VPU-bound on the unpack, not DMA-bound; v5e
    # has no bf16 ALU, so a float-side unpack is no cheaper.)
    p = w_ref[:].astype(jnp.int32)
    hi = jnp.right_shift(p, 4).astype(jnp.bfloat16)
    lo8 = (p & 15).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(xe_ref[:], lo8,
                          preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xo_ref[:], hi,
                          preferred_element_type=jnp.float32)
    rowsum = jnp.sum(xe_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[:] -= 8.0 * rowsum

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmatmul_int8(x2d, codes, scale, *, interpret=False):
    m, k = x2d.shape
    _, n = codes.shape
    tile_m = _pick_tile_m(m)
    tile_k, tile_n = _pick_tiles(k, n, tile_m, 8)
    mp = _round_up(m, tile_m)
    xp = jnp.pad(x2d, ((0, mp - m), (0, 0))) if mp != m else x2d

    out = pl.pallas_call(
        _int8_kernel,
        grid=(mp // tile_m, n // tile_n, k // tile_k),
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * 2 + k * n + mp * n * 2 + n * 4,
            transcendentals=0),
        interpret=interpret,
        compiler_params=_cparams(),
    )(xp.astype(jnp.bfloat16), codes, scale.reshape(1, n))
    return out[:m] if mp != m else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmatmul_int4(x2d, packed, scale, *, interpret=False):
    m, k = x2d.shape
    kp, n = packed.shape  # kp == k // 2
    tile_m = _pick_tile_m(m)
    tile_kp, tile_n = _pick_tiles(kp, n, tile_m, 4)
    mp = _round_up(m, tile_m)
    xp = jnp.pad(x2d, ((0, mp - m), (0, 0))) if mp != m else x2d
    # half-split pairing (quant.pack_int4): the nibble planes' activation
    # slabs are CONTIGUOUS halves — no de-interleave copy
    xb = xp.astype(jnp.bfloat16)
    x_even = xb[:, :kp]  # pairs with low nibbles (rows [0, k/2))
    x_odd = xb[:, kp:]   # pairs with high nibbles (rows [k/2, k))

    out = pl.pallas_call(
        _int4_kernel,
        grid=(mp // tile_m, n // tile_n, kp // tile_kp),
        in_specs=[
            pl.BlockSpec((tile_m, tile_kp), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_kp), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_kp, tile_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * 2 + kp * n + mp * n * 2 + n * 4,
            transcendentals=0),
        interpret=interpret,
        compiler_params=_cparams(),
    )(x_even, x_odd, packed, scale.reshape(1, n))
    return out[:m] if mp != m else out


def _stacked_call(kernel, n_x: int, x_args, packed, scale, layer, *,
                  tiles, grid_mn, mp, n, out_dtype, cost, interpret):
    """pallas_call plumbing for STACKED [L, kp, n] weights with the layer
    index scalar-prefetched into the block index maps — the weight tile
    DMAs straight from the stacked array, with NO per-layer dynamic-slice
    copy. (Profiling showed that copy costing as much as the matmul
    itself: the layer scan's xs-streaming materializes each layer's
    weights before an opaque pallas_call can read them, so the weights
    streamed HBM twice per step.)"""
    tile_m, tile_k, tile_n = tiles
    gi, gj = grid_mn
    kp = packed.shape[1]

    in_specs = [pl.BlockSpec((tile_m, tile_k),
                             lambda i, j, kk, sc: (i, kk),
                             memory_space=pltpu.VMEM)] * n_x
    in_specs += [
        pl.BlockSpec((1, tile_k, tile_n),
                     lambda i, j, kk, sc: (sc[0], kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile_n), lambda i, j, kk, sc: (sc[0], 0, j),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gi, gj, kp // tile_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n),
                               lambda i, j, kk, sc: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
    )
    import os
    cparams = _cparams()
    if os.environ.get("GABBY_QMM_DSEM") == "1":
        # experiment knob: declare the m/n grid dims parallel so Mosaic
        # may reorder/pipeline across them (VERDICT r3 experiment list)
        cparams = _cparams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        cost_estimate=cost, interpret=interpret,
        compiler_params=cparams,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *x_args, packed,
      scale.reshape(scale.shape[0], 1, n))


def _int8_stacked_kernel(sc_ref, x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[0].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


def _int4_stacked_kernel(sc_ref, xe_ref, xo_ref, w_ref, s_ref, o_ref,
                         acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # same unpack as _int4_kernel (see there for the bias algebra)
    p = w_ref[0].astype(jnp.int32)
    hi = jnp.right_shift(p, 4).astype(jnp.bfloat16)
    lo8 = (p & 15).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(xe_ref[:], lo8,
                          preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xo_ref[:], hi,
                          preferred_element_type=jnp.float32)
    rowsum = jnp.sum(xe_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[:] -= 8.0 * rowsum

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


# (An i16-register-width variant of the two-plane unpack was built and
# measured in round 3 but REMOVED: Mosaic cannot legalize arith.shrsi on
# i16 vectors on this toolchain — the kernel fails to compile on a real
# TPU even though it passes in interpret mode. See BASELINE.md round-3
# unpack A/Bs.)


def _int4_stacked_rawdot_kernel(sc_ref, xo16_ref, xc_ref, w_ref, s_ref,
                                o_ref, acc_ref):
    """Raw-byte-dot int4 unpack (GABBY_INT4_RAWDOT=1, docs/NEXT.md item 1):
    the HI nibble plane is never materialized. With the biased packing a
    byte read as signed i8 is exactly b = 16*hi + lo8, so with the two
    activation slabs prepared OUTSIDE the kernel (tiny [M, K/2]
    elementwise ops, fused by XLA; both EXACT except one bf16 rounding
    of xc):

        xo16 := x_odd / 16          (power-of-two scale: exact)
        xc   := x_even - xo16       (one bf16 rounding, |xc| ~ |x|)

        dot(xo16, b) + dot(xc, lo8)
          = dot(x_odd, hi) + dot(x_odd, lo8)/16
            + dot(x_even, lo8) - dot(x_odd, lo8)/16
          = dot(x_odd, hi) + dot(x_even, lo8)

    — the wanted sum at ONE unpacked plane (widen+mask+convert for lo8;
    b itself converts i8->bf16 directly) instead of two (+ the shift).
    Same MXU work, ~40% less VPU unpack per weight byte. The +8 bias in
    lo8 contracts against rowsum(x_even) = rowsum(xc) + rowsum(xo16)
    exactly as in the two-plane kernel. Numerics: dividing (not
    multiplying) by 16 keeps xc at |x| scale, so its single rounding is
    the same order as the existing bf16 rounding of x itself; verified
    against the two-plane kernel in tests and NLL-gated like every
    quant path."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = w_ref[0]
    lo8 = (b.astype(jnp.int32) & 15).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(xo16_ref[:], b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xc_ref[:], lo8,
                          preferred_element_type=jnp.float32)
    rowsum = (jnp.sum(xc_ref[:].astype(jnp.float32), axis=1, keepdims=True)
              + jnp.sum(xo16_ref[:].astype(jnp.float32), axis=1,
                        keepdims=True))
    acc_ref[:] -= 8.0 * rowsum

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmatmul_int8_stacked(x2d, packed, scale, layer, *, interpret=False):
    m, k = x2d.shape
    _, _, n = packed.shape
    tile_m = _pick_tile_m(m)
    tile_k, tile_n = _pick_tiles(k, n, tile_m, 8)
    mp = _round_up(m, tile_m)
    xp = jnp.pad(x2d, ((0, mp - m), (0, 0))) if mp != m else x2d
    out = _stacked_call(
        _int8_stacked_kernel, 1, [xp.astype(jnp.bfloat16)], packed, scale,
        layer, tiles=(tile_m, tile_k, tile_n),
        grid_mn=(mp // tile_m, n // tile_n), mp=mp, n=n, out_dtype=x2d.dtype,
        cost=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * 2 + k * n + mp * n * 2 + n * 4,
            transcendentals=0),
        interpret=interpret)
    return out[:m] if mp != m else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmatmul_int4_stacked(x2d, packed, scale, layer, *, interpret=False):
    import os
    m, k = x2d.shape
    _, kp, n = packed.shape  # kp == k // 2
    tile_m = _pick_tile_m(m)
    tile_kp, tile_n = _pick_tiles(kp, n, tile_m, 4)
    mp = _round_up(m, tile_m)
    xp = jnp.pad(x2d, ((0, mp - m), (0, 0))) if mp != m else x2d
    # half-split pairing: contiguous activation halves, no de-interleave
    # copy (the r4b profile measured the old [mp, kp, 2] reshape at
    # ~82 us/step of layout-hostile copies across the four matmuls)
    xb = xp.astype(jnp.bfloat16)
    x_even, x_odd = xb[:, :kp], xb[:, kp:]
    if os.environ.get("GABBY_INT4_RAWDOT") == "1":
        # env read at trace time (same jit-cache hazard/pattern as
        # GABBY_QMM_DSEM: flip only with clear_cache or a fresh process)
        xo16 = x_odd * jnp.bfloat16(0.0625)  # power-of-two scale: exact
        xc = (x_even.astype(jnp.float32)
              - xo16.astype(jnp.float32)).astype(jnp.bfloat16)
        kernel, slabs = _int4_stacked_rawdot_kernel, [xo16, xc]
    else:
        kernel, slabs = _int4_stacked_kernel, [x_even, x_odd]
    out = _stacked_call(
        kernel, 2, slabs, packed, scale,
        layer, tiles=(tile_m, tile_kp, tile_n),
        grid_mn=(mp // tile_m, n // tile_n), mp=mp, n=n, out_dtype=x2d.dtype,
        cost=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * 2 + kp * n + mp * n * 2 + n * 4,
            transcendentals=0),
        interpret=interpret)
    return out[:m] if mp != m else out


def qmatmul_stacked(x: jnp.ndarray, codes: jnp.ndarray, scale: jnp.ndarray,
                    layer, bits: int) -> jnp.ndarray:
    """x: [..., K] @ stacked quantized [L, K(, packed), N] at `layer`
    (traced) -> [..., N]. The layer index is scalar-prefetched into the
    weight tile index map: no per-layer slice copy."""
    *lead, k_in = x.shape
    n = codes.shape[2]
    x2d = x.reshape(-1, k_in)
    interp = pk.interpret_mode()
    if bits == 8:
        out = _qmatmul_int8_stacked(x2d, codes, scale, layer,
                                    interpret=interp)
    else:
        out = _qmatmul_int4_stacked(x2d, codes, scale, layer,
                                    interpret=interp)
    return out.reshape(*lead, n)


def supported(m: int, k: int, n: int, bits: int) -> bool:
    """Does this problem tile onto the kernel grid within VMEM?"""
    kk = k // 2 if bits == 4 else k
    tile_m = _pick_tile_m(max(m, 1))
    tile_k, tile_n = _pick_tiles(kk, n, tile_m, bits)
    return tile_k != 0 and tile_n != 0


def qmatmul(x: jnp.ndarray, codes: jnp.ndarray, scale: jnp.ndarray,
            bits: int) -> jnp.ndarray:
    """x: [..., K] @ quantized [K, N] -> [..., N] in x.dtype."""
    *lead, k_in = x.shape
    n = codes.shape[1]
    x2d = x.reshape(-1, k_in)
    interp = pk.interpret_mode()
    if bits == 8:
        out = _qmatmul_int8(x2d, codes, scale, interpret=interp)
    else:
        out = _qmatmul_int4(x2d, codes, scale, interpret=interp)
    return out.reshape(*lead, n)


# ---- Grouped-scale INT4 (the unembed table) ------------------------------
#
# The [D, V] unembed stream is the single largest weight read of a decode
# step (263 MB at INT8 on Llama-3.2-1B = 29% of all decode bytes). INT4
# halves it, but per-vocab-channel scales measurably hurt logit quality —
# GPTQ-style GROUP scales along the contraction axis (g=256) recover it
# (gated by tests/test_ppl.py::test_int4_unembed_nll_delta). The scale now
# varies along K, so it cannot fold into one post-dot rescale; this kernel
# takes the whole (small: D/2 rows) packed K per grid step and contracts
# per group with ONE batched dot over the group axis (small per-group dots
# pay MXU issue/drain latency — the round-2 flash-attention lesson).

GROUPED_TILE_N = (4096, 2048, 1024, 768, 512, 384, 256, 128)


def _grouped_tile_n(kp: int, n: int, tile_m: int, gh: int, g: int) -> int:
    # working-set cap follows the active tile budget (WS_CAP): the wider
    # 4096 tile only seats under the "huge" budget's 20 MB cap (and the
    # explicit Mosaic vmem_limit_bytes ceiling covers its transients)
    for tile_n in GROUPED_TILE_N:
        if n % tile_n:
            continue
        vmem = (2 * kp * tile_n                    # weight, double-buffered
                + 2 * 2 * gh * tile_m * g * 2      # xe+xo slabs (bf16)
                + 2 * 2 * gh * tile_n * 4          # scale tiles
                + 2 * tile_m * gh * 4              # rowsums
                + 2 * tile_m * tile_n * 2          # output
                + gh * tile_m * tile_n * 4)        # batched-dot transient
        if vmem <= WS_CAP:
            return tile_n
    return 0


def grouped_supported(m: int, k: int, n: int, group: int) -> bool:
    # half-split pairing needs whole groups per nibble plane: group | k/2
    if group % 2 or k % group or (k // 2) % group or m > 256:
        return False
    kp = k // 2
    tile_m = min(_round_up(max(m, 1), 16), 256)
    return _grouped_tile_n(kp, n, tile_m, kp // group, group) != 0


def _int4_grouped_kernel(xe_ref, xo_ref, rs_ref, w_ref, sl_ref, sh_ref,
                         o_ref):
    # half-split pairing: the lo plane covers original rows [0, k/2) =
    # scale groups [0, gh), the hi plane rows [k/2, k) = groups [gh, 2gh).
    # The two scale halves arrive as SEPARATE refs (an in-kernel s[gh:]
    # slice hit a Mosaic gather-lowering bug on this toolchain).
    gh, _, g = xe_ref.shape
    tn = o_ref.shape[1]
    # same biased-nibble algebra as _int4_kernel
    p = w_ref[:].astype(jnp.int32)
    hi = jnp.right_shift(p, 4).astype(jnp.bfloat16).reshape(gh, g, tn)
    lo8 = (p & 15).astype(jnp.bfloat16).reshape(gh, g, tn)
    dims = (((2,), (1,)), ((0,), (0,)))  # contract g, batch over groups
    d_lo = jax.lax.dot_general(xe_ref[:], lo8, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)
    d_hi = jax.lax.dot_general(xo_ref[:], hi, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)
    s_lo = sl_ref[:]  # [gh, tn]
    s_hi = sh_ref[:]
    out = jnp.sum(d_lo * s_lo[:, None, :], axis=0)
    out += jnp.sum(d_hi * s_hi[:, None, :], axis=0)
    # the +8 bias rides the LO nibbles only: rank-1 per lo group
    out -= 8.0 * jax.lax.dot_general(
        rs_ref[:], s_lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _qmatmul_int4_grouped(x2d, packed, scale, group, *, interpret=False):
    m, k = x2d.shape
    kp, n = packed.shape  # kp == k // 2
    gh = kp // group      # whole scale groups per nibble plane
    tile_m = min(_round_up(m, 16), 256)
    tile_n = _grouped_tile_n(kp, n, tile_m, gh, group)
    mp = _round_up(m, tile_m)
    xp = jnp.pad(x2d, ((0, mp - m), (0, 0))) if mp != m else x2d
    xb = xp.astype(jnp.bfloat16)
    xe = xb[:, :kp].reshape(mp, gh, group)  # contiguous half-split slabs
    xo = xb[:, kp:].reshape(mp, gh, group)
    rs = jnp.sum(xe.astype(jnp.float32), axis=2)  # [mp, gh]
    xe = xe.transpose(1, 0, 2)  # [gh, mp, group] — kernel batch axis
    xo = xo.transpose(1, 0, 2)

    out = pl.pallas_call(
        _int4_grouped_kernel,
        grid=(mp // tile_m, n // tile_n),
        in_specs=[
            pl.BlockSpec((gh, tile_m, group), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, tile_m, group), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, gh), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * 4 + kp * n + mp * n * 2
            + 2 * gh * n * 4,
            transcendentals=0),
        interpret=interpret,
        compiler_params=_cparams(),
    )(xe, xo, rs, packed, scale[:gh], scale[gh:])
    return out[:m] if mp != m else out


def qmatmul_grouped(x: jnp.ndarray, codes: jnp.ndarray, scale: jnp.ndarray,
                    group: int) -> jnp.ndarray:
    """x: [..., K] @ int4-packed [K//2, N] with group-wise scales
    [K//group, N] -> [..., N] in x.dtype. Requires group | K/2 (half-split
    pairing: each nibble plane must hold whole scale groups) — callers
    gate on grouped_supported."""
    *lead, k_in = x.shape
    if (k_in // 2) % group:
        raise ValueError(
            f"qmatmul_grouped: group={group} must divide K/2={k_in // 2} "
            f"(half-split int4 pairing); use the qlinear fallback")
    n = codes.shape[1]
    out = _qmatmul_int4_grouped(x.reshape(-1, k_in), codes, scale, group,
                                interpret=pk.interpret_mode())
    return out.reshape(*lead, n)


# ---- W4A8: INT4 weights x INT8 activations on the MXU's s8 path ----------

def _int4_w4a8_stacked_kernel(sc_ref, xe_ref, xo_ref, w_ref, s_ref, xs_ref,
                              o_ref, acc_ref):
    """Same nibble algebra as _int4_stacked_kernel, but the activations
    arrive pre-quantized to int8 (per-row scales in xs_ref) and both dots
    run int8 x int8 -> int32 — the MXU's 2x-rate mode. The -8 bias folds
    into an integer rank-1 correction; scales (per-row activation x
    per-column weight) hit the accumulator once at the end."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = w_ref[0].astype(jnp.int32)
    hi = jnp.right_shift(p, 4).astype(jnp.int8)
    lo8 = (p & 15).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:], lo8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[:] += jax.lax.dot_general(
        xo_ref[:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    rowsum = jnp.sum(xe_ref[:].astype(jnp.int32), axis=1, keepdims=True)
    acc_ref[:] -= 8 * rowsum

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * xs_ref[:]
                    * s_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmatmul_int4_w4a8_stacked(x2d, packed, scale, layer, *,
                               interpret=False):
    m, k = x2d.shape
    _, kp, n = packed.shape
    tile_m = _pick_tile_m(m)
    tile_kp, tile_n = _pick_tiles(kp, n, tile_m, 4)
    mp = _round_up(m, tile_m)
    xp = jnp.pad(x2d, ((0, mp - m), (0, 0))) if mp != m else x2d
    # per-row symmetric int8 activation quantization (fused by XLA into
    # whatever produced x)
    absmax = jnp.max(jnp.abs(xp.astype(jnp.float32)), axis=1, keepdims=True)
    xs = jnp.maximum(absmax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xp.astype(jnp.float32) / xs),
                  -127, 127).astype(jnp.int8)
    x_even, x_odd = xq[:, :kp], xq[:, kp:]  # half-split pairing

    in_specs = [
        pl.BlockSpec((tile_m, tile_kp), lambda i, j, kk, sc: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, tile_kp), lambda i, j, kk, sc: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_kp, tile_n),
                     lambda i, j, kk, sc: (sc[0], kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile_n), lambda i, j, kk, sc: (sc[0], 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 1), lambda i, j, kk, sc: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // tile_m, n // tile_n, kp // tile_kp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n),
                               lambda i, j, kk, sc: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.int32)],
    )
    out = pl.pallas_call(
        _int4_w4a8_stacked_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + kp * n + mp * n * 2 + n * 4,
            transcendentals=0),
        interpret=interpret,
        compiler_params=_cparams(),
    )(jnp.asarray(layer, jnp.int32).reshape(1), x_even, x_odd, packed,
      scale.reshape(scale.shape[0], 1, n), xs.astype(jnp.float32))
    return out[:m] if mp != m else out


def qmatmul_stacked_w4a8(x, codes, scale, layer):
    """W4A8 variant of qmatmul_stacked (int4 codes only)."""
    *lead, k_in = x.shape
    n = codes.shape[2]
    out = _qmatmul_int4_w4a8_stacked(x.reshape(-1, k_in), codes, scale,
                                     layer, interpret=pk.interpret_mode())
    return out.reshape(*lead, n)
