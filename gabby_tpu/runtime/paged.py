"""Paged KV cache: fixed-size pages + per-slot page tables.

The dense cache (kv_cache.py) reserves max_seq rows per slot; paging
allocates PAGE_SIZE-row pages on demand from a shared pool, so

  * capacity scales with TOKENS IN USE, not slots x max_seq — more
    concurrent slots fit in the same HBM when sequences are short, and
  * prefix sharing is ZERO-COPY: slots with a common prompt prefix point
    their page tables at the same physical pages (refcounted; safe
    because pages below a slot's prompt length are never written again).

TPU-shaped: the pool is page-major [P, L, Nk, page, H], so each
(layer, page) plane [Nk, page, H] is contiguous — exactly the block
decode attention DMAs per grid step; the physical page index rides into
the kernel through scalar prefetch next to the layer index
(ops/pallas/attention.py), so nothing ever gathers the pool into a
dense view on the hot path. Chunked PREFILL (per-admission, not
per-step) does gather prior pages to a contiguous view and reuses the
dense prefill attention — a one-time cost comparable to the rows it must
read anyway.

The allocator lives host-side in the Engine (multi-host safe: allocation
decisions are deterministic functions of plan-driven slot state). The
device only ever sees the pool plus an [B, max_pages] int32 page table.

Reference (dhconnelly/gabby) has no KV cache at all (generator stub,
/root/reference/src/inference/generator.cc:33-38); design follows the
paged-attention pattern adapted to XLA static shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from gabby_tpu.config import ModelConfig

# rows per page. 512 measured ~13% decode cost over the dense cache on the
# v5e 1B bench point vs ~33% at 256 (per-page grid overhead dominates the
# smaller DMA) — matches EngineConfig.page_size's default.
PAGE_SIZE = 512


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """k, v: [P, L, Nk, page, H] pools (int8 codes when quantized).
    k_scale, v_scale: [P, L, Nk, page] f32 when quantized, else None.
    page_table: [B, max_pages] i32 — physical page of each slot's logical
    page (entries past a slot's allocation are stale/garbage)."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]
    page_table: jnp.ndarray

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def num_pages(self) -> int:
        return self.k.shape[0]

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.page_table.shape[0]

    @property
    def max_seq(self) -> int:
        return self.page_table.shape[1] * self.page_size

    def nbytes(self) -> int:
        n = self.k.nbytes + self.v.nbytes + self.page_table.nbytes
        if self.quantized:
            n += self.k_scale.nbytes + self.v_scale.nbytes
        return n


def create_paged_cache(cfg: ModelConfig, batch: int, max_seq: int,
                       num_pages: int, dtype=jnp.bfloat16,
                       quantized: bool = False,
                       page_size: int = PAGE_SIZE,
                       paired: bool = False) -> PagedKVCache:
    """paired=True stores adjacent kv-head PAIRS lane-interleaved, exactly
    like the dense cache's paired layout (kv_cache.create_cache): pools
    become [P, L, Nk/2, page, 2H] while scales stay per-head
    [P, L, Nk, page]. The paged flash kernel then runs the same
    block-diagonal 128-deep dots — half the MXU passes — as dense paired
    decode. Consumers detect pairing by shape (lane == 2*head_dim)."""
    assert max_seq % page_size == 0
    max_pages = max_seq // page_size
    if paired:
        assert cfg.num_kv_heads % 2 == 0, "pairing needs an even kv-head count"
        shape = (num_pages, cfg.num_layers, cfg.num_kv_heads // 2,
                 page_size, 2 * cfg.head_dim)
    else:
        shape = (num_pages, cfg.num_layers, cfg.num_kv_heads, page_size,
                 cfg.head_dim)
    pt = jnp.zeros((batch, max_pages), jnp.int32)
    sshape = (num_pages, cfg.num_layers, cfg.num_kv_heads, page_size)
    if quantized:
        return PagedKVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32), page_table=pt)
    return PagedKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                        k_scale=None, v_scale=None, page_table=pt)


class PageAllocator:
    """Host-side page bookkeeping: free list + per-page refcounts.

    Deterministic (free pages hand out in sorted order), so multi-host
    controllers replaying the same admission plans evolve identical
    allocator state without communication."""

    def __init__(self, num_pages: int):
        self.free: list[int] = list(range(num_pages - 1, -1, -1))
        self.refs = [0] * num_pages

    def available(self) -> int:
        return len(self.free)

    def alloc(self, n: int) -> Optional[list[int]]:
        """n fresh pages (refcount 1 each), or None if the pool is short."""
        if n > len(self.free):
            return None
        out = [self.free.pop() for _ in range(n)]
        for p in out:
            self.refs[p] = 1
        return out

    def share(self, pages: list[int]) -> list[int]:
        """Bump refcounts for pages adopted by another slot (prefix share)."""
        for p in pages:
            assert self.refs[p] > 0, f"sharing dead page {p}"
            self.refs[p] += 1
        return list(pages)

    def release(self, pages: list[int]) -> None:
        for p in pages:
            self.refs[p] -= 1
            assert self.refs[p] >= 0, f"double free of page {p}"
            if self.refs[p] == 0:
                self.free.append(p)
        self.free.sort(reverse=True)  # deterministic reuse order


# ---- device ops -----------------------------------------------------------


def gather_slot_rows(cache: PagedKVCache, slot: jnp.ndarray, rows: int):
    """Contiguous [L, Nk, rows, H] (+ scales) view of one slot's first
    `rows` cache rows (rows must be a multiple of page_size; static).
    Used by chunked prefill — a per-admission gather, never per-step."""
    ps = cache.page_size
    n = rows // ps
    phys = jax.lax.dynamic_slice(cache.page_table,
                                 (slot, jnp.int32(0)), (1, n))[0]  # [n]

    def take(pool):
        # pool [P, L, Nk, page, H] -> [n, L, Nk, page, H] -> [L, Nk, n*page, H]
        g = jnp.take(pool, phys, axis=0)
        g = jnp.moveaxis(g, 0, 2)  # [L, Nk, n, page, ...]
        return g.reshape(g.shape[0], g.shape[1], n * ps, *g.shape[4:])

    k = take(cache.k)
    v = take(cache.v)
    if cache.quantized:
        return k, v, take(cache.k_scale), take(cache.v_scale)
    return k, v, None, None


def write_batch_chunk(cache: PagedKVCache, offset: int, k_new, v_new,
                      ks_new, vs_new, lane_mask: jnp.ndarray
                      ) -> PagedKVCache:
    """Lane-masked batched chunk write (burst admissions): k/v_new are
    [L, B, Nk, T, H] chunk rows for ALL slots at row `offset` (static,
    page-aligned; T a multiple of page_size). Masked-OUT lanes' writes are
    routed to the scratch page (physical 0, never read), so live slots'
    decode state is untouched — the paged analogue of the dense path's
    jnp.where lane masking."""
    ps = cache.page_size
    t = k_new.shape[3]
    assert offset % ps == 0 and t % ps == 0, (offset, t)
    b = cache.batch
    kp, vp, ksp, vsp = cache.k, cache.v, cache.k_scale, cache.v_scale
    zero = jnp.int32(0)
    for i in range(b):
        for j in range(t // ps):
            lp = offset // ps + j
            phys = jnp.where(lane_mask[i], cache.page_table[i, lp], 0)

            def put(pool, newv):
                upd = newv[:, i, :, j * ps:(j + 1) * ps][None]
                start = (phys,) + (zero,) * (pool.ndim - 1)
                return jax.lax.dynamic_update_slice(pool, upd, start)

            kp = put(kp, k_new)
            vp = put(vp, v_new)
            if cache.quantized:
                ksp = put(ksp, ks_new)
                vsp = put(vsp, vs_new)
    return dataclasses.replace(cache, k=kp, v=vp, k_scale=ksp, v_scale=vsp)


def write_slot_chunk(cache: PagedKVCache, slot: jnp.ndarray,
                     offset: jnp.ndarray, k_new, v_new, ks_new, vs_new
                     ) -> PagedKVCache:
    """Write a [L, Nk, T, H] chunk for one slot at row `offset` (offset and
    T page-aligned; T static). One dynamic-update-slice per spanned page."""
    ps = cache.page_size
    t = k_new.shape[2]
    assert t % ps == 0, f"chunk length {t} not page-aligned"
    kp, vp, ksp, vsp = cache.k, cache.v, cache.k_scale, cache.v_scale
    for i in range(t // ps):
        lp = offset // ps + i
        phys = cache.page_table[slot, lp]

        def put(pool, newv):
            upd = newv[None, :, :, i * ps:(i + 1) * ps]
            start = (phys,) + (jnp.int32(0),) * (pool.ndim - 1)
            return jax.lax.dynamic_update_slice(pool, upd, start)

        kp = put(kp, k_new)
        vp = put(vp, v_new)
        if cache.quantized:
            ksp = put(ksp, ks_new)
            vsp = put(vsp, vs_new)
    return dataclasses.replace(cache, k=kp, v=vp, k_scale=ksp, v_scale=vsp)
