"""Pallas kernel correctness vs the jnp reference ops.

Kernels run in interpret mode on the CPU backend (SURVEY.md §4): identical
kernel code, bit-compatible semantics, no TPU required. Every case checks
the kernel against the plain-jnp contract implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gabby_tpu.ops import attention as attn_ref
from gabby_tpu.ops import pallas as pk
from gabby_tpu.ops import quant
from gabby_tpu.ops.pallas import attention as pattn
from gabby_tpu.ops.pallas import quant_matmul as pqm
from gabby_tpu.runtime.kv_cache import quantize_kv


@pytest.fixture(autouse=True)
def _no_auto_dispatch():
    """Reference paths must stay jnp while we compare against kernels."""
    pk.set_kernels(False)
    yield
    pk.set_kernels(None)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


# ---- fused dequant matmul ----

@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("m,k,n", [(8, 128, 256), (3, 256, 128),
                                   (33, 64, 256)])
def test_qmatmul_matches_qlinear(bits, m, k, n):
    w = _rand(0, k, n) * 0.3
    qt = quant.quantize(w, bits)
    x = _rand(1, m, k).astype(jnp.bfloat16)

    ref = quant.qlinear(x, qt)                      # jnp contract
    out = pqm.qmatmul(x, qt.q, qt.scale, bits)      # kernel
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_qmatmul_leading_dims():
    w = _rand(0, 128, 128) * 0.3
    qt = quant.quantize(w, 8)
    x = _rand(1, 2, 5, 128).astype(jnp.bfloat16)
    out = pqm.qmatmul(x, qt.q, qt.scale, 8)
    ref = quant.qlinear(x, qt)
    assert out.shape == (2, 5, 128)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("m,k,n,g", [(8, 256, 256, 64), (5, 512, 384, 128),
                                     (16, 512, 128, 256)])
def test_qmatmul_grouped_matches_qlinear(m, k, n, g):
    """Grouped-scale int4 kernel (the unembed path) vs the jnp per-group
    batched-dot contract in quant.qlinear."""
    w = _rand(0, k, n) * 0.3
    qt = quant.quantize(w, 4, group=g)
    assert qt.scale.shape == (k // g, n)
    x = _rand(1, m, k).astype(jnp.bfloat16)
    ref = quant.qlinear(x, qt)                              # jnp contract
    out = pqm.qmatmul_grouped(x, qt.q, qt.scale, g)         # kernel
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_grouped_quantize_beats_per_channel_on_outliers():
    """The motivation for group scales: a weight whose columns mix large
    and small rows loses most of its grid to one outlier under
    per-channel scaling; per-group scales isolate it."""
    k, n, g = 512, 128, 64
    w = np.asarray(_rand(3, k, n)) * 0.1
    w[:8, :] *= 50.0  # outlier rows blow up the per-column absmax
    w = jnp.asarray(w)
    err_pc = np.abs(np.asarray(quant.dequantize(quant.quantize(w, 4))
                               - w, np.float32)).mean()
    err_g = np.abs(np.asarray(quant.dequantize(quant.quantize(w, 4, group=g))
                              - w, np.float32)).mean()
    assert err_g < err_pc / 3


def test_grouped_supported_gates():
    # Llama-3.2-1B unembed: K=2048, V=128256 (= 768 * 167) tiles
    assert pqm.grouped_supported(8, 2048, 128256, 256)
    assert not pqm.grouped_supported(8, 2048, 128300, 256)  # N doesn't tile
    assert not pqm.grouped_supported(8, 2000, 128256, 256)  # K % group
    assert not pqm.grouped_supported(512, 2048, 128256, 256)  # prefill M


def test_supported_gates_odd_shapes():
    assert pqm.supported(8, 128, 256, 8)
    assert not pqm.supported(8, 100, 256, 8)   # K doesn't tile
    assert not pqm.supported(8, 128, 100, 8)   # N doesn't tile
    assert pqm.supported(8, 64, 128, 4)        # K/2 = 32 tiles
    assert pqm.supported(8, 8192, 512, 4)
    # prefill-sized M requires WHOLE-K blocks (any k-grid > 1 re-streams
    # the x slab per (j, k) — measured seconds per call); K=8192 doesn't
    # fit VMEM next to tile_m 512, so this shape falls back to XLA
    assert not pqm.supported(4096, 8192, 512, 4)
    # ...while the Llama-1B projection K (2048) does fit whole
    assert pqm.supported(4096, 2048, 512, 4)


# ---- decode attention ----

@pytest.mark.parametrize("s", [64, 128])
@pytest.mark.parametrize("nq,nk,h", [(8, 4, 64), (4, 4, 32), (8, 2, 128)])
def test_decode_attention_bf16(s, nq, nk, h):
    b = 4
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    k = (_rand(1, b, nk, s, h) * 0.5).astype(jnp.bfloat16)   # head-major
    v = (_rand(2, b, nk, s, h) * 0.5).astype(jnp.bfloat16)
    positions = jnp.asarray([0, 5, s // 2, s - 1], jnp.int32)

    ref = attn_ref.cache_attention(q, k, v, positions)
    out = pattn.decode_attention(q, k, v, positions)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_decode_attention_int8_kv():
    b, s, nq, nk, h = 3, 96, 8, 4, 64
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    k = _rand(1, b, nk, s, h) * 0.5   # head-major cache layout
    v = _rand(2, b, nk, s, h) * 0.5
    k_codes, k_scale = quantize_kv(k)
    v_codes, v_scale = quantize_kv(v)
    positions = jnp.asarray([3, s // 3, s - 1], jnp.int32)

    ref = attn_ref.cache_attention_quantized(
        q, k_codes, v_codes, k_scale, v_scale, positions)
    out = pattn.decode_attention(q, k_codes, v_codes, positions,
                                 k_scale, v_scale)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_attention_fresh_row(quantized):
    """Fresh-row contract: cache read j < pos, current token's k/v separate
    — must match the jnp reference with the same contract."""
    b, s, nq, nk, h = 3, 96, 8, 4, 64
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kf_full = _rand(1, b, nk, s, h) * 0.5
    vf_full = _rand(2, b, nk, s, h) * 0.5
    fresh_k = (_rand(3, b, nk, h) * 0.5).astype(jnp.bfloat16)
    fresh_v = (_rand(4, b, nk, h) * 0.5).astype(jnp.bfloat16)
    positions = jnp.asarray([0, s // 3, s - 1], jnp.int32)
    if quantized:
        kc, ks = quantize_kv(kf_full)
        vc, vs = quantize_kv(vf_full)
        ref = attn_ref.cache_attention_quantized(
            q, kc, vc, ks, vs, positions, fresh_k=fresh_k, fresh_v=fresh_v)
        out = pattn.decode_attention(q, kc, vc, positions, ks, vs,
                                     fresh_k=fresh_k, fresh_v=fresh_v)
    else:
        kc = kf_full.astype(jnp.bfloat16)
        vc = vf_full.astype(jnp.bfloat16)
        ref = attn_ref.cache_attention(q, kc, vc, positions,
                                       fresh_k=fresh_k, fresh_v=fresh_v)
        out = pattn.decode_attention(q, kc, vc, positions,
                                     fresh_k=fresh_k, fresh_v=fresh_v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_decode_attention_position_zero_matches():
    """A fresh slot (position 0) must attend only to index 0."""
    b, s, nq, nk, h = 1, 32, 4, 2, 32
    q = _rand(0, b, 1, nq, h).astype(jnp.bfloat16)
    k = _rand(1, b, nk, s, h).astype(jnp.bfloat16)
    v = _rand(2, b, nk, s, h).astype(jnp.bfloat16)
    positions = jnp.zeros((b,), jnp.int32)
    out = pattn.decode_attention(q, k, v, positions)
    # attending to exactly one key makes the output that key's value
    expect = jnp.repeat(v[:, :, 0], nq // nk, axis=1).reshape(b, 1, nq, h)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(expect, np.float32),
                               rtol=3e-2, atol=3e-2)


# ---- end-to-end decode parity with kernels forced on (interpret) ----

def test_decode_step_with_kernels_enabled():
    from gabby_tpu import config as cfglib
    from gabby_tpu.models import llama
    from gabby_tpu.runtime.kv_cache import create_cache

    # dims chosen to clear kernel gates: K/N tile (128/256), GQA 8/4
    cfg = cfglib.tiny(num_heads=8, num_kv_heads=4, head_dim=64,
                      hidden_size=256, intermediate_size=256, vocab_size=256,
                      max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = quant.quantize_tree(params, 8)
    cache = create_cache(cfg, 2, 64, quantized=True)
    tokens = jnp.asarray([5, 9], jnp.int32)
    positions = jnp.asarray([3, 7], jnp.int32)

    logits_ref, _ = llama.decode_step(qparams, cfg, tokens, positions, cache)
    pk.set_kernels(True)  # interpret mode on CPU
    logits_k, _ = llama.decode_step(qparams, cfg, tokens, positions, cache)
    pk.set_kernels(False)
    np.testing.assert_allclose(np.asarray(logits_k), np.asarray(logits_ref),
                               rtol=5e-2, atol=5e-1)


# ---- flash prefill (slot chunked prefill) ----

@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("t,offset", [(16, 0), (8, 24), (32, 32)])
def test_prefill_attention_matches_reference(quantized, t, offset):
    from gabby_tpu.ops.pallas import prefill_attention as pfa

    b, nk, g, h, s = 3, 4, 2, 64, 64
    nq = nk * g
    slot = 1
    q = (_rand(0, 1, t, nq, h) * 0.5).astype(jnp.bfloat16)
    kc_f = _rand(1, b, nk, s, h) * 0.5
    vc_f = _rand(2, b, nk, s, h) * 0.5
    fk = (_rand(3, nk, t, h) * 0.5).astype(jnp.bfloat16)
    fv = (_rand(4, nk, t, h) * 0.5).astype(jnp.bfloat16)
    if quantized:
        kc, ks = quantize_kv(kc_f)
        vc, vs = quantize_kv(vc_f)
    else:
        kc, vc = kc_f.astype(jnp.bfloat16), vc_f.astype(jnp.bfloat16)
        ks = vs = None

    pk.set_kernels(False)  # jnp reference path
    ref = attn_ref.slot_prefill_attention(
        q, kc, vc, jnp.int32(slot), jnp.int32(offset), ks, vs,
        fresh_k=fk, fresh_v=fv)
    out = pfa.prefill_attention(q, kc, vc, jnp.int32(slot),
                                jnp.int32(offset), ks, vs,
                                fresh_k=fk, fresh_v=fv)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_prefill_slot_end_to_end_with_kernels():
    """prefill_slot with kernels on must give the same last-token logits as
    the jnp path (int8 KV; the serving admission path)."""
    from gabby_tpu import config as cfglib
    from gabby_tpu.models import llama
    from gabby_tpu.runtime.kv_cache import create_cache

    cfg = cfglib.tiny(num_heads=8, num_kv_heads=4, head_dim=64,
                      hidden_size=256, intermediate_size=256, vocab_size=256,
                      max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tokens = jnp.arange(16, dtype=jnp.int32)
    cache = create_cache(cfg, 2, 64, quantized=True)
    l_ref, _ = llama.prefill_slot(params, cfg, tokens, jnp.int32(16),
                                  jnp.int32(1), jnp.int32(0), cache)
    pk.set_kernels(True)
    cache = create_cache(cfg, 2, 64, quantized=True)
    l_k, _ = llama.prefill_slot(params, cfg, tokens, jnp.int32(16),
                                jnp.int32(1), jnp.int32(0), cache)
    pk.set_kernels(False)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                               rtol=5e-2, atol=5e-1)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("t", [2, 5])
def test_verify_attention_matches_reference(quantized, t):
    """The TQ>1 verify kernel (speculative decoding) must match the dense
    reference: cache rows j < pos for every query, plus the block itself
    causally at full precision."""
    L, b, nk, g, s, h = 3, 2, 2, 3, 64, 8
    nq = nk * g
    q = _rand(0, b, t, nq, h)
    kc = _rand(1, L, b, nk, s, h)
    vc = _rand(2, L, b, nk, s, h)
    fk = _rand(3, b, nk, t, h)
    fv = _rand(4, b, nk, t, h)
    positions = jnp.asarray([11, 37], jnp.int32)
    layer = jnp.int32(1)

    if quantized:
        kq, ks = quantize_kv(kc)
        vq, vs = quantize_kv(vc)
        got = pattn.verify_attention(q, kq, vq, positions, ks, vs,
                                     layer=layer, fresh_k=fk, fresh_v=fv)
        from gabby_tpu.runtime.kv_cache import dequantize_kv
        kd = dequantize_kv(kq[1], ks[1], q.dtype)
        vd = dequantize_kv(vq[1], vs[1], q.dtype)
    else:
        got = pattn.verify_attention(q, kc, vc, positions,
                                     layer=layer, fresh_k=fk, fresh_v=fv)
        kd, vd = kc[1], vc[1]

    # dense reference: concat cache rows + block, masked
    kk = jnp.concatenate([jnp.swapaxes(kd, 1, 2),
                          jnp.swapaxes(fk, 1, 2)], axis=1)  # [B, S+T, Nk, H]
    vv = jnp.concatenate([jnp.swapaxes(vd, 1, 2),
                          jnp.swapaxes(fv, 1, 2)], axis=1)
    cache_mask = jnp.broadcast_to(
        jnp.arange(s)[None, None, :] < positions[:, None, None], (b, t, s))
    self_mask = jnp.broadcast_to(
        jnp.arange(t)[None, :, None] >= jnp.arange(t)[None, None, :],
        (b, t, t))
    mask = jnp.concatenate([cache_mask, self_mask], axis=2)
    want = attn_ref._gqa_core(attn_ref._split_groups(q, nk), kk, vv, mask,
                              h ** -0.5)
    # the kernel's big operands ride the MXU in bf16 (like every other
    # attention kernel here); tolerances match the decode-attention tests
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_decode_attention_matches_reference(quantized):
    """The paged decode kernel (physical pages via scalar-prefetched page
    table) must match gathering the pages densely and running the plain
    decode reference."""
    L, b, nk, g, h = 3, 2, 2, 4, 16
    page, mp, npages = 16, 4, 10
    nq = nk * g
    s = page * mp
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kp = _rand(1, npages, L, nk, page, h) * 0.5
    vp = _rand(2, npages, L, nk, page, h) * 0.5
    fk = (_rand(3, b, nk, h) * 0.5).astype(jnp.bfloat16)
    fv = (_rand(4, b, nk, h) * 0.5).astype(jnp.bfloat16)
    pt = jnp.asarray([[3, 5, 1, 7], [2, 8, 9, 4]], jnp.int32)
    positions = jnp.asarray([19, 55], jnp.int32)
    layer = jnp.int32(2)

    def dense(pool):
        gth = jnp.take(pool[:, 2], pt, axis=0)        # [B, mp, nk, page, .]
        gth = jnp.moveaxis(gth, 1, 2)
        return gth.reshape(b, nk, s, *gth.shape[4:])

    if quantized:
        kq, ks = quantize_kv(kp)
        vq, vs = quantize_kv(vp)
        got = pattn.paged_decode_attention(q, kq, vq, pt, positions, ks, vs,
                                           layer=layer, fresh_k=fk,
                                           fresh_v=fv)
        ref = attn_ref.cache_attention_quantized(
            q, dense(kq), dense(vq), dense(ks), dense(vs), positions,
            fresh_k=fk, fresh_v=fv)
    else:
        kpb = kp.astype(jnp.bfloat16)
        vpb = vp.astype(jnp.bfloat16)
        got = pattn.paged_decode_attention(q, kpb, vpb, pt, positions,
                                           layer=layer, fresh_k=fk,
                                           fresh_v=fv)
        ref = attn_ref.cache_attention(q, dense(kpb), dense(vpb), positions,
                                       fresh_k=fk, fresh_v=fv)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_qmatmul_stacked_rawdot_matches_plain(monkeypatch):
    """GABBY_INT4_RAWDOT=1 (one-plane raw-byte-dot unpack, docs/NEXT.md
    round-4 item 1) must match the two-plane stacked int4 kernel and the
    dequantized reference within bf16 noise — the xc = x_odd - 16*x_even
    cancellation must be exact up to one bf16 rounding of xc."""
    L, k, n, m = 3, 256, 256, 8
    w = _rand(0, L * k, n).reshape(L, k, n) * 0.3
    qts = [quant.quantize(w[i], 4) for i in range(L)]
    codes = jnp.stack([t.q for t in qts])
    scales = jnp.stack([t.scale for t in qts])
    x = _rand(7, m, k).astype(jnp.bfloat16)
    layer = jnp.int32(1)

    plain = pqm.qmatmul_stacked(x, codes, scales, layer, 4)
    ref = x.astype(jnp.float32) @ quant.dequantize(
        qts[1], jnp.float32)
    monkeypatch.setenv("GABBY_INT4_RAWDOT", "1")
    # the env is read at trace time: drop the cached plain program
    pqm._qmatmul_int4_stacked.clear_cache()
    try:
        raw = pqm.qmatmul_stacked(x, codes, scales, layer, 4)
    finally:
        monkeypatch.delenv("GABBY_INT4_RAWDOT")
        pqm._qmatmul_int4_stacked.clear_cache()
    np.testing.assert_allclose(np.asarray(raw, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=4e-2, atol=4e-2)
    np.testing.assert_allclose(np.asarray(raw, np.float32),
                               np.asarray(plain, np.float32),
                               rtol=4e-2, atol=4e-2)


def test_qmatmul_stacked_kmajor_matches_plain(monkeypatch):
    """GABBY_QMM_KMAJOR=1 (full-N weight tiles, k-grid accumulation —
    contiguous HBM streaming per tile) must match the default column-panel
    tiling and the dequantized reference; also pins that the k-major
    search actually selects tile_n == n with >= 2 k-grid steps at the 1B
    decode shapes."""
    L, k, n, m = 3, 512, 256, 8
    w = _rand(0, L * k, n).reshape(L, k, n) * 0.3
    qts = [quant.quantize(w[i], 4) for i in range(L)]
    codes = jnp.stack([t.q for t in qts])
    scales = jnp.stack([t.scale for t in qts])
    x = _rand(7, m, k).astype(jnp.bfloat16)
    layer = jnp.int32(2)

    plain = pqm.qmatmul_stacked(x, codes, scales, layer, 4)
    ref = x.astype(jnp.float32) @ quant.dequantize(qts[2], jnp.float32)
    monkeypatch.setenv("GABBY_QMM_KMAJOR", "1")
    pqm._qmatmul_int4_stacked.clear_cache()
    try:
        # selection invariant at the 1B fused decode shapes
        for kk, nn in [(2048, 3072), (2048, 16384), (8192, 2048)]:
            tile_k, tile_n = pqm._pick_tiles(kk // 2, nn, 16, 4)
            assert tile_n == nn, (kk, nn, tile_k, tile_n)
            assert (kk // 2) % tile_k == 0 and (kk // 2) // tile_k >= 2
        kmaj = pqm.qmatmul_stacked(x, codes, scales, layer, 4)
    finally:
        monkeypatch.delenv("GABBY_QMM_KMAJOR")
        pqm._qmatmul_int4_stacked.clear_cache()
    np.testing.assert_allclose(np.asarray(kmaj, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=4e-2, atol=4e-2)
    np.testing.assert_allclose(np.asarray(kmaj, np.float32),
                               np.asarray(plain, np.float32),
                               rtol=4e-2, atol=4e-2)


def test_w4a8_stacked_matches_integer_reference():
    """W4A8: int8-activation x int4-weight integer dot must match the exact
    integer-arithmetic reference (bit-exact accumulation in interpret
    mode), scaled per-row x per-column."""
    L, k, n = 3, 128, 256
    w = _rand(0, L * k, n).reshape(L, k, n) * 0.3
    qts = [quant.quantize(w[i], 4) for i in range(L)]
    codes = jnp.stack([t.q for t in qts])
    scales = jnp.stack([t.scale for t in qts])
    x = _rand(1, 8, k) * 2.0
    layer = jnp.int32(1)

    got = pqm.qmatmul_stacked_w4a8(x, codes, scales, layer)

    # reference: same per-row int8 quantization, integer matmul, rescale
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    xs = jnp.maximum(absmax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int32)
    wfull = quant.unpack_int4(codes[1]).astype(jnp.int32)
    acc = xq @ wfull
    want = acc.astype(jnp.float32) * xs * scales[1][None, :]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_attention_window_clamp_matches(quantized):
    """Static `window` (VERDICT r2 weak #4): with every position below the
    window, the clamped-grid kernel must match both the unclamped kernel
    and the jnp reference — the 8k-provisioned, 512-live case prices like
    512 without changing a single output."""
    b, s, nq, nk, h = 2, 2048, 4, 2, 32  # 2 chunks of 1024
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kf = _rand(1, b, nk, s, h) * 0.5
    vf = _rand(2, b, nk, s, h) * 0.5
    fresh_k = (_rand(3, b, nk, h) * 0.5).astype(jnp.bfloat16)
    fresh_v = (_rand(4, b, nk, h) * 0.5).astype(jnp.bfloat16)
    positions = jnp.asarray([17, 1000], jnp.int32)  # all < window=1024
    if quantized:
        kc, ks = quantize_kv(kf)
        vc, vs = quantize_kv(vf)
        ref = attn_ref.cache_attention_quantized(
            q, kc, vc, ks, vs, positions, fresh_k=fresh_k, fresh_v=fresh_v)
        full = pattn.decode_attention(q, kc, vc, positions, ks, vs,
                                      fresh_k=fresh_k, fresh_v=fresh_v)
        win = pattn.decode_attention(q, kc, vc, positions, ks, vs,
                                     fresh_k=fresh_k, fresh_v=fresh_v,
                                     window=1024)
    else:
        kc, vc = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
        ref = attn_ref.cache_attention(q, kc, vc, positions,
                                       fresh_k=fresh_k, fresh_v=fresh_v)
        full = pattn.decode_attention(q, kc, vc, positions,
                                      fresh_k=fresh_k, fresh_v=fresh_v)
        win = pattn.decode_attention(q, kc, vc, positions,
                                     fresh_k=fresh_k, fresh_v=fresh_v,
                                     window=1024)
    np.testing.assert_allclose(np.asarray(win, np.float32),
                               np.asarray(full, np.float32),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(win, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_decode_loop_window_and_parked_lanes_match_full():
    """decode_loop with an engine-style window bucket and a PARKED inactive
    lane must emit exactly what the unwindowed loop emits for live lanes."""
    from gabby_tpu import config as cfglib
    from gabby_tpu.models import llama
    from gabby_tpu.runtime import generate
    from gabby_tpu.runtime.kv_cache import create_cache

    pk.set_kernels(True)  # interpret mode on CPU
    cfg = cfglib.tiny(num_heads=4, num_kv_heads=2, head_dim=32,
                      hidden_size=64, max_seq_len=2048)
    params = llama.init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    b = 2
    prompt = jax.random.randint(jax.random.PRNGKey(6), (b, 48), 2, 200,
                                jnp.int32)

    def run(window):
        cache = create_cache(cfg, b, 2048, dtype=jnp.float32, quantized=True)
        logits, cache = llama.prefill(params, cfg, prompt, cache)
        tokens = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        positions = jnp.asarray([48, 2047], jnp.int32)  # lane 1 parked
        active = jnp.asarray([True, False])
        sstate = generate.SamplingState.greedy(b)
        out, _, _, _, _, _, _, _, _, _, _ = generate.decode_loop(
            params, cfg, tokens, positions, active, cache, sstate, 4,
            window=window)
        return np.asarray(out[:, 0])  # live lane's stream

    np.testing.assert_array_equal(run(1024), run(None))


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("b", [4, 8])
def test_decode_attention_slot_batched_matches(quantized, b):
    """The slot-batched kernel (SB slots per grid step) must match the
    per-slot kernel and the jnp reference bit-for-bit in semantics —
    mixed per-slot positions, including 0 and the window edge."""
    s, nq, nk, h = 256, 8, 4, 64
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kf = _rand(1, b, nk, s, h) * 0.5
    vf = _rand(2, b, nk, s, h) * 0.5
    fresh_k = (_rand(3, b, nk, h) * 0.5).astype(jnp.bfloat16)
    fresh_v = (_rand(4, b, nk, h) * 0.5).astype(jnp.bfloat16)
    positions = jnp.asarray(([0, 7, s // 2, s - 1] * 2)[:b], jnp.int32)
    if quantized:
        kc, ks = quantize_kv(kf)
        vc, vs = quantize_kv(vf)
        ref = attn_ref.cache_attention_quantized(
            q, kc, vc, ks, vs, positions, fresh_k=fresh_k, fresh_v=fresh_v)
        out = pattn.decode_attention(q, kc, vc, positions, ks, vs,
                                     fresh_k=fresh_k, fresh_v=fresh_v)
    else:
        kc, vc = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
        ref = attn_ref.cache_attention(q, kc, vc, positions,
                                       fresh_k=fresh_k, fresh_v=fresh_v)
        out = pattn.decode_attention(q, kc, vc, positions,
                                     fresh_k=fresh_k, fresh_v=fresh_v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_decode_attention_slot_batched_window(monkeypatch):
    """Slot-batched kernel honoring the static window bucket."""
    b, s, nq, nk, h = 4, 2048, 4, 2, 32
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kf = _rand(1, b, nk, s, h) * 0.5
    vf = _rand(2, b, nk, s, h) * 0.5
    fresh_k = (_rand(3, b, nk, h) * 0.5).astype(jnp.bfloat16)
    fresh_v = (_rand(4, b, nk, h) * 0.5).astype(jnp.bfloat16)
    kc, ks = quantize_kv(kf)
    vc, vs = quantize_kv(vf)
    positions = jnp.asarray([3, 500, 900, 1000], jnp.int32)
    full = pattn.decode_attention(q, kc, vc, positions, ks, vs,
                                  fresh_k=fresh_k, fresh_v=fresh_v)
    win = pattn.decode_attention(q, kc, vc, positions, ks, vs,
                                 fresh_k=fresh_k, fresh_v=fresh_v,
                                 window=1024)
    np.testing.assert_allclose(np.asarray(win, np.float32),
                               np.asarray(full, np.float32),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_verify_attention_matches_reference(quantized):
    """Paged flash VERIFY (speculative decoding on the paged pool): T
    candidate queries against pool rows j < pos plus the block itself
    causally — must match the densified reference."""
    L, b, nk, g, h, t = 3, 2, 2, 4, 16, 3
    page, mp, npages = 16, 4, 10
    nq = nk * g
    s = page * mp
    q = (_rand(0, b, t, nq, h) * 0.5).astype(jnp.bfloat16)
    kp = _rand(1, npages, L, nk, page, h) * 0.5
    vp = _rand(2, npages, L, nk, page, h) * 0.5
    fk = (_rand(3, b, nk, t, h) * 0.5).astype(jnp.bfloat16)
    fv = (_rand(4, b, nk, t, h) * 0.5).astype(jnp.bfloat16)
    pt = jnp.asarray([[3, 5, 1, 7], [2, 8, 9, 4]], jnp.int32)
    positions = jnp.asarray([19, 55], jnp.int32)
    layer = jnp.int32(1)

    def dense(pool):
        gth = jnp.take(pool[:, 1], pt, axis=0)
        gth = jnp.moveaxis(gth, 1, 2)
        return gth.reshape(b, nk, s, *gth.shape[4:])

    def ref_verify(kk, vv):
        # [B, S, Nk, H] cache + T-block self-attention, causal
        from gabby_tpu.ops.attention import _gqa_core, _split_groups
        kk = jnp.swapaxes(kk.astype(jnp.float32), 1, 2)
        vv = jnp.swapaxes(vv.astype(jnp.float32), 1, 2)
        kf = jnp.swapaxes(fk.astype(jnp.float32), 1, 2)  # [B, T, Nk, H]
        vf = jnp.swapaxes(fv.astype(jnp.float32), 1, 2)
        kk = jnp.concatenate([kk, kf], axis=1)
        vv = jnp.concatenate([vv, vf], axis=1)
        cache_mask = jnp.broadcast_to(
            jnp.arange(s)[None, None, :] < positions[:, None, None],
            (b, t, s))
        self_mask = jnp.broadcast_to(
            jnp.arange(t)[None, :, None] >= jnp.arange(t)[None, None, :],
            (b, t, t))
        mask = jnp.concatenate([cache_mask, self_mask], axis=2)
        return _gqa_core(_split_groups(q.astype(jnp.float32), nk), kk, vv,
                         mask, h ** -0.5)

    if quantized:
        kq, ks = quantize_kv(kp)
        vq, vs = quantize_kv(vp)
        got = pattn.paged_verify_attention(q, kq, vq, pt, positions, ks,
                                           vs, layer=layer, fresh_k=fk,
                                           fresh_v=fv)
        from gabby_tpu.runtime.kv_cache import dequantize_kv
        ref = ref_verify(dequantize_kv(dense(kq), dense(ks), jnp.float32),
                         dequantize_kv(dense(vq), dense(vs), jnp.float32))
    else:
        got = pattn.paged_verify_attention(q, kp.astype(jnp.bfloat16),
                                           vp.astype(jnp.bfloat16), pt,
                                           positions, layer=layer,
                                           fresh_k=fk, fresh_v=fv)
        ref = ref_verify(dense(kp), dense(vp))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("m", [320, 700])
def test_qmatmul_int4_prefill_sized_m(m):
    """Large-M (prefill) int4 kernel path: big tile_m with padding must
    still match the jnp contract."""
    k, n = 128, 256
    w = _rand(0, k, n) * 0.3
    qt = quant.quantize(w, 4)
    x = _rand(1, m, k).astype(jnp.bfloat16)
    ref = quant.qlinear(x, qt)
    out = pqm.qmatmul(x, qt.q, qt.scale, 4)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_decode_attention_s8_dots_close_to_reference(monkeypatch):
    """s8-dot decode attention (quantized cache): activations quantize
    per row, codes feed the MXU raw — output must stay close to the f32
    reference (the added error is the same order as the INT8 KV
    quantization itself; exactness is NLL-gated in test_ppl)."""
    monkeypatch.setenv("GABBY_ATTN_S8", "1")
    b, s, nq, nk, h = 3, 96, 8, 4, 64
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kf = _rand(1, b, nk, s, h) * 0.5
    vf = _rand(2, b, nk, s, h) * 0.5
    fresh_k = (_rand(3, b, nk, h) * 0.5).astype(jnp.bfloat16)
    fresh_v = (_rand(4, b, nk, h) * 0.5).astype(jnp.bfloat16)
    positions = jnp.asarray([0, s // 3, s - 1], jnp.int32)
    kc, ks = quantize_kv(kf)
    vc, vs = quantize_kv(vf)
    ref = attn_ref.cache_attention_quantized(
        q, kc, vc, ks, vs, positions, fresh_k=fresh_k, fresh_v=fresh_v)
    out = pattn.decode_attention(q, kc, vc, positions, ks, vs,
                                 fresh_k=fresh_k, fresh_v=fresh_v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=6e-2, atol=6e-2)


def test_decode_attention_small_chunk_matches(monkeypatch):
    """GABBY_ATTN_CHUNK (trace-time) shrinks the grid chunk so the
    kernel walks SEVERAL chunks incl. clamped trailing ones; numerics
    must match the reference at positions straddling chunk boundaries.
    (Unique shapes: the env is read at trace time, so a shape collision
    with another test would reuse its cached default-chunk program.)"""
    monkeypatch.setenv("GABBY_ATTN_CHUNK", "64")
    b, s, nq, nk, h = 3, 320, 10, 5, 64
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kf = _rand(1, b, nk, s, h) * 0.5
    vf = _rand(2, b, nk, s, h) * 0.5
    positions = jnp.asarray([0, 63, 257], jnp.int32)

    ref = attn_ref.cache_attention(
        q, kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16), positions)
    out = pattn.decode_attention(q, kf.astype(jnp.bfloat16),
                                 vf.astype(jnp.bfloat16), positions)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)

    kc, ks = quantize_kv(kf)
    vc, vs = quantize_kv(vf)
    ref_q = attn_ref.cache_attention_quantized(q, kc, vc, ks, vs, positions)
    out_q = pattn.decode_attention(q, kc, vc, positions, ks, vs)
    np.testing.assert_allclose(np.asarray(out_q, np.float32),
                               np.asarray(ref_q, np.float32),
                               rtol=3e-2, atol=3e-2)


# ---- paired kv-head layout (kv_cache.create_cache(paired=True)) ----

def _pair_cache(x):
    """[B, Nk, S, H] head-major plane -> paired [B, Nk/2, S, 2H]."""
    from gabby_tpu.runtime.kv_cache import pair_heads
    return pair_heads(x)


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_attention_paired_matches_unpaired(quantized):
    """The paired layout's block-diagonal kernel must reproduce the
    unpaired fresh-row decode contract exactly (same math, half the MXU
    passes on hardware)."""
    b, s, nq, nk, h = 3, 96, 8, 4, 64
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kf_full = _rand(1, b, nk, s, h) * 0.5
    vf_full = _rand(2, b, nk, s, h) * 0.5
    fresh_k = (_rand(3, b, nk, h) * 0.5).astype(jnp.bfloat16)
    fresh_v = (_rand(4, b, nk, h) * 0.5).astype(jnp.bfloat16)
    positions = jnp.asarray([0, s // 3, s - 1], jnp.int32)
    if quantized:
        kc, ks = quantize_kv(kf_full)
        vc, vs = quantize_kv(vf_full)
        ref = attn_ref.cache_attention_quantized(
            q, kc, vc, ks, vs, positions, fresh_k=fresh_k, fresh_v=fresh_v)
        out = pattn.decode_attention(q, _pair_cache(kc), _pair_cache(vc),
                                     positions, ks, vs,
                                     fresh_k=fresh_k, fresh_v=fresh_v)
    else:
        kc = kf_full.astype(jnp.bfloat16)
        vc = vf_full.astype(jnp.bfloat16)
        ref = attn_ref.cache_attention(q, kc, vc, positions,
                                       fresh_k=fresh_k, fresh_v=fresh_v)
        out = pattn.decode_attention(q, _pair_cache(kc), _pair_cache(vc),
                                     positions,
                                     fresh_k=fresh_k, fresh_v=fresh_v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_decode_attention_paired_s8_off(monkeypatch):
    """Paired + bf16 dots (GABBY_ATTN_S8=0) on a quantized cache."""
    monkeypatch.setenv("GABBY_ATTN_S8", "0")
    b, s, nq, nk, h = 2, 130, 8, 4, 64
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kc, ks = quantize_kv(_rand(1, b, nk, s, h) * 0.5)
    vc, vs = quantize_kv(_rand(2, b, nk, s, h) * 0.5)
    fresh_k = (_rand(3, b, nk, h) * 0.5).astype(jnp.bfloat16)
    fresh_v = (_rand(4, b, nk, h) * 0.5).astype(jnp.bfloat16)
    positions = jnp.asarray([7, s - 1], jnp.int32)
    ref = attn_ref.cache_attention_quantized(
        q, kc, vc, ks, vs, positions, fresh_k=fresh_k, fresh_v=fresh_v)
    out = pattn.decode_attention(q, _pair_cache(kc), _pair_cache(vc),
                                 positions, ks, vs,
                                 fresh_k=fresh_k, fresh_v=fresh_v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_verify_attention_paired_matches_unpaired():
    """Speculative verify (TQ candidate rows) against a paired cache."""
    b, s, nq, nk, h, t = 2, 96, 8, 4, 64, 3
    q = (_rand(0, b, t, nq, h) * 0.5).astype(jnp.bfloat16)
    kc, ks = quantize_kv(_rand(1, b, nk, s, h) * 0.5)
    vc, vs = quantize_kv(_rand(2, b, nk, s, h) * 0.5)
    fk = (_rand(3, b, nk, t, h) * 0.5).astype(jnp.bfloat16)
    fv = (_rand(4, b, nk, t, h) * 0.5).astype(jnp.bfloat16)
    positions = jnp.asarray([4, s - t - 1], jnp.int32)
    layer = jnp.int32(0)
    ref = pattn.verify_attention(q, kc[None], vc[None], positions,
                                 ks[None], vs[None], layer=layer,
                                 fresh_k=fk, fresh_v=fv)
    out = pattn.verify_attention(q, _pair_cache(kc)[None],
                                 _pair_cache(vc)[None], positions,
                                 ks[None], vs[None], layer=layer,
                                 fresh_k=fk, fresh_v=fv)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("kernels", [False, True])
def test_decode_step_paired_cache_matches(kernels):
    """End-to-end: prefill + decode with a PAIRED quantized cache produce
    the same logits as the unpaired cache, with kernels on and off."""
    from gabby_tpu import config as cfglib
    from gabby_tpu.models import llama
    from gabby_tpu.runtime.kv_cache import create_cache

    cfg = cfglib.tiny(num_heads=8, num_kv_heads=4, head_dim=64,
                      hidden_size=256, intermediate_size=256, vocab_size=256,
                      max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.bfloat16)
    qparams = quant.quantize_tree(params, 8)
    tokens_p = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]] * 2, jnp.int32)
    dec_tokens = jnp.asarray([5, 9], jnp.int32)
    positions = jnp.asarray([8, 8], jnp.int32)

    if kernels:
        pk.set_kernels(True)
    try:
        outs = {}
        for paired in (False, True):
            cache = create_cache(cfg, 2, 64, quantized=True, paired=paired)
            _, cache = llama.prefill(qparams, cfg, tokens_p, cache)
            logits, cache = llama.decode_step(qparams, cfg, dec_tokens,
                                              positions, cache)
            logits2, _ = llama.decode_step(qparams, cfg, dec_tokens,
                                           positions + 1, cache)
            outs[paired] = (np.asarray(logits), np.asarray(logits2))
    finally:
        pk.set_kernels(False)
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=5e-2, atol=5e-1)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=5e-2, atol=5e-1)


def test_verify_step_paired_cache_matches():
    """verify_step (the speculative macro-step) over a paired cache."""
    from gabby_tpu import config as cfglib
    from gabby_tpu.models import llama
    from gabby_tpu.runtime.kv_cache import create_cache

    cfg = cfglib.tiny(num_heads=8, num_kv_heads=4, head_dim=64,
                      hidden_size=256, intermediate_size=256, vocab_size=256,
                      max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(1),
                               dtype=jnp.bfloat16)
    qparams = quant.quantize_tree(params, 8)
    tokens_p = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]] * 2, jnp.int32)
    tokens_bt = jnp.asarray([[5, 9, 2], [7, 1, 8]], jnp.int32)
    positions = jnp.asarray([8, 8], jnp.int32)

    pk.set_kernels(True)
    try:
        outs = {}
        for paired in (False, True):
            cache = create_cache(cfg, 2, 64, quantized=True, paired=paired)
            _, cache = llama.prefill(qparams, cfg, tokens_p, cache)
            logits, _ = llama.verify_step(qparams, cfg, tokens_bt,
                                          positions, cache)
            outs[paired] = np.asarray(logits)
    finally:
        pk.set_kernels(False)
    np.testing.assert_allclose(outs[True], outs[False], rtol=5e-2, atol=5e-1)


@pytest.mark.parametrize("t,offset", [(16, 0), (8, 24)])
def test_prefill_attention_paired_matches_reference(t, offset):
    """Paired-layout flash prefill vs the unpaired jnp contract."""
    from gabby_tpu.ops.pallas import prefill_attention as pfa

    b, nk, g, h, s = 3, 4, 2, 64, 64
    nq = nk * g
    slot = 1
    q = (_rand(0, 1, t, nq, h) * 0.5).astype(jnp.bfloat16)
    kc, ks = quantize_kv(_rand(1, b, nk, s, h) * 0.5)
    vc, vs = quantize_kv(_rand(2, b, nk, s, h) * 0.5)
    fk = (_rand(3, nk, t, h) * 0.5).astype(jnp.bfloat16)
    fv = (_rand(4, nk, t, h) * 0.5).astype(jnp.bfloat16)

    ref = attn_ref.slot_prefill_attention(
        q, kc, vc, jnp.int32(slot), jnp.int32(offset), ks, vs,
        fresh_k=fk, fresh_v=fv)
    out = pfa.prefill_attention(q, _pair_cache(kc), _pair_cache(vc),
                                jnp.int32(slot), jnp.int32(offset), ks, vs,
                                fresh_k=fk, fresh_v=fv)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


# ---- int8 prefill shadow of int4 weights ----

def test_promote_int4_to_int8_is_exact():
    """The shadow must dequantize to EXACTLY the int4 values (same codes,
    same scales) — it's a repack, not a requantization."""
    w = _rand(7, 256, 128) * 0.3
    qt4 = quant.quantize(w, 4)
    tree = {"a": qt4, "embed": w,
            "stacked": quant.quantize_tree(
                {"blocks": {"w": jnp.stack([w, w * 0.5])}}, 4
            )["blocks"]["w"]}
    shadow = quant.promote_int4_to_int8(tree)
    assert shadow["a"].bits == 8
    assert shadow["embed"] is tree["embed"]          # shared, not copied
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize(shadow["a"], jnp.float32)),
        np.asarray(quant.dequantize(qt4, jnp.float32)))
    np.testing.assert_array_equal(np.asarray(shadow["a"].scale),
                                  np.asarray(qt4.scale))
    assert shadow["stacked"].bits == 8
    assert shadow["stacked"].q.shape[1] == tree["stacked"].q.shape[1] * 2
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(quant.unpack_int4(tree["stacked"].q[i])),
            np.asarray(shadow["stacked"].q[i]))


def test_prefill_shadow_engine_matches_plain_int4():
    """Engine with prefill_int8_shadow=True generates the same stream as
    plain int4 (prefill numerics are the identical dequant values)."""
    from gabby_tpu import config as cfglib
    from gabby_tpu.models import llama
    from gabby_tpu.runtime.engine import Engine, EngineConfig
    from gabby_tpu.tokenizer import Tokenizer

    cfg = cfglib.tiny(hidden_size=64, intermediate_size=128, max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(5),
                               dtype=jnp.float32)
    qparams = quant.quantize_tree(params, 4)
    tok = Tokenizer.byte_fallback(cfg.vocab_size)
    msgs = [{"role": "user", "content": "shadow"}]
    outs = {}
    for shadow in (False, True):
        eng = Engine(cfg, qparams, tok,
                     EngineConfig(batch_slots=2, max_seq=128,
                                  steps_per_call=4, default_max_tokens=6,
                                  cache_dtype="float32",
                                  prefill_int8_shadow=shadow))
        try:
            text, fin, _, _ = eng.generate_sync(msgs, max_tokens=6)
        finally:
            eng.shutdown()
        outs[shadow] = (text, fin)
    assert outs[True] == outs[False]


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_decode_attention_paired_matches_unpaired(quantized):
    """The PAGED paired pool ([P, L, Nk/2, page, 2H], scales per-head)
    must reproduce the unpaired paged decode contract — the same
    block-diagonal trick as the dense paired kernel, riding the
    scalar-prefetched page table."""
    L, b, nk, g, h = 3, 2, 2, 4, 16
    page, mp, npages = 16, 4, 10
    nq = nk * g
    q = (_rand(0, b, 1, nq, h) * 0.5).astype(jnp.bfloat16)
    kp = _rand(1, npages, L, nk, page, h) * 0.5
    vp = _rand(2, npages, L, nk, page, h) * 0.5
    fk = (_rand(3, b, nk, h) * 0.5).astype(jnp.bfloat16)
    fv = (_rand(4, b, nk, h) * 0.5).astype(jnp.bfloat16)
    pt = jnp.asarray([[3, 5, 1, 7], [2, 8, 9, 4]], jnp.int32)
    positions = jnp.asarray([19, 55], jnp.int32)
    layer = jnp.int32(2)
    if quantized:
        kq, ks = quantize_kv(kp)
        vq, vs = quantize_kv(vp)
        ref = pattn.paged_decode_attention(q, kq, vq, pt, positions, ks, vs,
                                           layer=layer, fresh_k=fk,
                                           fresh_v=fv)
        got = pattn.paged_decode_attention(
            q, _pair_cache(kq), _pair_cache(vq), pt, positions, ks, vs,
            layer=layer, fresh_k=fk, fresh_v=fv)
    else:
        kpb, vpb = kp.astype(jnp.bfloat16), vp.astype(jnp.bfloat16)
        ref = pattn.paged_decode_attention(q, kpb, vpb, pt, positions,
                                           layer=layer, fresh_k=fk,
                                           fresh_v=fv)
        got = pattn.paged_decode_attention(
            q, _pair_cache(kpb), _pair_cache(vpb), pt, positions,
            layer=layer, fresh_k=fk, fresh_v=fv)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_paged_verify_attention_paired_matches_unpaired():
    """Speculative verify against a PAIRED paged pool (TQ candidate rows,
    causal self-block) must match the unpaired paged verify."""
    L, b, nk, g, h, tq = 2, 2, 2, 4, 16, 3
    page, mp, npages = 16, 4, 9
    nq = nk * g
    q = (_rand(0, b, tq, nq, h) * 0.5).astype(jnp.bfloat16)
    kp = _rand(1, npages, L, nk, page, h) * 0.5
    vp = _rand(2, npages, L, nk, page, h) * 0.5
    fk = (_rand(3, b, nk, tq, h) * 0.5).astype(jnp.bfloat16)
    fv = (_rand(4, b, nk, tq, h) * 0.5).astype(jnp.bfloat16)
    pt = jnp.asarray([[3, 5, 1, 7], [2, 8, 6, 4]], jnp.int32)
    positions = jnp.asarray([13, 47], jnp.int32)
    layer = jnp.int32(1)
    kq, ks = quantize_kv(kp)
    vq, vs = quantize_kv(vp)
    ref = pattn.paged_verify_attention(q, kq, vq, pt, positions, ks, vs,
                                       layer=layer, fresh_k=fk, fresh_v=fv)
    got = pattn.paged_verify_attention(
        q, _pair_cache(kq), _pair_cache(vq), pt, positions, ks, vs,
        layer=layer, fresh_k=fk, fresh_v=fv)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


# ---- half-split packing: GLOBAL-layout invariant (ADVICE r4) ----

def test_int4_halfsplit_pairing_is_global_only():
    """pack_int4's HALF-SPLIT pairing (packed byte row j = logical rows j
    and j + K/2) is a GLOBAL-layout property: a shard-local slice of the
    packed rows does NOT decode to that shard's contiguous logical rows,
    so the Pallas qmatmul kernels (which pair x[:, :K/2] with the low
    nibbles) are only correct on unpartitioned/global inputs. GSPMD
    guarantees that today — pallas_call registers no custom partitioning,
    so XLA feeds it full operands — but a future shard_map integration
    would silently break it (quant.QTensor docstring). Pin it numerically:
    executing the unpack recipe per row-shard and psum-ing the partials
    computes a DIFFERENT result than the global contract."""
    k, n, m = 256, 128, 4
    w = _rand(0, k, n) * 0.4
    qt = quant.quantize(w, 4)
    x = (_rand(1, m, k) * 0.5).astype(jnp.bfloat16)
    ref = np.asarray(quant.qlinear(x, qt), np.float32)

    # simulate a 2-way row-shard over the PACKED axis, each shard running
    # the kernels' own recipe (unpack its local bytes, contract against
    # its contiguous slice of x), partials summed as a psum would
    kp = qt.q.shape[0]  # k // 2 packed rows
    partial = np.zeros((m, n), np.float32)
    for s in range(2):
        q_local = qt.q[s * kp // 2:(s + 1) * kp // 2]
        x_local = x[:, s * k // 2:(s + 1) * k // 2]
        w_local = quant.unpack_int4(q_local).astype(jnp.bfloat16)
        partial += np.asarray(jax.lax.dot_general(
            x_local, w_local,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)) * np.asarray(qt.scale)
    # the pairing is wrong per-shard, so this MUST disagree: if it ever
    # starts matching, the packing changed and the guard below is stale
    assert not np.allclose(partial, ref, rtol=2e-2, atol=2e-2), (
        "per-shard half-split unpack unexpectedly matched the global "
        "contract — update the shard_map tripwire and QTensor docstring")


def test_no_shard_map_wraps_quant_kernels():
    """Structural tripwire for the invariant above: the only shard_map
    region in the tree is parallel/ring.py (ring attention — pure jnp on
    activations, verified below to not touch the quant kernels), so the
    Pallas quant kernels can never execute on shard-local operands. If
    this fails because another legitimate shard_map landed: keep the
    quant kernels OUTSIDE the manual region (or implement per-shard
    half-split packing per the quant.QTensor docstring note), then scope
    this check accordingly."""
    import pathlib

    import gabby_tpu

    allowed = {"parallel/ring.py"}
    root = pathlib.Path(gabby_tpu.__file__).parent
    offenders = [str(p.relative_to(root))
                 for p in sorted(root.rglob("*.py"))
                 if "shard_map" in p.read_text()]
    assert set(offenders) <= allowed, (
        f"shard_map appeared in {offenders}: verify the int4 half-split "
        "Pallas kernels stay on global (unpartitioned) operands — see "
        "gabby_tpu/ops/quant.py QTensor docstring")
    # the allowed manual region must stay clear of the quant kernels:
    # no import of the ops package (docstrings may MENTION the invariant)
    ring_src = (root / "parallel" / "ring.py").read_text()
    for needle in ("gabby_tpu.ops", "qmatmul(", "qlinear(", "pallas_call"):
        assert needle not in ring_src, (
            f"parallel/ring.py references {needle!r} inside the shard_map "
            "region — the half-split GLOBAL-layout invariant would break")


# ---- adaptive weight-tile budget (round 5) ----

def test_tile_budget_switches_and_restores():
    prev = pqm.tile_budget()
    try:
        pqm.set_tile_budget("big")
        assert pqm.tile_budget() == "big"
        assert pqm.TILE_BYTES == 4 * 1024 * 1024
        pqm.set_tile_budget("mid")
        assert pqm.TILE_BYTES == 2 * 1024 * 1024
        pqm.set_tile_budget("bogus")  # unknown -> mid
        assert pqm.tile_budget() == "mid"
    finally:
        pqm.set_tile_budget(prev)


def test_probe_big_tiles_noop_off_tpu():
    """Off-TPU there is no scoped-VMEM limit to probe: no budget change."""
    prev = pqm.tile_budget()
    assert pqm.probe_big_tiles({(256, 256)}) is False
    assert pqm.tile_budget() == prev


def test_probe_big_tiles_falls_back_on_compile_failure(monkeypatch):
    """A Mosaic scoped-VMEM compile OOM during the probe must restore the
    proven budget instead of leaving 'big' half-adopted."""
    monkeypatch.setenv("GABBY_KERNELS", "1")
    monkeypatch.delenv("GABBY_QMM_BIGTILES", raising=False)
    monkeypatch.setattr(pk, "kernels_enabled", lambda: True)
    monkeypatch.setattr(pk, "interpret_mode", lambda: False)

    def boom(*a, **k):
        raise RuntimeError("Scoped allocation 24.26M, limit 16.00M")

    monkeypatch.setattr(pqm, "qmatmul_stacked", boom)
    prev = pqm.tile_budget()
    assert pqm.probe_big_tiles({(256, 256)}) is False
    assert pqm.tile_budget() == prev


def test_probe_big_tiles_adopts_on_success(monkeypatch):
    """When every probe shape compiles, the big budget stays adopted."""
    monkeypatch.setattr(pk, "kernels_enabled", lambda: True)
    monkeypatch.setattr(pk, "interpret_mode", lambda: False)
    monkeypatch.delenv("GABBY_QMM_BIGTILES", raising=False)
    prev = pqm.tile_budget()
    try:
        # interpret-mode compile on CPU stands in for the on-chip compile
        monkeypatch.setattr(pk, "interpret_mode", lambda: False)
        called = []

        def ok_stacked(x, codes, scale, layer, bits):
            called.append((x.shape, codes.shape))
            return jnp.zeros((x.shape[0], codes.shape[2]), x.dtype)

        monkeypatch.setattr(pqm, "qmatmul_stacked", ok_stacked)
        assert pqm.probe_big_tiles({(256, 256)}) is True
        assert pqm.tile_budget() == "big"
        assert called  # the probe really lowered the kernel entry
    finally:
        pqm.set_tile_budget(prev)


def test_probe_big_tiles_respects_env_pin(monkeypatch):
    monkeypatch.setenv("GABBY_QMM_BIGTILES", "mid")
    prev = pqm.tile_budget()
    assert pqm.probe_big_tiles({(256, 256)}) == (prev == "big")
    assert pqm.tile_budget() == prev


def test_budget_ladder_tile_selection():
    """Each budget rung must (a) keep tile_k*tile_n under its weight-tile
    byte budget and (b) fit the block working set under its cap — checked
    at the 1B model's real decode shapes (fused qkv / gate-up / down)."""
    shapes = [(2048, 3072), (2048, 16384), (8192, 2048)]  # (k, n) logical
    prev = pqm.tile_budget()
    try:
        for mode in ("0", "mid", "big", "huge"):
            pqm.set_tile_budget(mode)
            _, budget_bytes, _ = pqm._BUDGETS[mode]
            for k, n in shapes:
                kp = k // 2  # int4 packed contraction dim
                tile_k, tile_n = pqm._pick_tiles(kp, n, 16, 4)
                assert tile_k and tile_n, (mode, k, n)
                assert tile_k * tile_n <= budget_bytes, (mode, k, n)
    finally:
        pqm.set_tile_budget(prev)


def test_huge_budget_widens_grouped_unembed():
    """Under the 'huge' budget's 20 MB working-set cap the grouped unembed
    can seat 4096-wide tiles on a 4096-divisible vocab; the default
    budgets stay at 2048 (their proven cap)."""
    kp, g = 1024, 256  # Llama-3.2-1B unembed: D=2048 -> kp=1024
    gh = kp // g
    n = 131072  # vocab padded to a 4096 multiple
    prev = pqm.tile_budget()
    try:
        pqm.set_tile_budget("mid")
        assert pqm._grouped_tile_n(kp, n, 16, gh, g) == 2048
        pqm.set_tile_budget("huge")
        assert pqm._grouped_tile_n(kp, n, 16, gh, g) == 4096
    finally:
        pqm.set_tile_budget(prev)


def test_vmem_limit_env_override(monkeypatch):
    monkeypatch.setenv("GABBY_VMEM_LIMIT_MB", "32")
    assert pk.vmem_limit_bytes() == 32 * 1024 * 1024
    monkeypatch.setenv("GABBY_VMEM_LIMIT_MB", "0")
    assert pk.vmem_limit_bytes() is None
    monkeypatch.delenv("GABBY_VMEM_LIMIT_MB")
    assert pk.vmem_limit_bytes() == 64 * 1024 * 1024
