"""Mesh/sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gabby_tpu import config as cfglib
from gabby_tpu.models import llama
from gabby_tpu.ops import quant, sampling
from gabby_tpu.parallel import (cache_shardings, make_mesh, param_shardings,
                                shard_params)
from gabby_tpu.runtime.kv_cache import create_cache


def mesh_cfg(**kw):
    return cfglib.tiny(num_heads=8, num_kv_heads=4, head_dim=8,
                       hidden_size=64, intermediate_size=128, **kw)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = mesh_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def test_param_shardings_cover_tree(setup):
    cfg, params = setup
    mesh = make_mesh(dp=2, tp=4)
    sh = param_shardings(params, mesh)
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(sh)
    assert len(flat_p) == len(flat_s)
    assert all(isinstance(s, NamedSharding) for s in flat_s)


@pytest.mark.parametrize("quant_bits", [None, 8, 4])
def test_sharded_decode_matches_single_device(setup, quant_bits):
    cfg, params = setup
    if quant_bits:
        params = quant.quantize_tree(params, quant_bits)
    b = 4
    prompt = jnp.tile(jnp.array([[3, 17, 42, 9, 101, 7]], jnp.int32), (b, 1))

    # single-device golden
    cache0 = create_cache(cfg, b, 16, dtype=jnp.float32)
    _, cache0 = llama.prefill(params, cfg, prompt, cache0)
    gold, _ = llama.decode_step(params, cfg,
                                jnp.full((b,), 5, jnp.int32),
                                jnp.full((b,), 6, jnp.int32), cache0)

    # sharded: dp=2 x tp=4
    mesh = make_mesh(dp=2, tp=4)
    sparams = shard_params(params, mesh)
    cache = jax.device_put(create_cache(cfg, b, 16, dtype=jnp.float32),
                           cache_shardings(mesh, quantized=False))

    @jax.jit
    def step(params, tokens, positions, cache):
        return llama.decode_step(params, cfg, tokens, positions, cache)

    _, cache = jax.jit(
        lambda p, t, c: llama.prefill(p, cfg, t, c))(sparams, prompt, cache)
    out, _ = step(sparams,
                  jnp.full((b,), 5, jnp.int32),
                  jnp.full((b,), 6, jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                               atol=2e-4, rtol=2e-3)


def test_sharded_weights_actually_distributed(setup):
    cfg, params = setup
    mesh = make_mesh(dp=1, tp=8)
    sparams = shard_params(params, mesh)
    wq = sparams["blocks"]["wq"]
    # each device holds 1/8 of the output dim
    shard = wq.addressable_shards[0]
    assert shard.data.shape == (cfg.num_layers, cfg.hidden_size, cfg.q_dim // 8)
    embed = sparams["embed"]
    assert embed.addressable_shards[0].data.shape == (cfg.vocab_size // 8,
                                                      cfg.hidden_size)


def test_sampling_under_mesh(setup):
    cfg, _ = setup
    mesh = make_mesh(dp=2, tp=4)
    logits = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (4, cfg.vocab_size)),
        NamedSharding(mesh, P("data", None)))
    toks = jax.jit(lambda l: sampling.sample(
        l, jax.random.PRNGKey(2),
        temperature=jnp.zeros(4), top_k=jnp.zeros(4, jnp.int32),
        top_p=jnp.ones(4)))(logits)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.argmax(np.asarray(logits), -1))


def test_bench_mesh_mode_runs_end_to_end():
    """`bench.py --tp/--dp` must run the whole decode bench over a virtual
    mesh and emit the JSON schema with the mesh shape (VERDICT r2 item 8 —
    on real hardware this same command IS the scaling-efficiency record)."""
    import json as _json
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, "bench.py", "--tp", "2", "--dp", "2",
         "--cpu-devices", "4", "--config", "tiny", "--batch", "4",
         "--context", "32", "--max-seq", "64", "--steps", "4",
         "--min-time", "0.1", "--prefill-len", "16", "--json-only"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = _json.loads(line)
    assert rec["unit"] == "tok/s/chip"
    assert rec["detail"]["mesh"] == {"dp": 2, "tp": 2}
    assert rec["value"] > 0


def test_cacheloops_formats_compile_over_mesh(setup, monkeypatch):
    """The TPU serving path pins the KV cache's jit-boundary layouts
    (generate.CacheLoops Formats — removes four full-cache copies per
    call, BASELINE.md round 3). On the CPU backend the pin is gated OFF
    by default, so this test forces it on (GABBY_CACHE_LAYOUTS=1) and
    compiles one sharded decode step through the pinned entry to keep the
    TPU-only code path covered: the Format trees must line up with the
    cache pytree and the pinned program must still execute and match the
    module-level path's tokens."""
    from gabby_tpu.runtime import generate

    cfg, params = setup
    qparams = quant.quantize_tree(params, 8)
    mesh = make_mesh(dp=2, tp=4)
    sparams = shard_params(qparams, mesh)
    shardings = cache_shardings(mesh, quantized=True)
    cache = jax.device_put(
        create_cache(cfg, 2, cfg.max_seq_len, quantized=True), shardings)

    monkeypatch.setenv("GABBY_CACHE_LAYOUTS", "1")
    loops = generate.CacheLoops(cache, shardings)
    assert loops._decode is not generate.decode_loop  # pins actually on

    tokens = jnp.asarray([3, 5], jnp.int32)
    positions = jnp.asarray([4, 4], jnp.int32)
    active = jnp.asarray([True, True])
    sstate = generate.SamplingState.greedy(2)
    out, *_ = loops.decode_loop(sparams, cfg, tokens, positions, active,
                                cache, sstate, 2)

    cache2 = jax.device_put(
        create_cache(cfg, 2, cfg.max_seq_len, quantized=True), shardings)
    ref, *_ = generate.decode_loop(sparams, cfg, tokens, positions, active,
                                   cache2, sstate, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cacheloops_page_table_is_never_layout_pinned(setup, monkeypatch):
    """Regression (r5c on-chip crash): the persistent XLA compilation
    cache DROPS custom output layouts when it serves an executable, so a
    layout-pinned page_table desyncs — a cache-served prefill emits the
    backend-default layout and the next pinned decode dispatch hard-errors
    ('Layout passed to jit does not match the layout on the respective
    arg', int32[8, 4] at page_size 512). CacheLoops must pin ONLY the big
    pool leaves and leave the paged page table on a plain sharding, and a
    default-layout table (what _push_page_table's jnp.asarray produces)
    must dispatch through the pinned loops."""
    import dataclasses

    from jax.experimental.layout import Format
    from gabby_tpu.parallel import paged_cache_shardings
    from gabby_tpu.runtime import generate
    from gabby_tpu.runtime.paged import create_paged_cache

    cfg, params = setup
    qparams = quant.quantize_tree(params, 8)
    mesh = make_mesh(dp=2, tp=4)
    sparams = shard_params(qparams, mesh)
    shardings = paged_cache_shardings(mesh, quantized=True)
    cache = jax.device_put(
        create_paged_cache(cfg, 2, 32, 9, quantized=True, page_size=16),
        shardings)

    monkeypatch.setenv("GABBY_CACHE_LAYOUTS", "1")
    loops = generate.CacheLoops(cache, shardings)
    assert loops.formats is not None
    assert not isinstance(loops.formats.page_table, Format)
    assert isinstance(loops.formats.k, Format)

    cache = loops.pin_cache(cache)
    # a host-rebuilt table in the backend's default layout must dispatch
    pt = jax.device_put(jnp.zeros((2, 2), jnp.int32),
                        loops.formats.page_table)
    cache = dataclasses.replace(cache, page_table=pt)
    sstate = generate.SamplingState.greedy(2)
    out, *_ = loops.decode_loop(
        sparams, cfg, jnp.asarray([3, 5], jnp.int32),
        jnp.asarray([4, 4], jnp.int32), jnp.asarray([True, True]),
        cache, sstate, 2)
    assert out.shape == (2, 2)


def test_promote_int4_shadow_preserves_shardings(setup):
    """promote_int4_to_int8 on a mesh-sharded tree: every shadow keeps its
    source NamedSharding (the int4 codes' spec IS the int8 spec — unpack
    is shard-local on the in axis) and prefill through the shadow matches
    int4 prefill exactly (same codes, same scales)."""
    cfg, params = setup
    qparams = quant.quantize_tree(params, 4)
    mesh = make_mesh(dp=2, tp=4)
    sparams = shard_params(qparams, mesh)
    shadow = quant.promote_int4_to_int8(sparams)

    def leaves(t):
        return [x for x in jax.tree.leaves(
                    t, is_leaf=lambda y: isinstance(y, quant.QTensor))
                if isinstance(x, quant.QTensor)]

    n4 = 0
    for src, sh in zip(leaves(sparams), leaves(shadow)):
        if src.bits == 4 and not src.group:
            n4 += 1
            assert sh.bits == 8
            assert sh.q.sharding == src.q.sharding
            assert sh.q.shape[-2] == src.q.shape[-2] * 2
            assert sh.scale is src.scale
    assert n4 > 0

    b = 4
    prompt = jnp.tile(jnp.array([[3, 17, 42, 9, 101, 7]], jnp.int32), (b, 1))
    csh = cache_shardings(mesh, quantized=False)
    c1 = jax.device_put(create_cache(cfg, b, 16, dtype=jnp.float32), csh)
    c2 = jax.device_put(create_cache(cfg, b, 16, dtype=jnp.float32), csh)
    pf = jax.jit(lambda p, t, c: llama.prefill(p, cfg, t, c))
    gold, _ = pf(sparams, prompt, c1)
    out, _ = pf(shadow, prompt, c2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                               atol=1e-5, rtol=1e-5)


def test_pair_kv_rejected_under_cache_shardings(setup):
    """pair_kv_heads + a mesh must fail loudly (unvalidated combination),
    not silently mis-shard the halved kv-head axis."""
    from gabby_tpu.runtime.engine import Engine, EngineConfig
    from gabby_tpu.tokenizer import Tokenizer

    cfg, params = setup
    mesh = make_mesh(dp=2, tp=4)
    with pytest.raises(ValueError, match="single-device"):
        Engine(cfg, shard_params(params, mesh),
               Tokenizer.byte_fallback(cfg.vocab_size),
               EngineConfig(batch_slots=2, max_seq=64,
                            cache_dtype="float32", pair_kv_heads=True),
               cache_shardings=cache_shardings(mesh, quantized=False))


@pytest.mark.parametrize("quant_bits", [None, 4])
def test_fused_tp_matches_unfused(setup, quant_bits):
    """Shard-aware projection fusion (fuse_projections(tp=N) + cfg.fused_tp):
    the fused tree column-sharded over the model axis must produce the same
    logits as the unfused sharded tree — the per-shard column-block layout
    keeps every device's slice pure q/k/v (gate/up), and _split_fused
    recovers the logical parts shard-locally (VERDICT r3 item 4)."""
    import dataclasses

    cfg, params = setup
    if quant_bits:
        params = quant.quantize_tree(params, quant_bits)
    tp = 4
    mesh = make_mesh(dp=2, tp=tp)
    b = 4
    prompt = jnp.tile(jnp.array([[3, 17, 42, 9, 101, 7]], jnp.int32), (b, 1))
    tok = jnp.full((b,), 5, jnp.int32)
    pos = jnp.full((b,), 6, jnp.int32)

    def run(p, c):
        cache = jax.device_put(create_cache(c, b, 16, dtype=jnp.float32),
                               cache_shardings(mesh, quantized=False))
        _, cache = jax.jit(
            lambda pp, t, cc: llama.prefill(pp, c, t, cc))(p, prompt, cache)
        out, _ = jax.jit(
            lambda pp, t, q, cc: llama.decode_step(pp, c, t, q, cc))(
                p, tok, pos, cache)
        return np.asarray(out)

    gold = run(shard_params(params, mesh), cfg)
    fcfg = dataclasses.replace(cfg, fused_tp=tp)
    fused = llama.fuse_projections(params, tp=tp)
    sfused = shard_params(fused, mesh, fused_tp=tp)
    got = run(sfused, fcfg)
    np.testing.assert_allclose(got, gold, atol=2e-4, rtol=2e-3)

    # the guard still rejects a tp-mismatched fused tree
    with pytest.raises(ValueError, match="fused"):
        shard_params(llama.fuse_projections(params), mesh)


def test_fuse_projections_tp_requires_divisible_dims(setup):
    cfg, params = setup
    with pytest.raises(ValueError, match="divide"):
        llama.fuse_projections(params, tp=3)
