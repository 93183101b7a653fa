"""Scale-config health: the 8B and 70B presets must trace (and 8B must
COMPILE over a TP mesh) without materializing weights — abstract params via
jax.eval_shape catch head/dim divisibility and sharding-rule bugs that only
bite at scale (BASELINE configs 4-5)."""

import jax
import jax.numpy as jnp
import pytest

from gabby_tpu import config as cfglib
from gabby_tpu.models import llama
from gabby_tpu.ops.quant import QTensor
from gabby_tpu.parallel import cache_shardings, make_mesh, param_shardings
from gabby_tpu.runtime.kv_cache import KVCache


def _abstract_params(cfg, bits=None):
    """ShapeDtypeStruct pytree matching init_params/quantize_tree output."""
    d, f, v, L = (cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size,
                  cfg.num_layers)

    def w(*shape):
        if bits is None:
            return jax.ShapeDtypeStruct(shape, jnp.bfloat16)
        rows = shape[-2] // 2 if bits == 4 else shape[-2]
        return QTensor(
            q=jax.ShapeDtypeStruct(shape[:-2] + (rows, shape[-1]), jnp.int8),
            scale=jax.ShapeDtypeStruct(shape[:-1][:-1] + (shape[-1],),
                                       jnp.float32),
            bits=bits)

    bf = lambda *s: jax.ShapeDtypeStruct(s, jnp.bfloat16)
    return {
        "embed": bf(v, d),
        "blocks": {
            "attn_norm": bf(L, d), "mlp_norm": bf(L, d),
            "wq": w(L, d, cfg.q_dim), "wk": w(L, d, cfg.kv_dim),
            "wv": w(L, d, cfg.kv_dim), "wo": w(L, cfg.q_dim, d),
            "w_gate": w(L, d, f), "w_up": w(L, d, f),
            "w_down": w(L, f, d),
        },
        "final_norm": bf(d),
        "lm_head": w(d, v) if bits else (None if cfg.tie_word_embeddings
                                         else bf(d, v)),
    }


def _abstract_cache(cfg, batch, s, quantized):
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, s, cfg.head_dim)
    if quantized:
        return KVCache(k=jax.ShapeDtypeStruct(shape, jnp.int8),
                       v=jax.ShapeDtypeStruct(shape, jnp.int8),
                       k_scale=jax.ShapeDtypeStruct(shape[:-1], jnp.float32),
                       v_scale=jax.ShapeDtypeStruct(shape[:-1], jnp.float32))
    return KVCache(k=jax.ShapeDtypeStruct(shape, jnp.bfloat16),
                   v=jax.ShapeDtypeStruct(shape, jnp.bfloat16),
                   k_scale=None, v_scale=None)


@pytest.mark.parametrize("preset,bits", [("llama3_8b", 4),
                                         ("llama3_70b", 4)])
def test_big_config_traces(preset, bits):
    cfg = getattr(cfglib, preset)(max_seq_len=4096)
    params = _abstract_params(cfg, bits)
    cache = _abstract_cache(cfg, 8, 4096, quantized=True)
    tokens = jax.ShapeDtypeStruct((8,), jnp.int32)
    positions = jax.ShapeDtypeStruct((8,), jnp.int32)
    logits, new_cache = jax.eval_shape(
        lambda p, t, pos, c: llama.decode_step(p, cfg, t, pos, c),
        params, tokens, positions, cache)
    assert logits.shape == (8, cfg.vocab_size)
    assert new_cache.k.shape == cache.k.shape


def test_70b_fp8_activations_traces_over_mesh():
    """BASELINE config 5 shape: 70B INT4 weights + FP8 activations — the
    decode step must trace with fp8 activation casts in the graph, and the
    sharding rules must cover its params."""
    from gabby_tpu.ops import quant
    cfg = cfglib.llama3_70b(max_seq_len=4096)
    params = _abstract_params(cfg, 4)
    cache = _abstract_cache(cfg, 8, 4096, quantized=True)
    tokens = jax.ShapeDtypeStruct((8,), jnp.int32)
    positions = jax.ShapeDtypeStruct((8,), jnp.int32)
    quant.set_act_fp8(True)
    try:
        jaxpr = jax.make_jaxpr(
            lambda p, t, pos, c: llama.decode_step(p, cfg, t, pos, c)[0])(
            params, tokens, positions, cache)
        # the fp8 grid pass must actually be in the traced graph
        assert "f8_e4m3" in str(jaxpr.jaxpr).replace("float8_e4m3fn", "f8_e4m3")
        # and the partition rules must produce a spec for every leaf
        mesh = make_mesh(dp=1, tp=8)
        param_shardings(params, mesh)
    finally:
        quant.set_act_fp8(False)


def test_fp8_activations_quality_and_exactness():
    """fp8 activations change numerics but must stay CLOSE on a real tiny
    forward (sanity for the emulated grid: per-token scale, e4m3 max 448)."""
    from gabby_tpu.ops import quant
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64), jnp.float32) * 3.0
    y = quant.fp8_activation(x)
    assert y.shape == x.shape and y.dtype == x.dtype
    # fp8 e4m3 has ~2 decimal digits: elementwise within ~6% of the input
    import numpy as np
    rel = np.abs(np.asarray(y) - np.asarray(x)) / (np.abs(np.asarray(x)) + 1e-6)
    assert float(rel.max()) < 0.07, float(rel.max())


def test_8b_tp8_compiles():
    """8B INT4 decode step lowers + compiles over an 8-way TP mesh (the
    BASELINE config-4 shape, on the virtual CPU mesh)."""
    cfg = cfglib.llama3_8b(max_seq_len=1024)
    mesh = make_mesh(dp=1, tp=8)
    params = _abstract_params(cfg, 4)
    p_shardings = param_shardings(params, mesh)
    c_shardings = cache_shardings(mesh, quantized=True)
    cache = _abstract_cache(cfg, 8, 1024, quantized=True)
    tokens = jax.ShapeDtypeStruct((8,), jnp.int32)
    positions = jax.ShapeDtypeStruct((8,), jnp.int32)

    fn = jax.jit(lambda p, t, pos, c: llama.decode_step(p, cfg, t, pos, c),
                 in_shardings=(p_shardings, None, None, c_shardings))
    compiled = fn.lower(params, tokens, positions, cache).compile()
    # every weight shard must be 1/8th of the logical leaf
    wq = compiled.input_shardings[0][0]["blocks"]["wq"]
    shard = wq.q.shard_shape((cfg.num_layers, cfg.hidden_size, cfg.q_dim))
    assert shard[-1] == cfg.q_dim // 8
