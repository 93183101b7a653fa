"""Loader tests: HF-style model dir (safetensors + config.json) -> params."""

import json

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from gabby_tpu import loader
from gabby_tpu.models import llama
from gabby_tpu.ops.quant import QTensor
from tests import helpers


def _write_hf_dir(tmp_path, cfg, params, *, sharded=False):
    """Serialize our params in HF naming/layout (transposed linears)."""
    t = {}
    t["model.embed_tokens.weight"] = np.asarray(params["embed"])
    blk = params["blocks"]
    names = {
        "self_attn.q_proj": "wq", "self_attn.k_proj": "wk",
        "self_attn.v_proj": "wv", "self_attn.o_proj": "wo",
        "mlp.gate_proj": "w_gate", "mlp.up_proj": "w_up",
        "mlp.down_proj": "w_down",
    }
    for l in range(cfg.num_layers):
        for hf, ours in names.items():
            t[f"model.layers.{l}.{hf}.weight"] = np.asarray(blk[ours][l]).T
        t[f"model.layers.{l}.input_layernorm.weight"] = np.asarray(blk["attn_norm"][l])
        t[f"model.layers.{l}.post_attention_layernorm.weight"] = np.asarray(blk["mlp_norm"][l])
    t["model.norm.weight"] = np.asarray(params["final_norm"])
    if not cfg.tie_word_embeddings:
        t["lm_head.weight"] = np.asarray(params["lm_head"]).T

    if sharded:
        names_sorted = sorted(t)
        half = len(names_sorted) // 2
        shards = {"model-00001-of-00002.safetensors": names_sorted[:half],
                  "model-00002-of-00002.safetensors": names_sorted[half:]}
        weight_map = {}
        for fname, keys in shards.items():
            loader.write_safetensors(str(tmp_path / fname),
                                     {k: t[k] for k in keys})
            weight_map.update({k: fname for k in keys})
        (tmp_path / "model.safetensors.index.json").write_text(
            json.dumps({"weight_map": weight_map}))
    else:
        loader.write_safetensors(str(tmp_path / "model.safetensors"), t)

    hf_cfg = {
        "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads, "head_dim": cfg.head_dim,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": cfg.rope_theta,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "bos_token_id": cfg.bos_token_id,
        "eos_token_id": list(cfg.eos_token_ids),
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))
    return tmp_path


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = helpers.tiny_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a": np.arange(24, dtype=np.float32).reshape(4, 6),
        "b": np.ones((3, 2), dtype=ml_dtypes.bfloat16),
        "c": np.array([[-1, 2], [3, -4]], dtype=np.int8),
    }
    loader.write_safetensors(str(tmp_path / "x.safetensors"), tensors)
    back = loader.read_safetensors(str(tmp_path / "x.safetensors"))
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(np.asarray(back[k]), tensors[k])


@pytest.mark.parametrize("sharded", [False, True])
def test_load_model_dir_matches_source(tmp_path, tiny_setup, sharded):
    cfg, params = tiny_setup
    d = _write_hf_dir(tmp_path, cfg, params, sharded=sharded)
    cfg2, params2, tok = loader.load_model_dir(str(d), dtype=jnp.float32)
    assert tok is None
    assert cfg2.hidden_size == cfg.hidden_size
    assert cfg2.num_layers == cfg.num_layers

    tokens = jnp.array([[3, 17, 42, 9]], dtype=jnp.int32)
    a = llama.forward(params, cfg, tokens)
    b = llama.forward(params2, cfg2, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_load_quantized(tmp_path, tiny_setup):
    cfg, params = tiny_setup
    d = _write_hf_dir(tmp_path, cfg, params)
    cfg2, qparams, _ = loader.load_model_dir(str(d), quant_bits=8,
                                             dtype=jnp.float32)
    assert isinstance(qparams["blocks"]["wq"], QTensor)
    assert qparams["blocks"]["wq"].q.shape[0] == cfg.num_layers
    # norms stay full precision
    assert not isinstance(qparams["blocks"]["attn_norm"], QTensor)

    tokens = jnp.array([[3, 17, 42, 9]], dtype=jnp.int32)
    a = llama.forward(params, cfg, tokens)
    b = llama.forward(qparams, cfg2, tokens)
    # int8 per-channel should track the fp logits closely on a tiny model
    assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 0.2


def test_load_sharded_onto_mesh(tmp_path, tiny_setup):
    """device_put_fn places every leaf on its TP sharding at load time —
    the multi-chip loading path (parallel.sharded_device_put_fn)."""
    from gabby_tpu.parallel import make_mesh, sharded_device_put_fn

    cfg, params = tiny_setup  # tiny: num_kv_heads divides 4
    d = _write_hf_dir(tmp_path, cfg, params)
    mesh = make_mesh(dp=2, tp=4, devices=jax.devices()[:8])
    cfg2, sparams, _ = loader.load_model_dir(
        str(d), dtype=jnp.float32, quant_bits=8,
        device_put_fn=sharded_device_put_fn(mesh))

    wq = sparams["blocks"]["wq"]
    assert isinstance(wq, QTensor)
    # output axis of wq must be split over the 4-way "model" axis
    shard_shape = wq.q.sharding.shard_shape(wq.q.shape)
    assert shard_shape[-1] == wq.q.shape[-1] // 4
    # and compute must still be correct through the sharded tree
    tokens = jnp.array([[3, 17, 42, 9]], dtype=jnp.int32)
    a = llama.forward(params, cfg, tokens)
    b = llama.forward(sparams, cfg2, tokens)
    assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 0.2


def test_quantized_checkpoint_roundtrip(tmp_path, tiny_setup):
    """save_quantized -> load_model_dir reproduces the same logits as
    quantizing at load time (the quantize-once-serve-many path)."""
    cfg, params = tiny_setup
    (tmp_path / "src").mkdir()
    src = _write_hf_dir(tmp_path / "src", cfg, params)
    cfg1, q1, _ = loader.load_model_dir(str(src), quant_bits=8,
                                        dtype=jnp.float32)
    out = tmp_path / "quantized"
    loader.save_quantized(str(out), cfg1, q1, 8, src_dir=str(src))

    cfg2, q2, tok = loader.load_model_dir(str(out), dtype=jnp.float32)
    assert isinstance(q2["blocks"]["wq"], QTensor)
    assert q2["blocks"]["wq"].bits == 8
    tokens = jnp.array([[3, 17, 42, 9]], dtype=jnp.int32)
    a = llama.forward(q1, cfg1, tokens)
    b = llama.forward(q2, cfg2, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-2, rtol=2e-2)
    # max_seq override applies to prequantized checkpoints too
    cfg3, _, _ = loader.load_model_dir(str(out), max_seq_len=64)
    assert cfg3.max_seq_len == 64


def test_quantized_checkpoint_roundtrip_grouped_unembed(tmp_path,
                                                        tiny_setup):
    """The int4 group-scale unembed (GABBY_UNEMBED_BITS=4) survives
    save_quantized -> load: `group` is static pytree metadata and must be
    restored, or qlinear would misread the [G, V] scale as per-channel."""
    import os
    cfg, params = tiny_setup
    (tmp_path / "src").mkdir()
    src = _write_hf_dir(tmp_path / "src", cfg, params)
    os.environ["GABBY_UNEMBED_BITS"] = "4"
    try:
        cfg1, q1, _ = loader.load_model_dir(str(src), quant_bits=4,
                                            dtype=jnp.float32)
    finally:
        del os.environ["GABBY_UNEMBED_BITS"]
    head = q1["lm_head"]
    assert isinstance(head, QTensor) and head.bits == 4 and head.group > 0
    out = tmp_path / "quantized"
    loader.save_quantized(str(out), cfg1, q1, 4, src_dir=str(src))
    cfg2, q2, _ = loader.load_model_dir(str(out), dtype=jnp.float32)
    assert q2["lm_head"].bits == 4
    assert q2["lm_head"].group == head.group
    tokens = jnp.array([[3, 17, 42, 9]], dtype=jnp.int32)
    a = llama.forward(q1, cfg1, tokens)
    b = llama.forward(q2, cfg2, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-2, rtol=2e-2)


def test_load_quantized_legacy_bare_int_qbits(tmp_path):
    """Round-2 checkpoints stored qbits values as bare ints; the int4
    packing gate must not TypeError on them — legacy INT8 loads fine,
    legacy INT4 fails with the re-quantize message (its packed bytes are
    the old interleaved layout)."""
    import json

    from gabby_tpu import config as cfglib
    from gabby_tpu.loader import load_quantized, save_quantized
    from gabby_tpu.models import llama
    from gabby_tpu.ops import quant

    cfg = cfglib.tiny()
    params = quant.quantize_tree(
        llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32), 8)
    d = tmp_path / "ckpt"
    save_quantized(str(d), cfg, params, 8)
    meta_path = d / "gabby.json"
    meta = json.loads(meta_path.read_text())
    # rewrite as a round-2 file: bare int bits, no packing field
    meta["qbits"] = {k: (v[0] if isinstance(v, list) else v)
                     for k, v in meta["qbits"].items()}
    meta.pop("int4_packing", None)
    meta_path.write_text(json.dumps(meta))
    cfg2, params2, bits = load_quantized(str(d))  # int8: must load
    assert bits == 8

    meta["bits"] = 4  # legacy INT4: clear error, not a TypeError
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="re-run"):
        load_quantized(str(d))
