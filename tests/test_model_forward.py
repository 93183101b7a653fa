"""Golden-logit and self-consistency tests for the Llama forward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gabby_tpu import config as cfglib
from gabby_tpu.models import llama
from gabby_tpu.runtime.kv_cache import create_cache
from tests import helpers


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = helpers.tiny_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def test_forward_matches_hf_torch(tiny_setup):
    import torch

    cfg, params = tiny_setup
    model = helpers.torch_model_from_params(cfg, params)
    tokens = np.array([[3, 17, 42, 9, 101, 7, 55, 2],
                       [200, 5, 6, 80, 81, 82, 83, 84]], dtype=np.int32)
    ours = np.asarray(llama.forward(params, cfg, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)


def test_forward_matches_hf_torch_untied_and_rope_scaling():
    """Exercise the llama3 rope-scaling path + untied lm_head vs HF."""
    import torch
    from transformers import LlamaForCausalLM

    cfg = helpers.tiny_cfg(
        rope_scaling=cfglib.RopeScaling(
            factor=8.0, low_freq_factor=1.0, high_freq_factor=4.0,
            original_max_position_embeddings=32),
        rope_theta=500000.0,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    hf_cfg = helpers.hf_config_from(cfg)
    hf_cfg.rope_scaling = {
        "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
        "high_freq_factor": 4.0, "original_max_position_embeddings": 32,
    }
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    # reuse weight-copy helper by patching config on the fly
    sd = helpers.torch_model_from_params(cfg, params).state_dict()
    model.load_state_dict(sd)

    tokens = np.arange(40, dtype=np.int32)[None, :] % cfg.vocab_size
    ours = np.asarray(llama.forward(params, cfg, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-4, rtol=2e-3)


def test_prefill_then_decode_matches_full_forward(tiny_setup):
    """prefill(prompt) + decode steps must reproduce the no-cache forward."""
    cfg, params = tiny_setup
    prompt = jnp.array([[3, 17, 42, 9, 101]], dtype=jnp.int32)
    extra = [7, 55, 2, 19]
    full = jnp.concatenate(
        [prompt, jnp.array([extra], dtype=jnp.int32)], axis=1)

    golden = llama.forward(params, cfg, full)  # [1, 9, V]

    cache = create_cache(cfg, batch=1, max_seq=16, dtype=jnp.float32)
    logits, cache = llama.prefill(params, cfg, prompt, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(golden[:, :5]),
                               atol=1e-4, rtol=1e-3)

    pos = prompt.shape[1]
    for i, tok in enumerate(extra):
        step_logits, cache = llama.decode_step(
            params, cfg, jnp.array([tok], dtype=jnp.int32),
            jnp.array([pos + i], dtype=jnp.int32), cache)
        np.testing.assert_allclose(
            np.asarray(step_logits[0]), np.asarray(golden[0, pos + i]),
            atol=1e-4, rtol=1e-3)


def test_chunked_prefill_matches_full_prefill(tiny_setup):
    cfg, params = tiny_setup
    tokens = jnp.array([[3, 17, 42, 9, 101, 7, 55, 2]], dtype=jnp.int32)

    cache_a = create_cache(cfg, 1, 16, dtype=jnp.float32)
    logits_a, cache_a = llama.prefill(params, cfg, tokens, cache_a)

    cache_b = create_cache(cfg, 1, 16, dtype=jnp.float32)
    l1, cache_b = llama.prefill(params, cfg, tokens[:, :4], cache_b, offset=0)
    l2, cache_b = llama.prefill(params, cfg, tokens[:, 4:], cache_b, offset=4)

    np.testing.assert_allclose(np.asarray(l1), np.asarray(logits_a[:, :4]),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(logits_a[:, 4:]),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cache_a.k), np.asarray(cache_b.k),
                               atol=1e-5)


def test_decode_with_mixed_slot_positions(tiny_setup):
    """Slots at different sequence positions decode independently and match
    single-slot decoding — the invariant continuous batching relies on."""
    cfg, params = tiny_setup
    p1 = jnp.array([[3, 17, 42]], dtype=jnp.int32)
    p2 = jnp.array([[200, 5, 6, 80, 81]], dtype=jnp.int32)

    # independent single-slot runs
    def single(prompt):
        cache = create_cache(cfg, 1, 16, dtype=jnp.float32)
        _, cache = llama.prefill(params, cfg, prompt, cache)
        logits, _ = llama.decode_step(
            params, cfg, jnp.array([9], dtype=jnp.int32),
            jnp.array([prompt.shape[1]], dtype=jnp.int32), cache)
        return np.asarray(logits[0])

    g1, g2 = single(p1), single(p2)

    # batched: two slots, different lengths (right-padded prefill per slot)
    cache = create_cache(cfg, 2, 16, dtype=jnp.float32)
    # prefill each prompt into its own slot row by running batch=2 with
    # padded prompts; pad tokens write garbage k/v beyond each length, but
    # decode masks by position so they are never attended.
    padded = jnp.array([[3, 17, 42, 0, 0], [200, 5, 6, 80, 81]], jnp.int32)
    _, cache = llama.prefill(params, cfg, padded, cache)
    # overwrite slot-0 garbage positions by decoding from position 3
    logits, _ = llama.decode_step(
        params, cfg, jnp.array([9, 9], dtype=jnp.int32),
        jnp.array([3, 5], dtype=jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(logits[0]), g1, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logits[1]), g2, atol=1e-4, rtol=1e-3)


def test_int8_kv_cache_close_to_fp(tiny_setup):
    cfg, params = tiny_setup
    prompt = jnp.array([[3, 17, 42, 9, 101, 7]], dtype=jnp.int32)

    cache_fp = create_cache(cfg, 1, 16, dtype=jnp.float32)
    _, cache_fp = llama.prefill(params, cfg, prompt, cache_fp)
    fp_logits, _ = llama.decode_step(
        params, cfg, jnp.array([2], jnp.int32), jnp.array([6], jnp.int32), cache_fp)

    cache_q = create_cache(cfg, 1, 16, quantized=True)
    _, cache_q = llama.prefill(params, cfg, prompt, cache_q)
    q_logits, _ = llama.decode_step(
        params, cfg, jnp.array([2], jnp.int32), jnp.array([6], jnp.int32), cache_q)

    # int8 KV introduces small noise; logits must stay close in argmax + value
    assert np.argmax(np.asarray(fp_logits[0])) == np.argmax(np.asarray(q_logits[0]))
    err = np.max(np.abs(np.asarray(fp_logits) - np.asarray(q_logits)))
    scale = np.max(np.abs(np.asarray(fp_logits)))
    assert err < 0.1 * scale + 0.1


# ---- fused qkv / gate-up projections (VERDICT r2 item 1) -------------------


@pytest.mark.parametrize("bits", [None, 8, 4])
def test_fused_projections_match_unfused(bits):
    """llama.fuse_projections must be a pure layout change: prefill logits
    and a few decode steps agree with the unfused tree for dense, INT8 and
    INT4 (packed) weights."""
    import numpy as np
    from gabby_tpu.ops import quant
    from gabby_tpu.runtime.kv_cache import create_cache

    cfg = cfglib.tiny(max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(11),
                               dtype=jnp.float32)
    if bits:
        params = quant.quantize_tree(params, bits)
    fused = llama.fuse_projections(params)
    assert "wqkv" in fused["blocks"] and "wq" not in fused["blocks"]
    assert "w_gup" in fused["blocks"] and "w_gate" not in fused["blocks"]

    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 2, 200,
                              jnp.int32)
    ref = llama.forward(params, cfg, toks)
    got = llama.forward(fused, cfg, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # decode steps through both trees stay in lockstep
    c_ref = create_cache(cfg, 2, 64, dtype=jnp.float32)
    c_f = create_cache(cfg, 2, 64, dtype=jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    pos = jnp.asarray([0, 0], jnp.int32)
    for _ in range(3):
        lr, c_ref = llama.decode_step(params, cfg, t, pos, c_ref)
        lf, c_f = llama.decode_step(fused, cfg, t, pos, c_f)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                                   rtol=2e-5, atol=2e-5)
        t = jnp.argmax(lr, -1).astype(jnp.int32)
        pos = pos + 1


def test_fused_projections_rejected_under_model_sharding():
    from gabby_tpu.parallel import make_mesh, shard_params
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg = cfglib.tiny(max_seq_len=32, num_kv_heads=2, num_heads=4)
    params = llama.fuse_projections(
        llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32))
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="unfused"):
        shard_params(params, mesh)
