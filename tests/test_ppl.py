"""Perplexity harness + quantization quality-delta gates (tiny model).

BASELINE.json's gates (INT8 <= 0.1 ppl, INT4 <= 0.5 ppl vs BF16 on
WikiText-2) are relative deltas on the same data; with no network the same
protocol runs on a synthetic corpus. A tiny RANDOM model's deltas are not
the 1B model's, so the gates here are machinery checks with loose
factors — the real gates run via `python -m gabby_tpu.eval.ppl` against a
downloaded model + corpus."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gabby_tpu import config as cfglib
from gabby_tpu.eval import ppl_from_tokens
from gabby_tpu.models import llama
from gabby_tpu.ops import quant


@pytest.fixture(scope="module")
def setup():
    cfg = cfglib.tiny(max_seq_len=256)
    params = llama.init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    rng = np.random.RandomState(0)
    stream = rng.randint(0, cfg.vocab_size, size=4096).astype(np.int32)
    return cfg, params, stream


def test_ppl_finite_and_reasonable(setup):
    cfg, params, stream = setup
    ppl = ppl_from_tokens(params, cfg, stream, seq_len=64, batch=4)
    assert np.isfinite(ppl)
    # random model on random tokens: ppl near vocab size, not astronomically off
    assert 1.0 < ppl < cfg.vocab_size * 50


def test_ppl_partial_tail_batch(setup):
    cfg, params, stream = setup
    # 5 windows with batch 4 -> one full call + a tail call of 1
    ppl = ppl_from_tokens(params, cfg, stream[:64 * 5], seq_len=64, batch=4)
    ref = ppl_from_tokens(params, cfg, stream[:64 * 5], seq_len=64, batch=5)
    np.testing.assert_allclose(ppl, ref, rtol=1e-4)


def test_fp8_activation_ppl_delta(setup):
    """FP8 activations (BASELINE config 5) must barely move perplexity —
    tighter than INT4's weight gate since e4m3 has ~2 decimal digits."""
    cfg, params, stream = setup
    kw = dict(seq_len=64, batch=4, max_windows=16)
    base = ppl_from_tokens(params, cfg, stream, **kw)
    quant.set_act_fp8(True)
    try:
        # fresh trace: the flag is read at trace time
        jax.clear_caches()
        p_fp8 = ppl_from_tokens(params, cfg, stream, **kw)
    finally:
        quant.set_act_fp8(False)
        jax.clear_caches()
    assert abs(p_fp8 - base) / base < 0.05, f"fp8 ppl delta {p_fp8} vs {base}"


def test_quantization_ppl_deltas(setup):
    """INT8 must barely move ppl; INT4 may move it more but boundedly."""
    cfg, params, stream = setup
    kw = dict(seq_len=64, batch=4, max_windows=16)
    base = ppl_from_tokens(params, cfg, stream, **kw)
    p8 = ppl_from_tokens(quant.quantize_tree(params, 8), cfg, stream, **kw)
    p4 = ppl_from_tokens(quant.quantize_tree(params, 4), cfg, stream, **kw)
    d8, d4 = abs(p8 - base), abs(p4 - base)
    # relative-gate shape: int8 tight, int4 looser but bounded
    assert d8 / base < 0.02, f"int8 ppl delta {d8} vs {base}"
    assert d4 / base < 0.15, f"int4 ppl delta {d4} vs {base}"
    assert d8 <= d4 * 1.5 + 1e-3  # int8 never meaningfully worse than int4


def test_int4_unembed_ppl_delta(setup):
    """INT4 unembed with group-wise scales (quantize_tree unembed_bits=4):
    the quality cost over the default INT8 unembed must stay small, and
    the group scales must beat plain per-channel int4 on the same table —
    the measured reason per-channel int4 logits were rejected in round 2."""
    cfg, params, stream = setup
    kw = dict(seq_len=64, batch=4, max_windows=16)
    g = cfg.hidden_size // 4
    base = ppl_from_tokens(quant.quantize_tree(params, 4), cfg, stream, **kw)
    p4g = ppl_from_tokens(
        quant.quantize_tree(params, 4, unembed_bits=4, unembed_group=g),
        cfg, stream, **kw)
    p4pc = ppl_from_tokens(
        quant.quantize_tree(params, 4, unembed_bits=4,
                            unembed_group=cfg.hidden_size),  # 1 group ≈ pc
        cfg, stream, **kw)
    assert abs(p4g - base) / base < 0.10, (base, p4g)
    assert abs(p4g - base) <= abs(p4pc - base) + 0.02 * base, (
        base, p4g, p4pc)


def test_w4a8_decode_nll_delta(setup):
    """W4A8 (int8 activations on the int4 kernel path) is decode-only;
    gate its quality with teacher-forced decode NLL on the tiny model:
    the delta vs plain int4 decode must stay small."""
    import os
    from gabby_tpu.ops import pallas as pk
    from gabby_tpu.runtime import generate as gen
    from gabby_tpu.runtime.kv_cache import create_cache
    cfg, params, stream = setup
    # dims must clear the kernel gates
    cfg = cfglib.tiny(num_heads=8, num_kv_heads=4, head_dim=64,
                      hidden_size=256, intermediate_size=256, vocab_size=256,
                      max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.bfloat16)
    qp = quant.quantize_tree(params, 4)
    toks = (stream[:96] % cfg.vocab_size).astype(np.int32)

    def decode_nll():
        from gabby_tpu.models import llama as L
        cache = create_cache(cfg, 1, 128, quantized=True)
        logits, cache = L.prefill_slot(
            qp, cfg, jnp.asarray(toks[:16]), jnp.int32(16), jnp.int32(0),
            jnp.int32(0), cache)
        nll = 0.0
        cur = logits
        for i in range(16, 64):
            nll -= float(gen.token_logprob(cur[None],
                                           jnp.asarray([toks[i]]))[0])
            lg, cache = L.decode_step(qp, cfg, jnp.asarray([toks[i]]),
                                      jnp.asarray([i], jnp.int32), cache)
            cur = lg[0]
        return nll / 48

    pk.set_kernels(True)
    try:
        base = decode_nll()
        os.environ["GABBY_W4A8"] = "1"
        jax.clear_caches()
        w4a8 = decode_nll()
    finally:
        os.environ.pop("GABBY_W4A8", None)
        pk.set_kernels(None)
        jax.clear_caches()
    assert abs(w4a8 - base) / max(base, 1e-6) < 0.05, (base, w4a8)


def test_s8_attention_decode_nll_delta(setup):
    """s8 MXU dots inside the quantized-cache attention kernel
    (pallas/attention._flash_step use_s8): teacher-forced decode NLL must
    stay within a small delta of the bf16-dot kernel — the added
    activation quantization error must be the same order as the INT8 KV
    quantization it rides on."""
    import os
    from gabby_tpu.ops import pallas as pk
    from gabby_tpu.runtime import generate as gen
    from gabby_tpu.runtime.kv_cache import create_cache
    cfg, params, stream = setup
    cfg = cfglib.tiny(num_heads=8, num_kv_heads=4, head_dim=64,
                      hidden_size=256, intermediate_size=256, vocab_size=256,
                      max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.bfloat16)
    qp = quant.quantize_tree(params, 4)
    toks = (stream[:96] % cfg.vocab_size).astype(np.int32)

    def decode_nll():
        from gabby_tpu.models import llama as L
        cache = create_cache(cfg, 1, 128, quantized=True)
        logits, cache = L.prefill_slot(
            qp, cfg, jnp.asarray(toks[:16]), jnp.int32(16), jnp.int32(0),
            jnp.int32(0), cache)
        nll = 0.0
        cur = logits
        for i in range(16, 64):
            nll -= float(gen.token_logprob(cur[None],
                                           jnp.asarray([toks[i]]))[0])
            lg, cache = L.decode_step(qp, cfg, jnp.asarray([toks[i]]),
                                      jnp.asarray([i], jnp.int32), cache)
            cur = lg[0]
        return nll / 48

    pk.set_kernels(True)
    try:
        os.environ["GABBY_ATTN_S8"] = "0"
        base = decode_nll()
        os.environ["GABBY_ATTN_S8"] = "1"
        jax.clear_caches()
        s8 = decode_nll()
    finally:
        os.environ.pop("GABBY_ATTN_S8", None)
        pk.set_kernels(None)
        jax.clear_caches()
    assert abs(s8 - base) / max(base, 1e-6) < 0.05, (base, s8)


def test_padded_unembed_matches_unpadded():
    """quantize_unembed_table's vocab padding (wide grouped-kernel tiles)
    must be invisible: logits on the true vocab identical, junk columns
    sliced before sampling (llama._unembed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gabby_tpu import config as cfglib
    from gabby_tpu.models import llama
    from gabby_tpu.ops import quant

    cfg = cfglib.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    q_pad = quant.quantize_tree(params, 4, unembed_bits=4, unembed_group=16)
    assert q_pad["lm_head"].q.shape[1] == 2048  # padded from 256
    q_nopad = dict(q_pad)
    q_nopad["lm_head"] = quant.quantize_unembed_table(
        params["lm_head"], bits=4, group=16, pad_to=0)
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.hidden_size))
    a = llama._unembed(q_pad, cfg, h)
    b = llama._unembed(q_nopad, cfg, h)
    assert a.shape == (1, 3, cfg.vocab_size)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
