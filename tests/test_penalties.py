"""OpenAI sampling penalties: presence_penalty / frequency_penalty /
logit_bias applied on-device (generate.PenaltyState), exact against a
host-side reference, isolated from un-penalized batch neighbors, and
lifecycle-managed (the fast penalty-free program returns when the last
penalized request finishes)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from gabby_tpu import config as cfglib
from gabby_tpu.models import llama
from gabby_tpu.runtime import generate
from gabby_tpu.runtime.engine import Engine, EngineConfig, RequestError
from gabby_tpu.runtime.kv_cache import create_cache
from gabby_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = cfglib.tiny(max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    tok = Tokenizer.byte_fallback(cfg.vocab_size)
    return cfg, params, tok


def reference_penalized(cfg, params, tok, messages, max_tokens, *,
                        presence=0.0, frequency=0.0, bias=None, rep=1.0):
    """Greedy generation with OpenAI penalty math applied host-side, in
    the same operation order as generate.apply_penalties (repetition
    penalty FIRST on the raw logits — HF semantics, seen = prompt OR
    sampled — then bias/presence/frequency)."""
    from gabby_tpu.tokenizer import ChatFormat
    chat = ChatFormat(tok)
    ids = chat.prompt_ids(messages)
    stop = chat.stop_ids()
    cache = create_cache(cfg, 1, 128, dtype=jnp.float32)
    logits, cache = llama.prefill(
        params, cfg, jnp.asarray([ids], jnp.int32), cache)
    # OpenAI formula: c[j] counts tokens SAMPLED so far — never the prompt
    counts = np.zeros((cfg.vocab_size,), np.int32)
    prompt_mask = np.zeros((cfg.vocab_size,), bool)
    prompt_mask[ids] = True
    brow = np.zeros((cfg.vocab_size,), np.float32)
    for k, v in (bias or {}).items():
        brow[k] = v
    lg = np.asarray(logits[0, -1], np.float32)
    out = []
    pos = len(ids)
    while len(out) < max_tokens:
        seen = prompt_mask | (counts > 0)
        rl = np.where(seen,
                      np.where(lg > 0, lg / np.float32(rep),
                               lg * np.float32(rep)), lg)
        adj = (rl + brow
               - np.where(counts > 0, np.float32(presence), np.float32(0))
               - counts.astype(np.float32) * np.float32(frequency))
        t = int(np.argmax(adj))
        if t in stop:
            break
        out.append(t)
        counts[t] += 1
        logits, cache = llama.decode_step(
            params, cfg, jnp.asarray([t], jnp.int32),
            jnp.asarray([pos], jnp.int32), cache)
        lg = np.asarray(logits[0], np.float32)
        pos += 1
    return out


MSGS = [{"role": "user", "content": "repeat repeat repeat"}]


@pytest.mark.parametrize("presence,frequency,bias,rep", [
    (1.5, 0.0, None, 1.0),
    (0.0, 1.2, None, 1.0),
    (0.8, 0.7, {7: 4.0, 11: -6.0}, 1.0),
    (0.0, 0.0, None, 1.8),              # repetition_penalty alone
    (0.5, 0.3, {7: 4.0}, 1.3),          # all knobs together
])
def test_penalized_generation_matches_reference(setup, presence,
                                                frequency, bias, rep):
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=12,
                              cache_dtype="float32"))
    try:
        text, fin, _, _ = eng.generate_sync(
            MSGS, max_tokens=12, presence_penalty=presence,
            frequency_penalty=frequency, logit_bias=bias,
            repetition_penalty=rep)
        ref = reference_penalized(cfg, params, tok, MSGS, 12,
                                  presence=presence, frequency=frequency,
                                  bias=bias, rep=rep)
        assert text == tok.decode(ref), (
            f"penalized output diverged (p={presence}, f={frequency}, "
            f"rep={rep})")
    finally:
        eng.shutdown()


def test_logit_bias_forces_token(setup):
    """A +100 bias dominates any tiny-model logit: greedy must emit that
    token first (and, with no penalties, keep emitting it)."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=6, cache_dtype="float32"))
    try:
        forced = 33
        req = eng.submit(MSGS, max_tokens=4, logit_bias={forced: 100.0})
        fin = None
        while fin is None:
            _, fin = req.out.get(timeout=120)
        assert req.token_ids == [forced] * 4, req.token_ids
    finally:
        eng.shutdown()


def test_penalized_and_plain_requests_are_isolated(setup):
    """The module contract: a plain request batched WITH a penalized one
    must produce exactly its lone-request reference output."""
    import threading
    from test_engine import reference_generation
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=10,
                              cache_dtype="float32"))
    try:
        plain_msgs = [{"role": "user", "content": "plain neighbor"}]
        res = {}

        def run_pen():
            res["pen"] = eng.generate_sync(
                MSGS, max_tokens=10, presence_penalty=1.5,
                frequency_penalty=0.9)[0]

        def run_plain():
            res["plain"] = eng.generate_sync(plain_msgs, max_tokens=10)[0]

        ts = [threading.Thread(target=run_pen),
              threading.Thread(target=run_plain)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert res["plain"] == tok.decode(
            reference_generation(cfg, params, tok, plain_msgs, 10)), \
            "plain request perturbed by a penalized batch neighbor"
        assert res["pen"] == tok.decode(reference_penalized(
            cfg, params, tok, MSGS, 10, presence=1.5, frequency=0.9))
    finally:
        eng.shutdown()


def test_penalty_state_lifecycle(setup):
    """PenaltyState exists only while penalized requests are live: the
    engine returns to the penalty-free program (pstate None) after the
    last one finishes."""
    import time as _time
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=4, cache_dtype="float32"))
    try:
        assert eng._pstate is None
        eng.generate_sync(MSGS, max_tokens=4, presence_penalty=1.0)
        for _ in range(200):
            if eng._pstate is None:
                break
            _time.sleep(0.01)
        assert eng._pstate is None
        assert eng._pen_slots == set()
        # and plain requests after it still match the plain reference
        from test_engine import reference_generation
        out = eng.generate_sync(MSGS, max_tokens=4)[0]
        assert out == tok.decode(
            reference_generation(cfg, params, tok, MSGS, 4))
    finally:
        eng.shutdown()


def test_penalty_validation(setup):
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=1, max_seq=128,
                              cache_dtype="float32"))
    try:
        with pytest.raises(RequestError):
            eng.submit_ids([2, 3], presence_penalty=3.0)
        with pytest.raises(RequestError):
            eng.submit_ids([2, 3], frequency_penalty=-2.5)
        with pytest.raises(RequestError):
            eng.submit_ids([2, 3], logit_bias={5: 200.0})
        with pytest.raises(RequestError):
            eng.submit_ids([2, 3], logit_bias={10**9: 1.0})
        with pytest.raises(RequestError):
            eng.submit_ids([2, 3], logit_bias={"x": 1.0})
    finally:
        eng.shutdown()
