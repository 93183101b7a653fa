"""Deterministic cross-feature soak: a fixed-seed randomized mix of every
serving feature submitted concurrently — sampled/greedy, penalties,
logit_bias, per-request seeds, stop sequences, priorities, deadlines,
cancellation — over dense+speculation and paged engines. Single-feature
tests each pin exact behavior; THIS test pins the interactions: every
request must terminate with a valid reason, invariants must hold, and
the engine must still serve afterwards."""

import queue
import random
import threading

import jax
import jax.numpy as jnp
import pytest

from gabby_tpu import config as cfglib
from gabby_tpu.models import llama
from gabby_tpu.runtime.engine import Engine, EngineConfig
from gabby_tpu.tokenizer import Tokenizer

VALID_REASONS = {"stop", "length", "cancelled", "deadline"}


@pytest.fixture(scope="module")
def setup():
    cfg = cfglib.tiny(max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    tok = Tokenizer.byte_fallback(cfg.vocab_size)
    return cfg, params, tok


def _random_kwargs(rng, vocab):
    kw = {"max_tokens": rng.randint(1, 8)}
    style = rng.random()
    if style < 0.4:
        kw["temperature"] = 0.0  # greedy
    else:
        kw["temperature"] = rng.choice([0.7, 1.0, 1.3])
        if rng.random() < 0.5:
            kw["top_k"] = rng.choice([4, 16, 64])
        if rng.random() < 0.5:
            kw["top_p"] = rng.choice([0.5, 0.9, 0.99])
        if rng.random() < 0.5:
            kw["seed"] = rng.randint(0, 2**31 - 1)
    if rng.random() < 0.3:
        kw["presence_penalty"] = rng.choice([-1.0, 0.5, 1.8])
    if rng.random() < 0.3:
        kw["frequency_penalty"] = rng.choice([-0.5, 0.4, 1.5])
    if rng.random() < 0.25:
        kw["repetition_penalty"] = rng.choice([0.8, 1.2, 1.9])
    if rng.random() < 0.25:
        kw["logit_bias"] = {rng.randint(2, vocab - 1): rng.choice(
            [-50.0, 10.0, 60.0]) for _ in range(rng.randint(1, 4))}
    if rng.random() < 0.3:
        kw["stop"] = [rng.choice(["a", "th", "e ", "zz"])]
    if rng.random() < 0.3:
        kw["priority"] = rng.randint(-2, 3)
    if rng.random() < 0.2:
        kw["deadline_s"] = rng.choice([0.05, 1.0, 30.0])
    if rng.random() < 0.2:
        kw["top_logprobs"] = rng.randint(1, 5)
    return kw


def _soak(eng, tok, vocab, rng, n_requests):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "repeat", "token", "mix", "load"]
    results = []
    lock = threading.Lock()

    def one(i, rng_local):
        # stay inside the 128-token window: the chat template costs 23
        # tokens and the byte-fallback tokenizer is 1 token/char, so 12
        # words x <= 8 chars ~= 95 content tokens tops
        prompt = " ".join(rng_local.choices(words,
                                            k=rng_local.randint(1, 12)))
        kw = _random_kwargs(rng_local, vocab)
        msgs = [{"role": "user", "content": prompt}]
        try:
            req = eng.submit(msgs, **kw)
        except Exception as e:  # a reject must FAIL the soak, not hang it
            with lock:
                results.append((i, None, "", f"rejected: {e}", kw))
            return
        if rng_local.random() < 0.2:
            eng.cancel(req)
        text, fin = [], None
        while fin is None:
            d, fin = req.out.get(timeout=300)
            if d:
                text.append(d)
        with lock:
            results.append((i, req, "".join(text), fin, kw))

    # one shared rng for parameter choice would race across threads;
    # give each request its own child rng derived deterministically
    threads = []
    for i in range(n_requests):
        child = random.Random(rng.randint(0, 2**31))
        threads.append(threading.Thread(target=one, args=(i, child)))
        threads[-1].start()
        if rng.random() < 0.5:
            threads[-1].join(timeout=120)  # mix serial + concurrent
    for t in threads:
        t.join(timeout=300)
    assert len(results) == n_requests, "some requests never finished"

    for i, req, text, fin, kw in results:
        assert not fin.startswith("rejected"), (i, fin, kw)
        assert fin in VALID_REASONS or fin.startswith("error"), (i, fin)
        if fin.startswith("error"):
            # the only error this soak can legally produce is queue-side
            # deadline expiry
            assert "deadline" in fin, (i, fin, kw)
            continue
        assert len(req.token_ids) <= kw["max_tokens"], (i, kw)
        assert req.completion_tokens == len(req.token_ids)
        assert len(req.token_logprobs) == len(req.token_ids)
        if kw.get("top_logprobs"):
            assert len(req.token_top) == len(req.token_ids)
            assert all(len(row) == kw["top_logprobs"]
                       for row in req.token_top), i
    # the engine survived and still serves
    out, fin, _, _ = eng.generate_sync(
        [{"role": "user", "content": "after the storm"}], max_tokens=3)
    assert fin in ("stop", "length")


def test_soak_dense_with_speculation(setup):
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=4, max_seq=128, steps_per_call=4,
                              steps_per_call_busy=2, default_max_tokens=8,
                              cache_dtype="float32", speculate_tokens=4,
                              spf_age_limit=2.0))
    try:
        _soak(eng, tok, cfg.vocab_size, random.Random(0xF00D), 28)
    finally:
        eng.shutdown()


def test_soak_paged(setup):
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=4, max_seq=128, steps_per_call=4,
                              steps_per_call_busy=2, default_max_tokens=8,
                              cache_dtype="float32", paged_pages=1 + 4 * 8,
                              page_size=16, spf_age_limit=2.0))
    try:
        _soak(eng, tok, cfg.vocab_size, random.Random(0xBEEF), 28)
    finally:
        eng.shutdown()
