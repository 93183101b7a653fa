"""OpenAI `seed`: best-effort reproducible sampling. A seeded lane draws
from fold_in(PRNGKey(seed), position) instead of the engine-global key
stream, so its sampled output reproduces regardless of batch composition,
admission order, or how decode steps were fused into device calls."""

import threading

import jax
import jax.numpy as jnp
import pytest

from gabby_tpu import config as cfglib
from gabby_tpu.models import llama
from gabby_tpu.runtime.engine import Engine, EngineConfig, RequestError
from gabby_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = cfglib.tiny(max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    tok = Tokenizer.byte_fallback(cfg.vocab_size)
    return cfg, params, tok


MSGS = [{"role": "user", "content": "sample me"}]
SAMPLED = dict(max_tokens=10, temperature=1.0, top_k=0, top_p=1.0)


def _engine(cfg, params, tok, **kw):
    return Engine(cfg, params, tok,
                  EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                               default_max_tokens=10, cache_dtype="float32",
                               **kw))


def test_seeded_output_reproduces_across_batch_compositions(setup):
    """The load-bearing property: the same seeded request must produce
    byte-identical output (1) run alone, (2) run again later in a warm
    engine with advanced global key state, and (3) run concurrently with
    an unseeded neighbor that consumes global key draws."""
    cfg, params, tok = setup
    eng = _engine(cfg, params, tok)
    try:
        alone = eng.generate_sync(MSGS, seed=42, **SAMPLED)[0]
        again = eng.generate_sync(MSGS, seed=42, **SAMPLED)[0]
        assert again == alone, "seeded rerun diverged in a warm engine"

        res = {}

        def run_seeded():
            res["seeded"] = eng.generate_sync(MSGS, seed=42, **SAMPLED)[0]

        def run_noise():
            res["noise"] = eng.generate_sync(
                [{"role": "user", "content": "noise noise"}], **SAMPLED)[0]

        ts = [threading.Thread(target=run_noise),
              threading.Thread(target=run_seeded)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert res["seeded"] == alone, (
            "seeded output changed under concurrent batching")
    finally:
        eng.shutdown()


def test_different_seeds_diverge(setup):
    cfg, params, tok = setup
    eng = _engine(cfg, params, tok)
    try:
        outs = {eng.generate_sync(MSGS, seed=s, **SAMPLED)[0]
                for s in (1, 2, 3)}
        assert len(outs) >= 2, "three seeds produced identical samples"
    finally:
        eng.shutdown()


def test_seed_independent_of_engine_global_seed(setup):
    """Two engines with DIFFERENT global seeds must agree on a seeded
    request (the lane's stream depends only on the request seed)."""
    cfg, params, tok = setup
    eng_a = _engine(cfg, params, tok, seed=0)
    try:
        a = eng_a.generate_sync(MSGS, seed=7, **SAMPLED)[0]
    finally:
        eng_a.shutdown()
    eng_b = _engine(cfg, params, tok, seed=999)
    try:
        b = eng_b.generate_sync(MSGS, seed=7, **SAMPLED)[0]
    finally:
        eng_b.shutdown()
    assert a == b, "seeded output depends on the engine-global seed"


def test_unseeded_requests_unchanged_by_seeded_neighbor(setup):
    """Engine-global determinism contract for unseeded requests: a fresh
    engine replays the same unseeded sampled output whether or not a
    seeded request ran in another slot first is NOT guaranteed (key
    splits shift) — but the same submission ORDER must replay exactly."""
    cfg, params, tok = setup
    outs = []
    for _ in range(2):
        eng = _engine(cfg, params, tok, seed=5)
        try:
            eng.generate_sync(MSGS, seed=9, **SAMPLED)
            outs.append(eng.generate_sync(MSGS, **SAMPLED)[0])
        finally:
            eng.shutdown()
    assert outs[0] == outs[1], "global-stream replay diverged"


def test_seed_validation(setup):
    cfg, params, tok = setup
    eng = _engine(cfg, params, tok)
    try:
        with pytest.raises(RequestError):
            eng.submit_ids([2, 3], seed="not-an-int")
        big = eng.submit_ids([2, 3], seed=2**40 + 17, max_tokens=1)
        assert 0 <= big.seed < 2**31  # normalized, accepted
        fin = None
        while fin is None:
            _, fin = big.out.get(timeout=120)
    finally:
        eng.shutdown()
