import jax
import jax.numpy as jnp
import numpy as np

from gabby_tpu.ops import sampling


def _logits(vals):
    return jnp.asarray(np.array(vals, np.float32))[None, :]


def _sample_many(logits, n, **kw):
    b = logits.shape[0]
    outs = []
    for i in range(n):
        kwa = dict(
            temperature=kw.get("temperature", jnp.ones((b,))),
            top_k=kw.get("top_k", jnp.zeros((b,), jnp.int32)),
            top_p=kw.get("top_p", jnp.ones((b,))),
        )
        outs.append(np.asarray(
            sampling.sample(logits, jax.random.PRNGKey(i), **kwa)))
    return np.concatenate(outs)


def test_greedy_when_temperature_zero():
    logits = _logits([0.1, 5.0, 0.3, 0.2])
    out = _sample_many(logits, 5, temperature=jnp.zeros((1,)))
    assert (out == 1).all()


def test_top_k_one_is_argmax():
    logits = _logits([0.1, 0.2, 9.0, 0.4, 0.3])
    out = _sample_many(logits, 10, top_k=jnp.array([1], jnp.int32))
    assert (out == 2).all()


def test_top_k_restricts_support():
    logits = _logits([5.0, 4.9, 4.8, 4.7, -10.0, -10.0])
    out = _sample_many(logits, 40, top_k=jnp.array([3], jnp.int32))
    assert set(out.tolist()) <= {0, 1, 2}
    assert len(set(out.tolist())) > 1  # actually random


def test_top_p_tiny_is_argmax():
    logits = _logits([1.0, 1.1, 1.2, 8.0])
    out = _sample_many(logits, 10, top_p=jnp.array([0.01]))
    assert (out == 3).all()


def test_peaked_distribution_prefers_peak():
    logits = _logits([0.0] * 50 + [6.0])
    out = _sample_many(logits, 30)
    assert (out == 50).mean() > 0.8


def test_per_slot_mixed_settings():
    row = np.zeros(100, np.float32)
    row[7] = 9.0
    logits = jnp.asarray(np.stack([row, row]))
    out = sampling.sample(
        logits, jax.random.PRNGKey(0),
        temperature=jnp.array([0.0, 1.0]),
        top_k=jnp.array([0, 1], jnp.int32),
        top_p=jnp.array([1.0, 1.0]))
    assert np.asarray(out).tolist() == [7, 7]


def test_vocab_smaller_than_candidates():
    logits = _logits([0.0, 3.0, 1.0])  # V=3 < MAX_CANDIDATES
    out = _sample_many(logits, 20)
    assert set(out.tolist()) <= {0, 1, 2}
