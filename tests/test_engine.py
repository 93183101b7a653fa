"""Continuous-batching engine tests (tiny model, CPU backend).

The correctness contract: whatever the batch composition, each request's
output must match what a lone request with the same sampling settings
produces (slot isolation + shape-stable programs)."""

import queue

import jax
import jax.numpy as jnp
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


@pytest.fixture()
def engine(setup):
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=4, max_seq=128, steps_per_call=4,
                              default_max_tokens=8, cache_dtype="float32"))
    yield eng
    eng.shutdown()


MSGS = [{"role": "system", "content": "sys"},
        {"role": "user", "content": "hello"}]


def reference_generation(cfg, params, tok, messages, max_tokens):
    """Single-request greedy generation via the raw primitives."""
    from gabby_tpu.tokenizer import ChatFormat
    chat = ChatFormat(tok)
    ids = chat.prompt_ids(messages)
    stop = chat.stop_ids()
    cache = create_cache(cfg, 1, 128, dtype=jnp.float32)
    logits, cache = llama.prefill(
        params, cfg, jnp.asarray([ids], jnp.int32), cache)
    out = []
    t = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    pos = len(ids)
    while len(out) < max_tokens:
        if int(t[0]) in stop:
            break
        out.append(int(t[0]))
        logits, cache = llama.decode_step(
            params, cfg, t, jnp.asarray([pos], jnp.int32), cache)
        t = jnp.argmax(logits, -1).astype(jnp.int32)
        pos += 1
    return out


def test_single_request_matches_reference(engine, setup):
    cfg, params, tok = setup
    text, fin, _, n = engine.generate_sync(MSGS, max_tokens=6)
    ref_ids = reference_generation(cfg, params, tok, MSGS, 6)
    assert fin in ("stop", "length")
    assert n == len(ref_ids) or fin == "stop"
    assert text == tok.decode(ref_ids)


def test_concurrent_requests_are_isolated(engine, setup):
    cfg, params, tok = setup
    prompts = [
        [{"role": "user", "content": "aaa"}],
        [{"role": "user", "content": "bb"}],
        [{"role": "user", "content": "cccc dd"}],
        [{"role": "user", "content": "e"}],
        [{"role": "user", "content": "ff gg"}],   # > slots: must queue
        [{"role": "user", "content": "hh"}],
    ]
    import threading
    results = [None] * len(prompts)

    def run(i):
        results[i] = engine.generate_sync(prompts[i], max_tokens=5)[0]

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, msgs in enumerate(prompts):
        ref = tok.decode(reference_generation(cfg, params, tok, msgs, 5))
        assert results[i] == ref, f"request {i} diverged under batching"


def test_streaming_deltas_concatenate(engine):
    req = engine.submit(MSGS, max_tokens=5)
    deltas, fins = [], []
    while True:
        d, f = req.out.get(timeout=60)
        if d:
            deltas.append(d)
        if f is not None:
            fins.append(f)
            break
    whole = engine.generate_sync(MSGS, max_tokens=5)[0]
    assert "".join(deltas) == whole
    assert fins == ["stop"] or fins == ["length"]


def test_max_tokens_cap(engine):
    text, fin, _, n = engine.generate_sync(MSGS, max_tokens=3)
    if fin == "length":
        assert n == 3
    else:
        assert fin == "stop" and n <= 3


def test_long_prompt_chunked_prefill(setup):
    """A prompt spanning several prefill buckets (16/64/256/512) must give
    the same continuation as the unchunked reference prefill."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=1024, steps_per_call=4,
                              default_max_tokens=4, cache_dtype="float32"))
    try:
        long_text = " ".join(f"w{i}" for i in range(150))  # ~600+ tokens
        msgs = [{"role": "user", "content": long_text}]
        from gabby_tpu.tokenizer import ChatFormat
        n_prompt = len(ChatFormat(tok).prompt_ids(msgs))
        assert n_prompt > 512, "prompt must span multiple chunks"
        text, fin, _, _ = eng.generate_sync(msgs, max_tokens=4)
        ref_ids = reference_generation_long(cfg, params, tok, msgs, 4)
        assert text == tok.decode(ref_ids)
    finally:
        eng.shutdown()


def reference_generation_long(cfg, params, tok, messages, max_tokens):
    from gabby_tpu.tokenizer import ChatFormat
    chat = ChatFormat(tok)
    ids = chat.prompt_ids(messages)
    stop = chat.stop_ids()
    cache = create_cache(cfg, 1, 1024, dtype=jnp.float32)
    logits, cache = llama.prefill(
        params, cfg, jnp.asarray([ids], jnp.int32), cache)
    out = []
    t = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    pos = len(ids)
    while len(out) < max_tokens:
        if int(t[0]) in stop:
            break
        out.append(int(t[0]))
        logits, cache = llama.decode_step(
            params, cfg, t, jnp.asarray([pos], jnp.int32), cache)
        t = jnp.argmax(logits, -1).astype(jnp.int32)
        pos += 1
    return out


def test_partial_burst_admission_with_live_decode(setup):
    """Masked batched admission: with one slot actively decoding, several
    same-schedule requests must batch-prefill into the FREE slots without
    perturbing the live slot's stream, and all outputs must match the
    lone-request reference (the lane-masked prefill_batch_chunk path)."""
    import threading
    import time as _time
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=4, max_seq=128, steps_per_call=2,
                              default_max_tokens=6, cache_dtype="float32"))
    try:
        live = [{"role": "user", "content": "keep decoding for a while"}]
        burst = [[{"role": "user", "content": f"burst {i}"}]
                 for i in range(3)]
        for attempt in range(3):
            results = {}

            def run(name, msgs, n):
                results[name] = eng.generate_sync(msgs, max_tokens=n)[0]

            t0 = threading.Thread(target=run, args=("live", live, 40))
            t0.start()
            for _ in range(600):
                if eng.stats_snapshot()["active_slots"] >= 1:
                    break
                _time.sleep(0.01)
            ts = [threading.Thread(target=run, args=(f"b{i}", m, 6))
                  for i, m in enumerate(burst)]
            for t in ts:
                t.start()
            t0.join(timeout=180)
            for t in ts:
                t.join(timeout=180)

            assert results["live"] == tok.decode(
                reference_generation(cfg, params, tok, live, 40)), \
                "live slot corrupted by partial-burst admission"
            for i, m in enumerate(burst):
                ref = tok.decode(reference_generation(cfg, params, tok, m, 6))
                assert results[f"b{i}"] == ref, f"burst request {i} diverged"
            if eng.stats["burst_admissions"] >= 2:
                break
        # the masked batched path (free subset, live decode) must have
        # actually triggered at least once across attempts
        assert eng.stats["burst_admissions"] >= 2, eng.stats
    finally:
        eng.shutdown()


def test_chunked_prefill_during_concurrent_decode(setup):
    """ADVICE round-1 (high): admitting a multi-chunk (>512-token) prompt
    while another slot decodes must not corrupt the admitting slot's
    already-prefilled KV rows (decode_step writes every slot's fresh k/v at
    positions[i]; free slots' positions are parked at max_seq-1 so those
    writes can never land inside a prompt being prefilled)."""
    import threading
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=1024, steps_per_call=2,
                              default_max_tokens=4, cache_dtype="float32"))
    try:
        short = [{"role": "user", "content": "keep decoding please"}]
        long_text = " ".join(f"w{i}" for i in range(150))  # > 512 tokens
        long = [{"role": "user", "content": long_text}]
        from gabby_tpu.tokenizer import ChatFormat
        assert len(ChatFormat(tok).prompt_ids(long)) > 512

        results = {}

        def run_short():
            # long generation -> still decoding when the long prompt admits
            results["short"] = eng.generate_sync(short, max_tokens=48)[0]

        def run_long():
            results["long"] = eng.generate_sync(long, max_tokens=4)[0]

        t1 = threading.Thread(target=run_short)
        t1.start()
        # wait until the short request occupies a slot and decodes
        for _ in range(600):
            if eng.stats_snapshot()["active_slots"] >= 1:
                break
            import time
            time.sleep(0.01)
        t2 = threading.Thread(target=run_long)
        t2.start()
        t1.join(timeout=180)
        t2.join(timeout=180)

        ref_long = tok.decode(
            reference_generation_long(cfg, params, tok, long, 4))
        ref_short = tok.decode(
            reference_generation_long(cfg, params, tok, short, 48))
        assert results["long"] == ref_long, "long prompt corrupted by decode"
        assert results["short"] == ref_short, "decode stream corrupted"
    finally:
        eng.shutdown()


def test_decode_never_touches_prefilled_rows_of_parked_slot(setup):
    """The mechanism behind the fix: decode_step writes every slot's fresh
    k/v at positions[i], so an inactive (admitting/free) slot's position
    must be PARKED at max_seq-1 — any other value lets concurrent decode
    clobber rows a prefill just wrote. Asserts rows [0, n) of a prefilled
    slot survive a decode burst bit-exactly, and that the engine actually
    parks freed slots there."""
    import numpy as np
    cfg, params, tok = setup
    max_seq = 128
    cache = create_cache(cfg, 2, max_seq, dtype=jnp.float32)
    # prefill slot 1 with a 16-token chunk (sentinel content)
    toks = jnp.asarray(list(range(2, 18)), jnp.int32)
    _, cache = llama.prefill_slot(params, cfg, toks, jnp.int32(16),
                                  jnp.int32(1), jnp.int32(0), cache)
    before_k = np.asarray(cache.k[:, 1, :, :16])
    before_v = np.asarray(cache.v[:, 1, :, :16])

    # slot 0 decodes; slot 1 inactive with position parked at max_seq-1
    sstate = generate.SamplingState.greedy(2)
    tokens = jnp.asarray([7, 0], jnp.int32)
    positions = jnp.asarray([40, max_seq - 1], jnp.int32)
    active = jnp.asarray([True, False])
    _, _, _, _, _, _, cache, _, _, _, _ = generate.decode_loop(
        params, cfg, tokens, positions, active, cache, sstate, 4)
    assert np.array_equal(np.asarray(cache.k[:, 1, :, :16]), before_k)
    assert np.array_equal(np.asarray(cache.v[:, 1, :, :16]), before_v)

    # and the regression scenario: a STALE position inside the prompt range
    # does clobber (this is what round 1 shipped) — guards the test itself
    cache2 = create_cache(cfg, 2, max_seq, dtype=jnp.float32)
    _, cache2 = llama.prefill_slot(params, cfg, toks, jnp.int32(16),
                                   jnp.int32(1), jnp.int32(0), cache2)
    ref_k = np.asarray(cache2.k[:, 1, :, :16])
    _, _, _, _, _, _, cache2, _, _, _, _ = generate.decode_loop(
        params, cfg, tokens, jnp.asarray([40, 3], jnp.int32), active,
        cache2, generate.SamplingState.greedy(2), 4)
    assert not np.array_equal(np.asarray(cache2.k[:, 1, :, :16]), ref_k), \
        "stale position no longer clobbers? decode write path changed"

    # engine parks freed/initial slots at max_seq-1
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=2,
                              default_max_tokens=2, cache_dtype="float32"))
    try:
        assert np.all(np.asarray(eng._positions) == 127)
        eng.generate_sync(MSGS, max_tokens=2)
        assert np.all(np.asarray(eng._positions) == 127), \
            "finished slot's position not re-parked"
    finally:
        eng.shutdown()


def test_prefix_reuse_across_requests(setup):
    """Two requests sharing a long token prefix: the second must admit by
    COPYING the first slot's resident KV rows (prefix_hits) and still
    produce exactly the lone-request reference output."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=1024, steps_per_call=4,
                              default_max_tokens=4, cache_dtype="float32"))
    try:
        shared = " ".join(f"ctx{i}" for i in range(40))  # ~200+ tokens
        m1 = [{"role": "system", "content": shared},
              {"role": "user", "content": "first question"}]
        m2 = [{"role": "system", "content": shared},
              {"role": "user", "content": "second, different question"}]
        out1 = eng.generate_sync(m1, max_tokens=4)[0]
        out2 = eng.generate_sync(m2, max_tokens=4)[0]
        assert eng.stats["prefix_hits"] >= 1, eng.stats
        assert eng.stats["prefix_tokens_reused"] >= 64
        ref1 = tok.decode(reference_generation_long(cfg, params, tok, m1, 4))
        ref2 = tok.decode(reference_generation_long(cfg, params, tok, m2, 4))
        assert out1 == ref1
        assert out2 == ref2, "prefix-reused request diverged from reference"
        # a third request with an UNRELATED prompt must not be affected
        m3 = [{"role": "user", "content": "totally unrelated"}]
        assert (eng.generate_sync(m3, max_tokens=4)[0]
                == tok.decode(reference_generation_long(cfg, params, tok,
                                                        m3, 4)))
    finally:
        eng.shutdown()


def test_token_logprobs_exact(setup):
    """Request.token_logprobs must equal log-softmax of the reference
    forward's logits at each greedily chosen token."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=5, cache_dtype="float32"))
    try:
        req = eng.submit(MSGS, max_tokens=5)
        fin = None
        while fin is None:
            _, fin = req.out.get(timeout=120)
        assert len(req.token_logprobs) == len(req.token_ids) >= 1

        # reference: replay the stream and compute log-softmax manually
        from gabby_tpu.tokenizer import ChatFormat
        import jax.scipy.special as jsp
        chat = ChatFormat(tok)
        ids = chat.prompt_ids(MSGS)
        cache = create_cache(cfg, 1, 128, dtype=jnp.float32)
        logits, cache = llama.prefill(
            params, cfg, jnp.asarray([ids], jnp.int32), cache)
        cur = logits[0, -1]
        pos = len(ids)
        for want_id, want_lp in zip(req.token_ids, req.token_logprobs):
            assert int(jnp.argmax(cur)) == want_id
            ref_lp = float(cur[want_id] - jsp.logsumexp(cur))
            assert abs(ref_lp - want_lp) < 1e-3, (ref_lp, want_lp)
            logits, cache = llama.decode_step(
                params, cfg, jnp.asarray([want_id], jnp.int32),
                jnp.asarray([pos], jnp.int32), cache)
            cur = logits[0]
            pos += 1
    finally:
        eng.shutdown()


def test_submit_after_stop_errors_immediately(setup):
    """A stopped engine (shutdown or loop death) must reject new
    submissions with an immediate final item, not enqueue them into a
    queue nobody drains (the hang the multi-host follower-death test
    first exposed: engine dies early, every later submit blocked
    forever)."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=1, max_seq=128, steps_per_call=2,
                              default_max_tokens=3, cache_dtype="float32"))
    eng.shutdown()
    req = eng.submit(MSGS, max_tokens=3)
    delta, fin = req.out.get(timeout=5)
    assert fin == "abort"

    # loop-death path: the recorded failure message is what submitters see
    eng2 = Engine(cfg, params, tok,
                  EngineConfig(batch_slots=1, max_seq=128, steps_per_call=2,
                               default_max_tokens=3, cache_dtype="float32"))
    try:
        eng2._fail_all_requests("error: engine died: test")
        req2 = eng2.submit(MSGS, max_tokens=3)
        _, fin2 = req2.out.get(timeout=5)
        assert fin2 == "error: engine died: test"
    finally:
        eng2.shutdown()


def test_request_tracing_spans(setup):
    """/statusz request tracing: every finished request leaves a span in
    stats_snapshot()['recent'] with its lifecycle timings; reset_stats
    clears them."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=5, cache_dtype="float32"))
    try:
        req = eng.submit(MSGS, max_tokens=5)
        fin = None
        while fin is None:
            _, fin = req.out.get(timeout=120)
        spans = eng.stats_snapshot()["recent"]
        assert len(spans) == 1
        s = spans[0]
        assert s["finish"] == fin
        assert s["prompt_tokens"] == len(req.prompt_ids)
        assert s["completion_tokens"] == len(req.token_ids)
        assert s["ttft_ms"] is not None and 0 <= s["ttft_ms"] <= s["total_ms"]
        import json
        json.dumps(spans)  # must be JSON-serializable for /statusz
        eng.reset_stats()
        assert eng.stats_snapshot()["recent"] == []
    finally:
        eng.shutdown()


def test_top_logprobs_exact(setup):
    """OpenAI `top_logprobs`: every emitted token (INCLUDING the
    admission-time first token) carries exactly k alternatives, sorted
    descending, whose head is the greedily chosen token itself with the
    same logprob the scalar path reports."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=6, cache_dtype="float32"))
    try:
        req = eng.submit(MSGS, max_tokens=6, top_logprobs=3)
        fin = None
        while fin is None:
            _, fin = req.out.get(timeout=120)
        assert len(req.token_top) == len(req.token_ids) >= 2
        for tid, lp, row in zip(req.token_ids, req.token_logprobs,
                                req.token_top):
            assert len(row) == 3
            lps = [x for _, x in row]
            assert lps == sorted(lps, reverse=True)
            # greedy: the chosen token IS the argmax -> head of the row
            assert row[0][0] == tid
            assert abs(row[0][1] - lp) < 1e-3, (row[0], lp)

        # the request-local k is honored even when another in-flight
        # request forces a larger call-wide top-k bucket
        r1 = eng.submit(MSGS, max_tokens=4, top_logprobs=7)
        r2 = eng.submit(MSGS, max_tokens=4, top_logprobs=2)
        for r in (r1, r2):
            fin = None
            while fin is None:
                _, fin = r.out.get(timeout=120)
        assert all(len(row) == 7 for row in r1.token_top)
        assert all(len(row) == 2 for row in r2.token_top)
        assert [i for i, _ in r1.token_top[0][:2]] == \
            [i for i, _ in r2.token_top[0][:2]]

        from gabby_tpu.runtime.engine import RequestError
        with pytest.raises(RequestError):
            eng.submit(MSGS, max_tokens=2, top_logprobs=21)
    finally:
        eng.shutdown()


def test_cancellation_frees_slot_promptly(setup):
    """Cancelling a live request must finish it with 'cancelled' within a
    loop iteration, free its slot, and leave concurrent requests exact.
    Queued cancellations never admit at all."""
    import threading
    import time as _time
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=2,
                              default_max_tokens=64, cache_dtype="float32"))
    try:
        victim = eng.submit(MSGS, max_tokens=64)
        for _ in range(600):
            if eng.stats_snapshot()["active_slots"] >= 1:
                break
            _time.sleep(0.01)
        survivor_msgs = [{"role": "user", "content": "other request"}]
        res = {}
        t = threading.Thread(target=lambda: res.update(
            out=eng.generate_sync(survivor_msgs, max_tokens=5)))
        t.start()
        eng.cancel(victim)
        fin = None
        t0 = _time.monotonic()
        while fin is None:
            _, fin = victim.out.get(timeout=60)
        assert fin == "cancelled"
        t.join(timeout=120)
        ref = tok.decode(reference_generation(cfg, params, tok,
                                              survivor_msgs, 5))
        assert res["out"][0] == ref, "survivor corrupted by cancellation"
        for _ in range(600):
            if eng.stats_snapshot()["active_slots"] == 0:
                break
            _time.sleep(0.01)
        assert eng.stats_snapshot()["active_slots"] == 0

        # queued cancel: fill both slots, queue one, cancel it while queued
        blockers = [eng.submit(MSGS, max_tokens=32) for _ in range(2)]
        _time.sleep(0.1)
        queued = eng.submit(MSGS, max_tokens=4)
        eng.cancel(queued)
        fin = None
        while fin is None:
            _, fin = queued.out.get(timeout=120)
        assert fin == "cancelled"
        for b_ in blockers:
            eng.cancel(b_)
    finally:
        eng.shutdown()


def test_overlong_prompt_rejected(setup):
    """Prompts past the context window get a 400-style rejection, not
    silent truncation (VERDICT round-1 weak #5)."""
    from gabby_tpu.runtime.engine import RequestError
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=2,
                              default_max_tokens=4, cache_dtype="float32"))
    try:
        with pytest.raises(RequestError, match="context window"):
            eng.submit_ids(list(range(1, 200)))
        # a maximal prompt (max_seq-1) is still accepted
        req = eng.submit_ids([5] * 127, max_tokens=1)
        delta, fin = req.out.get(timeout=120)
        assert fin is not None or req.out.get(timeout=120)[1] is not None
    finally:
        eng.shutdown()


def test_top_k_over_candidate_limit_rejected(engine):
    from gabby_tpu.ops.sampling import MAX_CANDIDATES
    from gabby_tpu.runtime.engine import RequestError
    with pytest.raises(RequestError, match="top_k"):
        engine.submit(MSGS, top_k=MAX_CANDIDATES + 1)


def test_max_seq_off_bucket_grid_rejected(setup):
    cfg, params, tok = setup
    with pytest.raises(ValueError, match="multiple of"):
        Engine(cfg, params, tok, EngineConfig(batch_slots=2, max_seq=100))


def test_stop_sequences(engine, setup):
    """Generation halts at the stop string; the stop text is never emitted;
    finish_reason is 'stop'."""
    cfg, params, tok = setup
    # discover what the model greedily emits, pick a mid-output substring
    full, _, _, _ = engine.generate_sync(MSGS, max_tokens=8)
    if len(full) < 3:
        pytest.skip("model output too short to carve a stop from")
    stop = full[2:4]
    text, fin, _, _ = engine.generate_sync(MSGS, max_tokens=8, stop=[stop])
    assert fin == "stop"
    assert stop not in text
    assert text == full[:full.find(stop)]


def test_sampling_params_accepted(engine):
    text, fin, _, _ = engine.generate_sync(
        MSGS, max_tokens=4, temperature=0.8, top_k=20, top_p=0.9)
    assert fin in ("stop", "length")
    assert isinstance(text, str)


def test_burst_admission_correctness(setup):
    """Several same-schedule requests submitted to an idle engine take the
    batched cold-burst prefill; outputs must still match the lone-request
    reference exactly."""
    import threading
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=4, max_seq=128, steps_per_call=4,
                              default_max_tokens=5, cache_dtype="float32"))
    try:
        prompts = [[{"role": "user", "content": f"burst {i}"}]
                   for i in range(4)]
        for attempt in range(3):
            results = [None] * len(prompts)
            threads = [threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i, eng.generate_sync(prompts[i], max_tokens=5)[0]))
                for i in range(len(prompts))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            for i, msgs in enumerate(prompts):
                ref = tok.decode(reference_generation(cfg, params, tok,
                                                      msgs, 5))
                assert results[i] == ref, f"burst req {i} diverged"
            if eng.stats["burst_admissions"] >= 2:
                break
        # with 4 simultaneous submissions x 3 attempts the burst path must
        # have triggered at least once
        assert eng.stats["burst_admissions"] >= 2, eng.stats
    finally:
        eng.shutdown()


# ---- incremental detokenizer (VERDICT r2 weak #3: O(n^2) emit path) -------


def _emitter(tok, slot_count=1):
    """An Engine shell exposing just the emit path (_emit_token/_finish):
    no device loop, no model — the detokenizer state machine in isolation."""
    import threading
    eng = Engine.__new__(Engine)
    eng.tokenizer = tok
    from gabby_tpu.tokenizer import ChatFormat
    eng.chat = ChatFormat(tok)
    eng._eos_ids = jnp.asarray(sorted(eng.chat.stop_ids()), jnp.int32)
    eng._slots = [None] * slot_count
    eng._slot_prompts = [None] * slot_count
    eng._active = jnp.zeros((slot_count,), bool)
    eng._positions = jnp.zeros((slot_count,), jnp.int32)
    eng._park = 127
    eng._paged = False
    eng._slot_epoch = [0] * slot_count
    eng._pending_burst = None
    eng.stats = {"completion_tokens": 0}
    eng._ttfts = []
    eng._pen_slots = set()
    eng._pstate = None
    import collections
    eng._spans = collections.deque(maxlen=32)
    eng._lock = threading.Lock()
    return eng


def _drive_emit(tok, ids, stop=(), max_tokens=10_000):
    """Feed ids through the emit path; returns (streamed_deltas, reason)."""
    from gabby_tpu.runtime.engine import Request, _Slot
    eng = _emitter(tok)
    req = Request(prompt_ids=[], max_tokens=max_tokens, temperature=0.0,
                  top_k=0, top_p=1.0, stop=list(stop))
    eng._slots[0] = _Slot(request=req, prompt_len=0)
    for i in ids:
        if eng._slots[0] is None:
            break
        eng._emit_token(0, i)
    if eng._slots[0] is not None:
        eng._finish(0, "length")
    deltas, reason = [], None
    while True:
        try:
            d, fin = req.out.get_nowait()
        except queue.Empty:
            break
        if d:
            deltas.append(d)
        if fin is not None:
            reason = fin
    return deltas, reason


def test_incremental_detok_multibyte_split_matches_whole_decode():
    """UTF-8 sequences split across tokens: the streamed concatenation must
    equal the whole-sequence decode, and no delta may leak a partial-char
    replacement that later text completes."""
    tok = Tokenizer.byte_fallback(256)
    # "héllo ☃" as raw bytes, one token per byte — é is 2 bytes, ☃ is 3
    text = "héllo ☃"
    ids = list(text.encode("utf-8"))
    deltas, reason = _drive_emit(tok, ids)
    assert "".join(deltas) == tok.decode(ids) == text
    assert all("�" not in d for d in deltas)


def test_incremental_detok_invalid_bytes_match_whole_decode():
    tok = Tokenizer.byte_fallback(256)
    # C3 followed by ASCII 'A' is an invalid continuation; lone F0 at end
    # of stream is an incomplete 4-byte sequence
    ids = [0xC3, ord("A"), ord("b"), 0xF0]
    deltas, _ = _drive_emit(tok, ids)
    assert "".join(deltas) == tok.decode(ids) == "�Ab�"


def test_incremental_detok_special_token_flushes_partial_tail():
    tok = Tokenizer.byte_fallback(256)
    hdr = tok.token_id("<|start_header_id|>")  # a NON-stop special
    ids = [ord("x"), 0xC3, hdr, ord("y")]
    deltas, _ = _drive_emit(tok, ids)
    assert "".join(deltas) == tok.decode(ids) == "x�<|start_header_id|>y"


def test_incremental_detok_stop_sequence_cut_and_holdback():
    tok = Tokenizer.byte_fallback(256)
    ids = [ord(c) for c in "abcSTOPxyz"]
    deltas, reason = _drive_emit(tok, ids, stop=["STOP"])
    assert "".join(deltas) == "abc"
    assert reason == "stop"
    # ambiguous prefix: 'S' is held back until it can't grow into STOP...
    ids2 = [ord(c) for c in "aSb"]
    deltas2, reason2 = _drive_emit(tok, ids2, stop=["STOP"])
    assert "".join(deltas2) == "aSb"
    assert reason2 == "length"
    # ...and a stop match SPLIT across many tokens still cuts exactly
    ids3 = [ord(c) for c in "zzSTO"] + [ord("P"), ord("q")]
    deltas3, reason3 = _drive_emit(tok, ids3, stop=["STOP"])
    assert "".join(deltas3) == "zz"
    assert reason3 == "stop"


def test_incremental_detok_eos_flushes_held_tail():
    tok = Tokenizer.byte_fallback(256)
    eot = tok.token_id("<|eot_id|>")
    # held-back text (stop holdback window) must flush when EOS arrives
    ids = [ord(c) for c in "heyST"]
    deltas, reason = _drive_emit(tok, ids + [eot], stop=["STOP"])
    assert "".join(deltas) == "heyST"
    assert reason == "stop"


def test_incremental_detok_is_o1_per_token():
    """The emit path must not re-decode the whole history: feeding N tokens
    calls token_raw N times and full decode() zero times."""
    tok = Tokenizer.byte_fallback(256)
    calls = {"decode": 0}
    orig = tok.decode
    tok.decode = lambda ids: (calls.__setitem__("decode",
                                                calls["decode"] + 1)
                              or orig(ids))
    deltas, _ = _drive_emit(tok, [ord("a")] * 500)
    assert "".join(deltas) == "a" * 500
    assert calls["decode"] == 0, "emit path re-decoded the full sequence"


def test_shortest_prompt_first_admission(setup):
    """With one slot busy and a long + a short prompt waiting, the short
    prompt must be admitted (and finish) first — SPF beats FIFO on mean
    TTFT (VERDICT r2 item 2); the FIFO policy preserves arrival order."""
    import threading
    import time as _time
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=1, max_seq=256, steps_per_call=2,
                              steps_per_call_busy=2, default_max_tokens=8,
                              cache_dtype="float32",
                              # compile storms at engine start age every
                              # waiter past a realistic guard; the test is
                              # about ORDER, so park the guard far away
                              spf_age_limit=600.0))
    try:
        blocker = eng.submit_ids(list(range(2, 10)), max_tokens=24)
        for _ in range(2000):
            if eng.stats_snapshot()["active_slots"] >= 1:
                break
            _time.sleep(0.01)
        long_req = eng.submit_ids([2 + (i % 200) for i in range(180)],
                                  max_tokens=4)
        _time.sleep(0.05)  # long arrives first
        short_req = eng.submit_ids(list(range(2, 12)), max_tokens=4)

        done = {}

        def drain(name, req):
            fin = None
            while fin is None:
                _, fin = req.out.get(timeout=300)
            done[name] = _time.monotonic()

        ts = [threading.Thread(target=drain, args=(n, r))
              for n, r in [("blocker", blocker), ("long", long_req),
                           ("short", short_req)]]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert done["short"] < done["long"], (
            "short prompt did not overtake the earlier long prompt")
    finally:
        eng.shutdown()


def _drain_order(reqs: dict):
    """Start a drain thread per request; returns name -> finish time."""
    import threading
    import time as _time
    done = {}

    def drain(name, req):
        fin = None
        while fin is None:
            _, fin = req.out.get(timeout=300)
        done[name] = (_time.monotonic(), fin)

    ts = [threading.Thread(target=drain, args=(n, r))
          for n, r in reqs.items()]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    return done


def test_priority_admission_overrides_spf(setup):
    """A higher-priority request must admit before an earlier, SHORTER
    lower-priority one (priority strata sit above the SPF tiebreak)."""
    import time as _time
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=1, max_seq=256, steps_per_call=2,
                              steps_per_call_busy=2, default_max_tokens=8,
                              cache_dtype="float32", spf_age_limit=600.0))
    try:
        blocker = eng.submit_ids(list(range(2, 10)), max_tokens=200)
        for _ in range(2000):
            if eng.stats_snapshot()["active_slots"] >= 1:
                break
            _time.sleep(0.01)
        short_lo = eng.submit_ids(list(range(2, 12)), max_tokens=4)
        _time.sleep(0.05)  # low-priority short arrives first
        long_hi = eng.submit_ids([2 + (i % 200) for i in range(120)],
                                 max_tokens=4, priority=2)
        done = _drain_order({"blocker": blocker, "short_lo": short_lo,
                             "long_hi": long_hi})
        assert done["long_hi"][0] < done["short_lo"][0], (
            "high-priority request did not overtake the low-priority one")
    finally:
        eng.shutdown()


def test_deadline_expired_in_queue_fails_fast(setup):
    """A queued request whose deadline passes before a slot frees must be
    failed promptly (error finish, no generated text) — not prefilling on
    behalf of a client whose budget is spent."""
    import time as _time
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=1, max_seq=256, steps_per_call=2,
                              steps_per_call_busy=2, default_max_tokens=8,
                              cache_dtype="float32", spf_age_limit=600.0))
    try:
        blocker = eng.submit_ids(list(range(2, 10)), max_tokens=200)
        for _ in range(2000):
            if eng.stats_snapshot()["active_slots"] >= 1:
                break
            _time.sleep(0.01)
        doomed = eng.submit_ids(list(range(2, 12)), max_tokens=4,
                                deadline_s=0.03)
        delta, fin = doomed.out.get(timeout=120)
        assert delta is None and fin.startswith("error"), (delta, fin)
        assert "deadline" in fin
        assert doomed.token_ids == []
        # the blocker is unaffected
        done = _drain_order({"blocker": blocker})
        assert not done["blocker"][1].startswith("error")
    finally:
        eng.shutdown()


def test_deadline_edf_overrides_spf(setup):
    """Within a priority stratum, a request whose deadline is at risk
    (slack inside the urgency window) admits before a shorter prompt
    without a deadline (EDF beats SPF when it matters)."""
    import time as _time
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=1, max_seq=256, steps_per_call=2,
                              steps_per_call_busy=2, default_max_tokens=8,
                              cache_dtype="float32", spf_age_limit=600.0))
    try:
        blocker = eng.submit_ids(list(range(2, 10)), max_tokens=200)
        for _ in range(2000):
            if eng.stats_snapshot()["active_slots"] >= 1:
                break
            _time.sleep(0.01)
        short = eng.submit_ids(list(range(2, 12)), max_tokens=4)
        _time.sleep(0.05)
        # longer prompt, but its 300 s slack sits inside the (parked at
        # 600 s) urgency window -> EDF puts it first
        dl = eng.submit_ids([2 + (i % 200) for i in range(120)],
                            max_tokens=4, deadline_s=300.0)
        done = _drain_order({"blocker": blocker, "short": short, "dl": dl})
        assert done["dl"][0] < done["short"][0], (
            "deadline-urgent request did not overtake the shorter prompt")
        assert done["dl"][1] in ("stop", "length")
    finally:
        eng.shutdown()


def test_deadline_mid_flight_finishes_with_partial_text(engine):
    """An in-flight request whose deadline expires is finished with
    reason "deadline" and whatever it generated so far (leader-clock
    sweep in _compose_plan, replayed by followers via the plan)."""
    import time as _time
    req = engine.submit_ids(list(range(2, 10)), max_tokens=10_000,
                            deadline_s=3600.0)
    # wait until it is decoding, then pull its deadline into the past
    # (deterministic stand-in for "the budget elapsed mid-generation")
    first, fin = req.out.get(timeout=120)
    assert fin is None
    req.submit_ts -= 7200.0
    engine._wake.set()
    text = first or ""
    while fin is None:
        delta, fin = req.out.get(timeout=120)
        text += delta or ""
    assert fin == "deadline", fin
    assert len(req.token_ids) >= 1  # partial output delivered
    assert len(req.token_ids) < 10_000


def test_priority_validation(engine):
    from gabby_tpu.runtime.engine import RequestError
    with pytest.raises(RequestError):
        engine.submit_ids([2, 3], priority=99)
    with pytest.raises(RequestError):
        engine.submit_ids([2, 3], deadline_s=0.0)


def test_paired_kv_cache_engine_matches_reference(setup):
    """EngineConfig.pair_kv_heads: serving through the PAIRED cache layout
    (block-diagonal attention dots) must be byte-identical to the per-head
    layout — same reference generation, same finish reason."""
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=4, max_seq=128, steps_per_call=4,
                              default_max_tokens=8, cache_dtype="float32",
                              pair_kv_heads=True))
    try:
        text, fin, _, n = eng.generate_sync(MSGS, max_tokens=6)
    finally:
        eng.shutdown()
    ref_ids = reference_generation(cfg, params, tok, MSGS, 6)
    assert fin in ("stop", "length")
    assert text == tok.decode(ref_ids)


def test_paired_rejects_odd_heads(setup):
    cfg, params, tok = setup
    cfg_odd = cfglib.tiny(num_heads=3, num_kv_heads=1, head_dim=16,
                          max_seq_len=128)
    params_odd = llama.init_params(cfg_odd, jax.random.PRNGKey(0),
                                   dtype=jnp.float32)
    with pytest.raises(ValueError, match="even"):
        Engine(cfg_odd, params_odd, tok,
               EngineConfig(batch_slots=2, max_seq=128,
                            cache_dtype="float32", pair_kv_heads=True))


def test_warmup_compiles_and_keeps_stats_clean(engine):
    """warmup() runs the dress rehearsal (solo + concurrent wave over the
    bucket ladder + a prefix-donor repeat) with internal-tagged requests,
    so it leaves the request counters/TTFTs untouched WITHOUT a blanket
    reset — a real request that completed beforehand (or concurrently,
    once the HTTP socket is open) keeps its stats (ADVICE r4)."""
    text, fin, np_, nc = engine.generate_sync(MSGS, max_tokens=4)
    assert fin in ("stop", "length")
    pre = engine.stats_snapshot()
    assert pre["requests"] == 1 and pre["completion_tokens"] > 0

    secs = engine.warmup(concurrency=5)
    assert secs > 0
    s = engine.stats_snapshot()
    # rehearsal traffic recorded nothing; the real request's stats survive
    assert s["requests"] == 1
    assert s["completion_tokens"] == pre["completion_tokens"]
    assert s["prompt_tokens"] == pre["prompt_tokens"]
    assert s["active_slots"] == 0 and s["queued"] == 0
    text, fin, np_, nc = engine.generate_sync(MSGS, max_tokens=4)
    assert fin in ("stop", "length")
    assert engine.stats_snapshot()["requests"] == 2


def test_pipeline_fetch_matches_synchronous(setup):
    """Dispatch-ahead pipelining (EngineConfig.pipeline_fetch) must be
    invisible in outputs: 3x-oversubscribed mixed workload (slot reuse
    stresses the epoch guard; varying max_tokens stresses overshoot
    discard) produces identical streams with the fetch pipelined and
    synchronous."""
    import threading
    cfg, params, tok = setup
    prompts = [[(11 * i + j) % 250 + 2 for j in range(10 + (i % 3) * 17)]
               for i in range(6)]
    outs = {}
    for mode in (True, False):
        eng = Engine(cfg, params, tok,
                     EngineConfig(batch_slots=2, max_seq=128,
                                  steps_per_call=4, steps_per_call_busy=2,
                                  default_max_tokens=8,
                                  cache_dtype="float32",
                                  pipeline_fetch=mode))
        try:
            results = [None] * len(prompts)

            def run(i):
                req = eng.submit_ids(list(prompts[i]),
                                     max_tokens=4 + (i % 3) * 3)
                while True:
                    _, fin = req.out.get(timeout=120)
                    if fin is not None:
                        break
                results[i] = (tuple(req.token_ids), fin)

            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(len(prompts))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=180)
            outs[mode] = results
        finally:
            eng.shutdown()
    assert outs[True] == outs[False], outs
    assert all(r is not None for r in outs[True])
