"""Paged KV cache: allocator, device ops, decode/prefill parity with the
dense cache, engine end-to-end, capacity beyond slots x max_seq at fixed
HBM, and zero-copy prefix page sharing (VERDICT r1 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gabby_tpu import config as cfglib
from gabby_tpu.models import llama
from gabby_tpu.runtime import generate
from gabby_tpu.runtime.engine import Engine, EngineConfig
from gabby_tpu.runtime.kv_cache import create_cache
from gabby_tpu.runtime.paged import (PageAllocator, create_paged_cache,
                                     gather_slot_rows)
from gabby_tpu.tokenizer import Tokenizer

PS = 16  # small page size: tests exercise multi-page paths cheaply


@pytest.fixture(scope="module")
def setup():
    cfg = cfglib.tiny(max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    tok = Tokenizer.byte_fallback(cfg.vocab_size)
    return cfg, params, tok


def test_allocator_share_release_deterministic():
    a = PageAllocator(8)
    assert a.alloc(1) == [0]          # scratch convention
    p1 = a.alloc(3)
    assert p1 == [1, 2, 3]
    shared = a.share(p1[:2])
    a.release(p1)                     # refs: 1,1,0 -> page 3 free
    assert a.available() == 5
    a.release(shared)                 # all of 1,2 free now
    assert a.available() == 7
    b = PageAllocator(8)
    b.alloc(1)
    assert b.alloc(3) == [1, 2, 3]    # same sequence -> same pages


def _paged_prefill(params, cfg, cache, slot, ids, page):
    """Prefill `ids` into a paged cache slot with page-aligned chunks."""
    n = len(ids)
    offset = 0
    logits = None
    while offset < n:
        bucket = page * max(1, -(-min(n - offset, 4 * page) // page))
        bucket = min(bucket, 4 * page)
        take = min(bucket, n - offset)
        chunk = np.zeros((bucket,), np.int32)
        chunk[:take] = ids[offset:offset + take]
        logits, cache = generate.prefill_slot(
            params, cfg, jnp.asarray(chunk), jnp.int32(take),
            jnp.int32(slot), jnp.int32(offset), cache)
        offset += take
    return logits, cache


def test_paged_matches_dense_decode(setup):
    """Same prompt through the dense and the paged cache must produce
    identical logits and identical greedy continuations."""
    cfg, params, tok = setup
    ids = list(range(2, 2 + 40))  # spans 3 pages of 16

    dense = create_cache(cfg, 2, 128, dtype=jnp.float32)
    dl, dense = llama.prefill_slot(
        params, cfg, jnp.asarray(ids + [0] * (64 - len(ids)), jnp.int32),
        jnp.int32(len(ids)), jnp.int32(1), jnp.int32(0), dense)

    paged = create_paged_cache(cfg, 2, 128, num_pages=12,
                               dtype=jnp.float32, page_size=PS)
    # slot 1 pages: hand-build a page table (pages 3.. for realism)
    pt = np.zeros((2, 128 // PS), np.int32)
    pt[1, :4] = [3, 5, 4, 6]
    import dataclasses
    paged = dataclasses.replace(paged, page_table=jnp.asarray(pt))
    pl_, paged = _paged_prefill(params, cfg, paged, 1, ids, PS)

    np.testing.assert_allclose(np.asarray(dl), np.asarray(pl_),
                               rtol=2e-5, atol=2e-5)

    # a few decode steps in lockstep
    t_d = jnp.asarray([0, int(jnp.argmax(dl))], jnp.int32)
    t_p = jnp.asarray([0, int(jnp.argmax(pl_))], jnp.int32)
    pos = jnp.asarray([127, len(ids)], jnp.int32)
    for step in range(18):  # crosses a page boundary (40 -> 58)
        ld, dense = llama.decode_step(params, cfg, t_d, pos, dense)
        lp, paged = llama.decode_step(params, cfg, t_p, pos, paged)
        np.testing.assert_allclose(np.asarray(ld[1]), np.asarray(lp[1]),
                                   rtol=2e-5, atol=2e-5)
        t_d = jnp.argmax(ld, -1).astype(jnp.int32)
        t_p = jnp.argmax(lp, -1).astype(jnp.int32)
        assert int(t_d[1]) == int(t_p[1]), f"diverged at step {step}"
        pos = pos + jnp.asarray([0, 1], jnp.int32)


def test_gather_matches_written(setup):
    cfg, params, _ = setup
    paged = create_paged_cache(cfg, 1, 64, num_pages=6, dtype=jnp.float32,
                               page_size=PS)
    pt = np.zeros((1, 4), np.int32)
    pt[0] = [2, 1, 4, 3]
    import dataclasses
    paged = dataclasses.replace(paged, page_table=jnp.asarray(pt))
    ids = list(range(5, 37))
    _, paged = _paged_prefill(params, cfg, paged, 0, ids, PS)
    k, v, _, _ = gather_slot_rows(paged, jnp.int32(0), 32)
    assert k.shape == (cfg.num_layers, cfg.num_kv_heads, 32, cfg.head_dim)
    # gathered rows equal a dense prefill's cache rows
    dense = create_cache(cfg, 1, 64, dtype=jnp.float32)
    _, dense = llama.prefill_slot(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.int32(32),
        jnp.int32(0), jnp.int32(0), dense)
    np.testing.assert_allclose(np.asarray(k), np.asarray(dense.k[:, 0, :, :32]),
                               rtol=1e-6, atol=1e-6)


def _paged_engine(cfg, params, tok, pages, slots=4, max_seq=128):
    return Engine(cfg, params, tok,
                  EngineConfig(batch_slots=slots, max_seq=max_seq,
                               steps_per_call=4, default_max_tokens=8,
                               cache_dtype="float32", paged_pages=pages,
                               page_size=PS))


def test_paged_engine_end_to_end(setup):
    from test_engine import MSGS, reference_generation
    cfg, params, tok = setup
    eng = _paged_engine(cfg, params, tok, pages=1 + 4 * (128 // PS))
    try:
        text, fin, _, n = eng.generate_sync(MSGS, max_tokens=6)
        ref = tok.decode(reference_generation(cfg, params, tok, MSGS, 6))
        assert text == ref
    finally:
        eng.shutdown()


def test_paged_capacity_exceeds_dense_at_fixed_hbm(setup):
    """4 slots x max_seq 128 would need 32 pages dense-equivalent; a pool
    of 9 (1 scratch + 8) serves 4 CONCURRENT short requests — more live
    slots than the same HBM could hold densely (128*2=2 slots' worth)."""
    import threading
    from test_engine import reference_generation
    cfg, params, tok = setup
    eng = _paged_engine(cfg, params, tok, pages=9)
    try:
        prompts = [[{"role": "user", "content": f"q{i}"}] for i in range(4)]
        results = [None] * 4
        ts = [threading.Thread(
            target=lambda i=i: results.__setitem__(
                i, eng.generate_sync(prompts[i], max_tokens=5)[0]))
            for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        for i in range(4):
            ref = tok.decode(reference_generation(cfg, params, tok,
                                                  prompts[i], 5))
            assert results[i] == ref, f"request {i} diverged under paging"
        # peak pool usage stayed within the small pool
        assert eng._alloc.available() >= 0
        assert eng.stats_snapshot()["active_slots"] == 0
    finally:
        eng.shutdown()


def test_paged_prefix_sharing_is_zero_copy(setup):
    """Second request with a shared >= 1-page prefix must ADOPT the donor's
    pages (refcount > 1 during its lifetime) and match the reference."""
    import threading
    from test_engine import reference_generation_long
    cfg, params, tok = setup
    eng = _paged_engine(cfg, params, tok, pages=1 + 24, slots=2,
                        max_seq=256)
    try:
        shared = " ".join(f"tok{i}" for i in range(30))  # > 1 page of 16
        m1 = [{"role": "system", "content": shared},
              {"role": "user", "content": "alpha"}]
        m2 = [{"role": "system", "content": shared},
              {"role": "user", "content": "beta and different"}]
        # keep request 1 decoding in its slot so request 2 lands in the
        # OTHER slot and must adopt the donor's pages by reference
        res = {}

        def run1():
            res["out1"] = eng.generate_sync(m1, max_tokens=24)[0]

        t1 = threading.Thread(target=run1)
        t1.start()
        import time as _time
        for _ in range(600):
            if eng.stats_snapshot()["active_slots"] >= 1:
                break
            _time.sleep(0.01)
        out2 = eng.generate_sync(m2, max_tokens=4)[0]
        peak_refs = max(eng._alloc.refs)
        t1.join(timeout=180)
        out1 = res["out1"]
        assert eng.stats["prefix_hits"] >= 1, eng.stats
        # shared pages are referenced by both slots (refcount 2 somewhere)
        assert peak_refs >= 2, eng._alloc.refs
        def ref(m, n):
            return tok.decode(reference_generation_long(
                cfg, params, tok, m, n))

        assert out1 == ref(m1, 24)
        assert out2 == ref(m2, 4), "prefix-shared request diverged"
    finally:
        eng.shutdown()


def _reference_ids(cfg, params, tok, prompt_ids, max_tokens):
    """Greedy continuation of raw prompt ids via the primitives, stopping
    at the same chat-special stop set the engine uses (submit_ids path)."""
    from gabby_tpu.tokenizer import ChatFormat
    stop = ChatFormat(tok).stop_ids()
    cache = create_cache(cfg, 1, 1024, dtype=jnp.float32)
    logits, cache = llama.prefill(
        params, cfg, jnp.asarray([prompt_ids], jnp.int32), cache)
    out = []
    t = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    pos = len(prompt_ids)
    while len(out) < max_tokens:
        if int(t[0]) in stop:
            break
        out.append(int(t[0]))
        logits, cache = llama.decode_step(
            params, cfg, t, jnp.asarray([pos], jnp.int32), cache)
        t = jnp.argmax(logits, -1).astype(jnp.int32)
        pos += 1
    return out


def test_paged_donor_is_dst_must_not_corrupt_shared_pages(setup):
    """ADVICE r2 (high): when a new request reuses the prefix RESIDENT IN
    ITS OWN SLOT (donor == dst), the slot's pages past the common prefix
    may still be refcount-shared with a live slot that adopted them
    earlier; suffix-prefilling through the page table in place would write
    into that slot's KV. Scenario: A live in slot 0 -> B adopts A's prefix
    pages into slot 1 -> A is cancelled (rows stay resident) -> C lands in
    slot 0 with a prompt diverging INSIDE the region B shares. B's stream
    must be byte-identical to the lone-request reference."""
    import threading
    import time as _time
    cfg, params, tok = setup
    eng = _paged_engine(cfg, params, tok, pages=1 + 30, slots=2,
                        max_seq=256)
    try:
        P = [2 + (i % 200) for i in range(96)]      # shared prefix, 6 pages
        ids_a = P + [210 + (i % 40) for i in range(16)]   # 112 tokens
        ids_b = P + [150 + (i % 40) for i in range(16)]   # common(A,B) = 96
        # C shares only 64 tokens of P, divergence INSIDE B's shared pages
        ids_c = P[:64] + [100 + (i % 40) for i in range(32)]

        req_a = eng.submit_ids(ids_a, max_tokens=64)
        for _ in range(2000):
            if eng.stats_snapshot()["active_slots"] >= 1:
                break
            _time.sleep(0.01)
        req_b = eng.submit_ids(ids_b, max_tokens=64)
        for _ in range(6000):
            if eng.stats_snapshot()["prefix_hits"] >= 1:
                break
            _time.sleep(0.01)
        assert eng.stats["prefix_hits"] >= 1, "B never adopted A's pages"
        eng.cancel(req_a)   # slot 0 frees; A's rows stay resident
        req_c = eng.submit_ids(ids_c, max_tokens=4)

        def drain(req):
            parts, fin = [], None
            while fin is None:
                d, fin = req.out.get(timeout=300)
                if d:
                    parts.append(d)
            return "".join(parts), fin

        out_c, _ = drain(req_c)
        out_b, fin_b = drain(req_b)
        drain(req_a)
        assert fin_b in ("stop", "length"), fin_b
        ref_b = tok.decode(_reference_ids(cfg, params, tok, ids_b, 64))
        assert out_b == ref_b, "slot B's KV was corrupted by C's admission"
        assert out_c == tok.decode(_reference_ids(cfg, params, tok, ids_c, 4))
    finally:
        eng.shutdown()


def test_paged_pool_exhaustion_fails_gracefully(setup):
    """A prompt the pool cannot back gets an error finish, not a hang."""
    cfg, params, tok = setup
    eng = _paged_engine(cfg, params, tok, pages=3, slots=2)  # 2 usable
    try:
        req = eng.submit_ids(list(range(2, 2 + 60)), max_tokens=4)  # 4 pages
        fin = None
        while fin is None:
            _, fin = req.out.get(timeout=120)
        assert fin.startswith("error"), fin
        # engine still serves requests that fit
        ok = eng.submit_ids(list(range(2, 18)), max_tokens=2)
        fin = None
        while fin is None:
            _, fin = ok.out.get(timeout=120)
        assert fin in ("stop", "length"), fin
    finally:
        eng.shutdown()


def test_paged_burst_admissions(setup):
    """Batched (burst) admissions on the paged cache: several same-schedule
    requests batch-prefill into free slots with ONE lane-masked
    page-granular write per chunk, all outputs matching the lone-request
    reference (VERDICT r2 weak #6)."""
    import threading
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=4, max_seq=128, steps_per_call=4,
                              default_max_tokens=5, cache_dtype="float32",
                              paged_pages=1 + 4 * (128 // PS),
                              page_size=PS))
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
                t.join(timeout=180)
            from test_engine import reference_generation
            for i, msgs in enumerate(prompts):
                ref = tok.decode(reference_generation(cfg, params, tok,
                                                      msgs, 5))
                assert results[i] == ref, f"burst req {i} diverged (paged)"
            if eng.stats["burst_admissions"] >= 2:
                break
        assert eng.stats["burst_admissions"] >= 2, eng.stats
    finally:
        eng.shutdown()


def test_paged_burst_does_not_touch_live_slot(setup):
    """A paged burst's lane-masked writes must leave a LIVE decoding
    slot's pages untouched (masked lanes write the scratch page)."""
    import threading
    import time as _time
    from test_engine import reference_generation_long
    cfg, params, tok = setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=3, max_seq=128, steps_per_call=2,
                              default_max_tokens=5, cache_dtype="float32",
                              paged_pages=1 + 3 * (128 // PS),
                              page_size=PS))
    try:
        live_msgs = [{"role": "user", "content": "long running request"}]
        res = {}

        def run_live():
            res["live"] = eng.generate_sync(live_msgs, max_tokens=30)[0]

        t_live = threading.Thread(target=run_live)
        t_live.start()
        for _ in range(600):
            if eng.stats_snapshot()["active_slots"] >= 1:
                break
            _time.sleep(0.01)
        prompts = [[{"role": "user", "content": f"pair {i}"}]
                   for i in range(2)]
        results = [None] * 2
        ts = [threading.Thread(
            target=lambda i=i: results.__setitem__(
                i, eng.generate_sync(prompts[i], max_tokens=4)[0]))
            for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        t_live.join(timeout=180)
        from test_engine import reference_generation
        assert res["live"] == tok.decode(reference_generation_long(
            cfg, params, tok, live_msgs, 30)), "live slot corrupted"
        for i in range(2):
            assert results[i] == tok.decode(reference_generation(
                cfg, params, tok, prompts[i], 4))
    finally:
        eng.shutdown()


def test_paged_engine_with_tp_shardings(setup):
    """Paged cache + TP shardings (parallel.paged_cache_shardings): the
    engine serves off a model-axis-sharded page pool on a virtual mesh
    with output identical to the unsharded reference."""
    import jax as _jax
    from gabby_tpu.parallel import (make_mesh, paged_cache_shardings,
                                    shard_params)
    from test_engine import MSGS, reference_generation
    cfg, params, tok = setup
    if len(_jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    mesh = make_mesh(dp=1, tp=2, devices=_jax.devices()[:2])
    sparams = shard_params(params, mesh)
    eng = Engine(cfg, sparams, tok,
                 EngineConfig(batch_slots=2, max_seq=128, steps_per_call=4,
                              default_max_tokens=6, cache_dtype="float32",
                              paged_pages=1 + 2 * (128 // PS),
                              page_size=PS),
                 cache_shardings=paged_cache_shardings(mesh,
                                                       quantized=False))
    try:
        text, fin, _, n = eng.generate_sync(MSGS, max_tokens=6)
        ref = tok.decode(reference_generation(cfg, params, tok, MSGS, 6))
        assert text == ref, "paged+TP serving diverged"
    finally:
        eng.shutdown()


def test_writes_past_cap_land_on_scratch_page(setup):
    """A slot at the cache cap keeps writing (verify writes its whole
    t-row block even when drafting stopped; a deactivated decode lane
    writes with its position frozen at max_seq). Those rows MUST land on
    the scratch page: the clamped page-table lookup would wrap them into
    the slot's own last page — which may be prefix-SHARED with another
    slot — at row pos % page_size, corrupting real KV history."""
    cfg, params, _ = setup
    ps, max_seq = 8, 32
    cache = create_paged_cache(cfg, 1, max_seq, num_pages=6,
                               dtype=jnp.float32, page_size=ps)
    # slot 0 fully allocated: logical pages -> physical 1..4
    pt = np.zeros((1, max_seq // ps), np.int32)
    pt[0] = [1, 2, 3, 4]
    import dataclasses as dc
    cache = dc.replace(
        cache,
        k=jnp.full_like(cache.k, 7.0), v=jnp.full_like(cache.v, 7.0),
        page_table=jnp.asarray(pt))
    pre_k = np.asarray(cache.k)

    # verify block of t=3 at positions0=30: rows 30, 31 are real (page 4,
    # in-page rows 6, 7); row 32 crosses max_seq and must hit scratch
    logits, out = llama.verify_step(
        params, cfg, jnp.asarray([[5, 6, 7]], jnp.int32),
        jnp.asarray([30], jnp.int32), cache)
    k2 = np.asarray(out.k)
    assert not np.array_equal(k2[4, :, :, 6], pre_k[4, :, :, 6])  # row 30
    assert not np.array_equal(k2[4, :, :, 7], pre_k[4, :, :, 7])  # row 31
    # the overflow row must NOT wrap into page 4 row 0 (abs position 24)
    np.testing.assert_array_equal(k2[4, :, :, 0], pre_k[4, :, :, 0])
    # ... it lands on the scratch page instead
    assert not np.array_equal(k2[0, :, :, 0], pre_k[0, :, :, 0])

    # decode write with the position frozen at max_seq: scratch, not wrap
    _, out2 = llama.decode_step(params, cfg, jnp.asarray([9], jnp.int32),
                                jnp.asarray([max_seq], jnp.int32), cache)
    k3 = np.asarray(out2.k)
    np.testing.assert_array_equal(k3[4, :, :, 0], pre_k[4, :, :, 0])
    assert not np.array_equal(k3[0, :, :, 0], pre_k[0, :, :, 0])


def test_burst_precheck_counts_pages_not_chunks(setup):
    """With page_size < bucket a chunk spans several pages; the burst
    pool precheck must count PAGES. The old chunk-count math started
    bursts the pool couldn't back, and the mid-burst exhaustion
    RuntimeError killed the whole engine."""
    from gabby_tpu.runtime.engine import Request
    cfg = cfglib.tiny(max_seq_len=1024)
    params = llama.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    tok = Tokenizer.byte_fallback(cfg.vocab_size)

    def mk(pages):
        eng = Engine(cfg, params, tok, EngineConfig(
            batch_slots=2, max_seq=1024, steps_per_call=2,
            default_max_tokens=2, cache_dtype="float32",
            paged_pages=pages, page_size=256))
        eng.shutdown()  # stop the loop; drive _select_burst directly
        return eng

    def reqs():
        return [Request(prompt_ids=list(range(2, 302)), max_tokens=2,
                        temperature=0.0, top_k=0, top_p=1.0)
                for _ in range(2)]

    eng = mk(6)  # 1 scratch + 5 usable
    # one 512-row chunk = TWO 256-row pages per slot
    assert eng._chunk_schedule(300) == ((0, 512),)
    eng._backlog.extend(reqs())
    # 2 slots x 2 pages + 2 spare = 6 > 5 available -> no burst (the
    # chunk-count math said 2 x 1 + 2 <= 5 and started a doomed one)
    assert eng._select_burst() is None

    eng = mk(10)  # 1 + 9 usable: 2x2 + 2 <= 9 -> burst forms
    eng._backlog.extend(reqs())
    assert eng._select_burst() is not None


def test_paged_paired_engine_matches_unpaired(setup):
    """pair_kv_heads on the PAGED cache (paired page pools,
    paged.create_paged_cache(paired=True)): identical output text to the
    unpaired paged engine and to the dense reference — pairing is a pure
    layout change (VERDICT r3 item 6: the paged gap was partly pairing
    being dense-only)."""
    from test_engine import MSGS, reference_generation
    cfg, params, tok = setup
    pages = 1 + 4 * (128 // PS)
    ref = tok.decode(reference_generation(cfg, params, tok, MSGS, 6))
    for paired in (False, True):
        eng = Engine(cfg, params, tok,
                     EngineConfig(batch_slots=4, max_seq=128,
                                  steps_per_call=4, default_max_tokens=8,
                                  cache_dtype="float32", paged_pages=pages,
                                  page_size=PS, pair_kv_heads=paired))
        try:
            text, fin, _, n = eng.generate_sync(MSGS, max_tokens=6)
            assert text == ref, f"paired={paired} diverged"
        finally:
            eng.shutdown()


def test_paged_paired_speculative_bit_identical(setup):
    """Speculation + paired paged pool: still bit-identical greedy output
    (the paged verify kernel's paired path + paired row writes)."""
    from test_engine import MSGS, reference_generation
    cfg, params, tok = setup
    pages = 1 + 4 * (128 // PS)
    ref = tok.decode(reference_generation(cfg, params, tok, MSGS, 8))
    eng = Engine(cfg, params, tok,
                 EngineConfig(batch_slots=2, max_seq=128,
                              steps_per_call=4, default_max_tokens=8,
                              cache_dtype="float32", paged_pages=pages,
                              page_size=PS, pair_kv_heads=True,
                              speculate_tokens=3))
    try:
        text, fin, _, n = eng.generate_sync(MSGS, max_tokens=8)
        assert text == ref
    finally:
        eng.shutdown()
