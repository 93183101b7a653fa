"""Continuous-batching inference engine.

The component the reference never built (its Generate returns a canned
string, /root/reference/src/inference/generator.cc:33-38) and BASELINE.json
config 3 requires: a slot-based scheduler where requests join and leave a
fixed-shape decode batch without ever retracing XLA programs.

TPU-shaped design:
  * One engine thread owns the device loop; HTTP worker threads submit
    requests into a queue and block on per-request output queues.
  * The decode batch is a fixed [B] of slots. Slot state on device
    (tokens/positions/active/cache rows) never changes shape; request
    churn only flips `active` lanes and rewrites slot rows.
  * New requests are admitted by per-slot chunked prefill
    (generate.prefill_slot): chunk lengths come from a fixed bucket ladder,
    so the whole serving loop compiles a handful of programs total.
  * Decode runs `steps_per_call` steps fused in one device program
    (generate.decode_loop); tokens stream back between calls.
  * max_tokens is enforced host-side by flipping `active` before the next
    call; EOS is detected on device (no host round-trip per token).

Sampling parameters are per-slot arrays (ops/sampling.py), so a greedy
request and a top-p request share the same compiled step.
"""

from __future__ import annotations

import codecs
import dataclasses
import queue
import threading
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gabby_tpu.config import ModelConfig
from gabby_tpu.ops import sampling
from gabby_tpu.runtime import generate
from gabby_tpu.runtime.kv_cache import create_cache
from gabby_tpu.tokenizer import ChatFormat, Tokenizer

# chunk-length ladder for slot prefill: smallest bucket >= remaining,
# repeating the largest for long prompts. Few buckets = few compiles.
# (16, 64, 256, 512, 1024) was A/B'd on-chip in round 4: the 1024 bucket
# TANKED mixed serving (797 tok/s @ 2.18 s TTFT vs 1162 @ 0.67 s) —
# single-slot 1024-token chunks hit a slow prefill regime, and the
# coarser ladder wastes more padded rows. 512 stays the ceiling.
PREFILL_BUCKETS = (16, 64, 256, 512)


class RequestError(ValueError):
    """Client-caused request rejection; maps to HTTP 400 at the API layer."""

    status = 400


@dataclasses.dataclass
class EngineConfig:
    batch_slots: int = 8
    max_seq: int = 2048
    # PRNG seed for sampling. Deterministic by default — REQUIRED for
    # multi-host serving, where every controller must sample identical
    # tokens from identical keys
    seed: int = 0
    # decode steps fused per device call: `steps_per_call` when the batch
    # is drained (amortizes dispatch), `steps_per_call_busy` while requests
    # are queued/prefilling (keeps TTFT low — decode bursts between prefill
    # chunks are the thing a waiting request sits behind)
    steps_per_call: int = 32
    steps_per_call_busy: int = 8
    default_max_tokens: int = 512
    default_temperature: float = 0.0   # greedy
    default_top_k: int = 0
    default_top_p: float = 1.0
    kv_quantized: bool = False
    cache_dtype: str = "bfloat16"
    # Paged KV cache (runtime/paged.py): > 0 switches the cache to a
    # shared pool of this many pages. Capacity then scales with tokens in
    # use instead of slots x max_seq, and prefix reuse becomes zero-copy
    # page sharing. 0 = dense per-slot cache.
    paged_pages: int = 0
    page_size: int = 512  # 512 measured ~13% over dense (256: ~33%)
    # Speculative decoding (generate.spec_decode_loop): > 0 verifies up to
    # this many n-gram prompt-lookup drafts per forward pass for GREEDY
    # slots — bit-identical output, several tokens per weight stream when
    # text is self-similar. Auto-disables if measured acceptance is too
    # low to pay for the wider verify. Dense cache only. 0 = off.
    speculate_tokens: int = 0
    # Speculation economics: a verify macro-step costs ~1.14x a plain
    # step on the measured config (v5e, 1B int4, D=4, flash verify
    # kernel — BASELINE.md), so acceptance below ~1.2 tokens/verify
    # LOSES throughput. Exposed so operators can re-derive the constant
    # for their hardware from `tools/ab_decode.py`-style measurements.
    spec_breakeven: float = 1.2
    # Measure the constant instead of trusting it: when True (single-host
    # only — multi-host controllers must flip speculation at identical
    # plans, and wall timings are local), the engine times its own plain
    # and verify bursts and uses median(verify ms/step) / median(plain
    # ms/step) as the break-even once both sides have enough samples.
    # The configured spec_breakeven stays the cold-start prior and the
    # multi-host value. Derived value surfaces as
    # stats["spec_breakeven_derived"].
    spec_auto_breakeven: bool = True
    # Workloads shift (a repetitive-text tenant arrives after a
    # disable): when > 0, a disabled engine RE-PROBES speculation after
    # this many plain decode steps — another fair 128-macro-step sample,
    # then keep or drop it again. Derived from replicated counters, so
    # every multi-host controller flips at the identical plan. 0 =
    # sticky-off for the engine's lifetime.
    spec_reprobe_steps: int = 8192
    # Prefill through an EXACT int8 shadow of int4 weights
    # (quant.promote_int4_to_int8): at prefill-sized M the int4 XLA path
    # materializes the unpacked weight per call (44k vs int8's 53k tok/s
    # prefill on the 1B) and the large-tile_m kernel is unstable on the
    # v5e toolchain. The shadow costs 2x the int4 weight bytes of HBM,
    # changes NO numerics (same codes, same scales), and decode keeps the
    # packed int4 stream. No-op unless the params tree holds int4.
    prefill_int8_shadow: bool = False
    # Paired kv-head cache layout (kv_cache.create_cache(paired=True) /
    # paged.create_paged_cache(paired=True)): adjacent head pairs
    # interleaved on the lane axis so the flash decode kernel's dots run
    # 128-deep contraction with 2x the rows — half the MXU passes on the
    # structural GQA bottleneck (BASELINE.md round 3). Dense AND paged
    # caches; requires an even kv-head count (per shard, if the cache is
    # TP-sharded — shardings + pairing still unvalidated together).
    # Chunked prefill takes the jnp fallback under pairing
    # (ops/attention.slot_prefill_attention), so this is a decode-
    # throughput knob; measure with `tools/ab_decode.py pair`.
    pair_kv_heads: bool = False
    # Dispatch-ahead decode pipelining: dispatch decode burst N+1 BEFORE
    # fetching burst N's packed host view, intending the (latency-bound)
    # host transfer to overlap the next burst's device compute instead of
    # serializing with it. Device state stays exact — EOS masking,
    # positions, and sampling all live on device — while HOST bookkeeping
    # (max_tokens, stop strings, slot frees) lags by exactly one burst:
    # overshoot tokens are discarded at emission (slot epochs guard
    # re-admitted slots), and the attention window adds the pending
    # burst's steps so a lagged token count can never under-provision the
    # kernel grid. Auto-disabled under speculation (verify wall timings +
    # acceptance accounting need synchronous fetches) and multi-host
    # (plan lockstep).
    #
    # Default OFF — MEASURED a serving LOSS on this environment's
    # tunneled chip (r5b same-session alternating mixed ladder, warm
    # caches: 1271/1220 tok/s @ ~0.66 s p50 TTFT synchronous vs 188/631
    # @ 8.3/2.0 s pipelined): the tunnel transport serializes the D2H
    # fetch of burst N BEHIND burst N+1's already-enqueued execution, so
    # the wire time is not hidden — it now waits out the next burst's
    # compute too, and every first token emits one burst late. Opt-in
    # (GABBY_PIPELINE=1 in bench.py) for deployments whose D2H path is
    # genuinely out-of-band with program execution.
    pipeline_fetch: bool = False
    # Sequence-parallel prefill for LONG admissions under a dp>1 mesh
    # (parallel/sp.py; SURVEY §2b SP/CP row, BASELINE config 5): a single
    # long prompt leaves the mesh's data axis idle during its chunked
    # prefill — slots shard over it but one prompt occupies one slot.
    # Admission chunks whose bucket is >= sp_prefill_tokens (and divisible
    # by dp) ride sp_prefill_slot instead: the chunk's token axis shards
    # over the data axis (Ulysses-style K/V all-gather placed by GSPMD, or
    # ring attention over ICI when sp_prefill_ring). Deterministic from
    # bucket+config, so multi-host plan replay stays in lockstep. Dense
    # cache under a mesh with dp>1 only (paged admissions keep the
    # per-slot path). 0 disables.
    sp_prefill_tokens: int = 1024
    sp_prefill_ring: bool = False
    # Admission ordering when requests wait for a slot: "spf" = shortest
    # prompt first (a short prompt stuck behind a long one otherwise pays
    # that prompt's whole prefill in TTFT; classic SJF mean-latency win),
    # "fifo" = arrival order. The starvation guard promotes the OLDEST
    # waiter once it has aged past spf_age_limit seconds.
    admission_policy: str = "spf"
    spf_age_limit: float = 5.0


@dataclasses.dataclass
class Request:
    prompt_ids: list[int]
    max_tokens: int
    temperature: float
    top_k: int
    top_p: float
    stop: list[str] = dataclasses.field(default_factory=list)
    # engine pushes (delta_text, finish_reason|None) tuples; a final item
    # always has finish_reason set. On engine shutdown pushes (None, "abort").
    out: "queue.Queue[tuple[Optional[str], Optional[str]]]" = dataclasses.field(
        default_factory=queue.Queue)
    # filled in when finished
    completion_tokens: int = 0
    submit_ts: float = dataclasses.field(default_factory=time.monotonic)
    first_token_ts: Optional[float] = None
    # set via Engine.cancel(); the engine frees the slot at the next loop
    # iteration instead of generating to max_tokens for a vanished client
    cancelled: bool = False
    # every generated token id and its log-probability under the full
    # softmax (parallel lists; includes tokens a stop-sequence cut
    # suppressed from the text). Appended INCREMENTALLY by the engine
    # thread before each out-queue push, so a streaming reader that pops a
    # delta may safely read the list prefix written so far (the queue
    # hand-off orders the appends) — this is what streams logprobs in SSE
    # chunks without a second channel.
    token_ids: list[int] = dataclasses.field(default_factory=list)
    token_logprobs: list[float] = dataclasses.field(default_factory=list)
    # scheduling extensions (carried on the OpenAI surface as the
    # documented extension fields `priority` / `deadline_ms`): requests
    # with higher priority admit first (within a stratum the configured
    # policy orders as usual); a deadline is a relative wall-clock budget
    # from submission — expired-while-queued requests fail fast with 408
    # instead of burning a prefill nobody is waiting for, near-deadline
    # ones jump the queue (EDF), and an expired in-flight request is
    # finished with reason "deadline", returning what it generated
    priority: int = 0
    deadline_s: Optional[float] = None
    # OpenAI sampling penalties: presence/frequency in [-2, 2] (0 = off)
    # and logit_bias {token_id: bias in [-100, 100]}. Applied on device to
    # every sampled distribution (decode loop AND the admission-time first
    # token); logprobs/top_logprobs report the ADJUSTED distribution.
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    logit_bias: Optional[dict[int, float]] = None
    # HF/vLLM-style repetition_penalty (extension field — OpenAI has no
    # equivalent): tokens seen in the PROMPT or sampled so far get
    # logit/rep when positive, logit*rep when negative. 1.0 = off. This
    # is the prompt-aware knob; presence/frequency follow OpenAI's
    # sampled-only formula.
    repetition_penalty: float = 1.0
    # OpenAI `seed`: best-effort reproducible sampling. Normalized to
    # [0, 2^31) at submit; None = the engine-global key stream. A seeded
    # request reproduces its sampled output regardless of batch
    # composition, admission order, or device-call fusion (the lane draws
    # from fold_in(PRNGKey(seed), position)).
    seed: Optional[int] = None
    # engine-originated rehearsal traffic (Engine.warmup): excluded from
    # request counters, TTFT samples, and tracing spans at the recording
    # sites, so a REAL request that completes while the rehearsal runs
    # keeps its stats (ADVICE r4: warmup's blanket reset_stats erased
    # them)
    internal: bool = False

    @property
    def penalized(self) -> bool:
        return bool(self.presence_penalty or self.frequency_penalty
                    or self.logit_bias
                    or self.repetition_penalty != 1.0)
    # OpenAI `top_logprobs`: 0 = off; 1-20 = per generated token, also
    # record the top-k alternatives of its distribution as (id, logprob)
    # pairs (parallel to token_ids, same incremental-append contract)
    top_logprobs: int = 0
    token_top: list[list[tuple[int, float]]] = dataclasses.field(
        default_factory=list)


@dataclasses.dataclass
class _Slot:
    request: Request
    prompt_len: int = 0
    # first token was sampled on device at admission; emit it from the
    # next packed host fetch
    first_pending: bool = False
    # incremental detokenization state: a codecs UTF-8 decoder holds any
    # incomplete multi-byte tail; text_held buffers decoded-but-unemitted
    # text (the stop-string holdback window). The emit path decodes only
    # each NEW token's bytes — O(1) amortized per token, where re-decoding
    # the full emitted list was O(n^2) in max_tokens (VERDICT r2 weak #3).
    dec: object = dataclasses.field(
        default_factory=lambda: codecs.getincrementaldecoder("utf-8")(
            errors="replace"))
    text_held: str = ""
    drop_tail: bool = False  # stop-sequence cut: suppress the tail flush
    # top-candidate (ids, logprobs) of the on-device-sampled FIRST token's
    # distribution, captured at admission when the request asked for
    # top_logprobs; consumed by the first_pending emit
    first_top: Optional[tuple] = None


@dataclasses.dataclass
class _Admission:
    """A request mid-prefill: its chunks interleave with decode calls."""

    slot_ix: int
    req: Request
    ids: np.ndarray
    offset: int = 0
    last_logits: Optional[jnp.ndarray] = None


@dataclasses.dataclass
class _BurstRecord:
    """One dispatched decode burst's not-yet-fetched outputs
    (EngineConfig.pipeline_fetch): the packed host-view DEVICE array plus
    everything needed to unpack and emit it one iteration later. `epochs`
    snapshots each slot's _finish generation at dispatch, so emissions
    into a slot that was freed (and possibly re-admitted) in between are
    dropped — those are exactly the overshoot tokens host bookkeeping
    would have suppressed under a synchronous fetch."""

    packed_dev: jnp.ndarray
    steps: int
    b: int
    n_top: int
    epochs: tuple
    # slots whose admission-time first token this record's packed view
    # carries (first_pending at dispatch). A slot admitted AFTER dispatch
    # keeps first_pending until the record that actually contains its
    # first token — emitting from an older record would deliver the
    # previous occupant's (or zero-initialized) lane value.
    first_slots: tuple = ()


class Engine:
    """Continuous-batching engine over a fixed slot batch.

    `params` may live on any sharding (TP mesh); the engine only dispatches
    jitted calls and never inspects weights.
    """

    def __init__(self, cfg: ModelConfig, params, tokenizer: Tokenizer,
                 econfig: EngineConfig = EngineConfig(), *,
                 cache_shardings=None, stop_ids: Optional[set[int]] = None,
                 sync=None):
        """sync: a parallel.multihost.HostSync for multi-controller serving.
        When given (and process_count > 1), the loop becomes PLAN-DRIVEN:
        the leader (process 0, owning the HTTP front door) composes each
        iteration's plan — admissions with their token ids and sampling
        params, decode burst length — broadcasts it, and every process
        replays the identical jitted calls on its shards of the global
        mesh. Followers keep full shadow slot state (stub Requests nobody
        reads), so host-side decisions (EOS, max_tokens, stop strings)
        stay in lockstep without further communication. dp > 1 works: the
        per-iteration host view is replicated at a jit boundary before the
        fetch (_host_fetch), so data-sharded slot feedback reads
        identically on every controller. Shut down via the leader: it
        broadcasts the shutdown plan that releases the followers."""
        self.cfg = cfg
        self.params = params
        # adopt the 4 MB weight-tile budget when the live toolchain's
        # scoped-VMEM limit allows it (compile probe — no-op off-TPU or
        # when GABBY_QMM_BIGTILES pins a budget; must run before the
        # serving programs trace, see quant_matmul.set_tile_budget)
        if cache_shardings is None:
            from gabby_tpu.ops import quant as _quant
            from gabby_tpu.ops.pallas import quant_matmul as _pqm
            _pqm.probe_big_tiles(_quant.int4_matmul_shapes(params))
        self._prefill_params = params
        if econfig.prefill_int8_shadow:
            from gabby_tpu.ops.quant import promote_int4_to_int8
            self._prefill_params = promote_int4_to_int8(params)
        self.tokenizer = tokenizer
        self.chat = ChatFormat(tokenizer)
        self.ec = econfig
        b = econfig.batch_slots
        if econfig.max_seq % PREFILL_BUCKETS[0] != 0:
            # prefill writes full bucket-sized blocks; _chunk_schedule only
            # guarantees offset+bucket <= max_seq (no clamped, KV-corrupting
            # dynamic_update_slice) when max_seq sits on the bucket grid
            raise ValueError(
                f"max_seq={econfig.max_seq} must be a multiple of "
                f"{PREFILL_BUCKETS[0]} (the prefill bucket grid)")

        self._paged = econfig.paged_pages > 0
        self._pt_sharding = None
        if econfig.pair_kv_heads and cache_shardings is not None:
            # the paired layout halves the kv-head axis; cache_shardings'
            # specs would still apply name-wise but the kernels' paired
            # path has never been validated under a mesh — fail loudly
            raise ValueError("pair_kv_heads is single-device only for now "
                             "(unvalidated under cache shardings)")
        if self._paged:
            from gabby_tpu.runtime.paged import (PageAllocator,
                                                 create_paged_cache)
            ps = econfig.page_size
            if econfig.max_seq % ps != 0:
                raise ValueError(f"max_seq must be a multiple of "
                                 f"page_size={ps} in paged mode")
            if econfig.pair_kv_heads and cfg.num_kv_heads % 2:
                raise ValueError("pair_kv_heads needs an even kv-head count")
            cache = create_paged_cache(
                cfg, b, econfig.max_seq, econfig.paged_pages,
                dtype=jnp.dtype(econfig.cache_dtype),
                quantized=econfig.kv_quantized, page_size=ps,
                paired=econfig.pair_kv_heads)
            if cache_shardings is not None:
                # TP-sharded page pools (parallel.paged_cache_shardings):
                # the caller passes PagedKVCache-shaped shardings; the
                # page table's sharding is kept so every host-side table
                # push lands replicated without an implicit transfer
                cache = jax.device_put(cache, cache_shardings)
                self._pt_sharding = cache_shardings.page_table
            self._alloc = PageAllocator(econfig.paged_pages)
            # physical page 0 is the permanent SCRATCH page: stale page-
            # table entries point at it, so parked-position writes and
            # dead-entry reads can never touch a live page
            assert self._alloc.alloc(1) == [0]
            self._slot_pages: list[list[int]] = [[] for _ in range(b)]
            self._pt_host = np.zeros((b, econfig.max_seq // ps), np.int32)
            # paged chunk writes are page-granular: buckets sit on the
            # page grid
            self._buckets = tuple(sorted({ps, max(ps, 512)}))
        else:
            if econfig.pair_kv_heads and cfg.num_kv_heads % 2:
                raise ValueError("pair_kv_heads needs an even kv-head count")
            cache = create_cache(cfg, b, econfig.max_seq,
                                 dtype=jnp.dtype(econfig.cache_dtype),
                                 quantized=econfig.kv_quantized,
                                 paired=econfig.pair_kv_heads)
            if cache_shardings is not None:
                cache = jax.device_put(cache, cache_shardings)
            self._buckets = PREFILL_BUCKETS
        self._cache = cache

        # cache-carrying jits with pinned boundary layouts (see
        # generate.CacheLoops: XLA's auto layouts otherwise pay four
        # full-cache copies per decode call); the fresh cache is placed on
        # the pinned layout up front so the first call's arg already
        # matches (required when a persistent compilation cache serves the
        # executable — see CacheLoops.pin_cache)
        self._gen = generate.CacheLoops(cache, cache_shardings)
        self._cache = cache = self._gen.pin_cache(cache)

        # sequence-parallel prefill (EngineConfig.sp_prefill_tokens): only
        # for a DENSE cache sharded over a mesh whose data axis > 1 —
        # that's when a long admission leaves devices idle
        self._sp_mesh = None
        if (econfig.sp_prefill_tokens > 0 and cache_shardings is not None
                and not self._paged):
            from jax.sharding import NamedSharding as _NS
            _leaves = jax.tree.leaves(
                cache_shardings, is_leaf=lambda x: isinstance(x, _NS))
            _leaves = [s for s in _leaves if isinstance(s, _NS)]
            if _leaves and _leaves[0].mesh.shape.get("data", 1) > 1:
                self._sp_mesh = _leaves[0].mesh

        stop = stop_ids if stop_ids is not None else self.chat.stop_ids()
        self._eos_ids = jnp.asarray(sorted(stop), jnp.int32)

        if not 0 <= econfig.speculate_tokens <= 15:
            # the verify block is draft+1 rows; <= 16 keeps its clamped
            # tail inside the last bucket-grid margin (see verify_step)
            raise ValueError("speculate_tokens must be in [0, 15]")
        self._spec_enabled = econfig.speculate_tokens > 0
        # acceptance-probe window start (spec_macro_steps, spec_tokens at
        # the current probe's beginning) and, when disabled, the
        # decode_steps count at which the disable happened (re-probe timer)
        self._spec_probe_base = (0, 0)
        self._spec_off_since: Optional[int] = None
        # measured per-step wall costs (seconds) for the auto break-even:
        # rolling windows so a drifting chip (contention, thermal) keeps
        # the ratio current
        import collections as _c
        self._plain_step_s: "_c.deque[float]" = _c.deque(maxlen=32)
        self._spec_step_s: "_c.deque[float]" = _c.deque(maxlen=32)
        self._plain_probe_ctr = 0
        # per-slot token history: the n-gram speculation corpus (prompt
        # placed at admission, generated tokens appended on device)
        self._history = jnp.zeros((b, econfig.max_seq), jnp.int32)

        # on-device slot state. Free slots' positions are PARKED at
        # max_seq-1: decode_step writes every slot's fresh k/v row at
        # positions[i] with no active gating, and decode interleaves with
        # another slot's multi-chunk prefill — a stale position inside the
        # prompt range would overwrite already-prefilled KV rows. Row
        # max_seq-1 is safe: attention masks j < pos, and a live slot
        # overwrites that row with real data (at pos == max_seq-1) before
        # any step could read it.
        self._park = econfig.max_seq - 1
        self._tokens = jnp.zeros((b,), jnp.int32)
        self._positions = jnp.full((b,), self._park, jnp.int32)
        self._active = jnp.zeros((b,), bool)
        self._first_lp = jnp.zeros((b,), jnp.float32)
        self._sstate = generate.SamplingState(
            temperature=jnp.zeros((b,), jnp.float32),
            top_k=jnp.zeros((b,), jnp.int32),
            top_p=jnp.ones((b,), jnp.float32),
            key=jax.random.PRNGKey(econfig.seed),
            seed=jnp.full((b,), -1, jnp.int32),
        )
        self._sync = sync
        self._multi = sync is not None and sync.num_processes > 1
        # dp > 1 multi-host: per-slot feedback arrays shard over the data
        # axis, so a raw device_get would only see this process's
        # addressable half. Replicating the ONE packed host-view vector at
        # a jit boundary (an all-gather of a few KB over the data axis)
        # makes every controller's fetch identical — the plan-replay
        # contract dp=1 used to get for free.
        self._fetch_replicate = None
        if self._multi and cache_shardings is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            leaves = [s for s in jax.tree.leaves(
                cache_shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
                if isinstance(s, NamedSharding)]
            if leaves and leaves[0].mesh.shape.get("data", 1) > 1:
                rep = NamedSharding(leaves[0].mesh, PartitionSpec())
                self._fetch_replicate = jax.jit(lambda x: x,
                                                out_shardings=rep)
        # dispatch-ahead decode pipelining (EngineConfig.pipeline_fetch):
        # one outstanding burst record whose packed host view is fetched
        # only after the NEXT burst dispatches. Slot epochs (bumped per
        # _finish) keep a pending record from emitting into a slot that
        # was freed and re-admitted after its dispatch.
        self._pipeline = (econfig.pipeline_fetch
                          and econfig.speculate_tokens == 0
                          and not self._multi)
        self._pending_burst: Optional[_BurstRecord] = None
        self._slot_epoch = [0] * b
        # leader-side handoff between plan composition and execution
        self._pending_admit: Optional[Request] = None
        self._burst_reqs: Optional[list[Request]] = None

        # host-side mirrors
        self._slots: list[Optional[_Slot]] = [None] * b
        # prefix KV registry: the prompt whose KV rows are RESIDENT in each
        # slot's cache (kept after the request finishes; invalidated when a
        # new admission starts overwriting the slot). A new request with a
        # matching token prefix copies those rows instead of recomputing
        # them (copy_slot_prefix) — shared system prompts admit in ~100 us
        # instead of a full prefill.
        self._slot_prompts: list[Optional[list[int]]] = [None] * b
        self._queue: "queue.Queue[Request]" = queue.Queue()
        # engine-thread-side waiting room: the ingress queue drains here so
        # admission ORDER is a policy (shortest-prompt-first by default),
        # not the queue's FIFO
        self._backlog: list[Request] = []
        self._wake = threading.Event()
        self._shutdown = False
        self._lock = threading.Lock()

        # serving metrics (scraped by /statusz via the bridge)
        self.stats = {"requests": 0, "completion_tokens": 0,
                      "prompt_tokens": 0, "decode_steps": 0,
                      "burst_admissions": 0, "prefix_hits": 0,
                      "prefix_tokens_reused": 0, "spec_macro_steps": 0,
                      "spec_tokens": 0,
                      # gauge: is speculation currently active (1/0), and
                      # how many times the acceptance probe flipped it off
                      "spec_on": int(econfig.speculate_tokens > 0),
                      "spec_disables": 0}
        self._ttfts: list[float] = []  # rolling, for p50 TTFT
        # request-level tracing spans: the last 32 finished requests'
        # lifecycle timings, surfaced under /statusz `engine.recent` so an
        # operator can see WHERE a slow request spent its time without
        # attaching a profiler (queue wait vs prefill vs decode)
        import collections
        self._spans: "collections.deque[dict]" = collections.deque(maxlen=32)
        self._admit_key = jax.random.PRNGKey(0x6ABB)

        # OpenAI penalties/logit_bias: device state exists ONLY while some
        # live request uses them (None compiles the fast penalty-free
        # decode program; see generate.PenaltyState)
        self._pstate = None
        self._pen_slots: set[int] = set()

        self._failed = False  # _fail_all_requests ran (idempotency)
        self._fail_msg: Optional[str] = None
        self._thread = threading.Thread(target=self._loop_guarded,
                                        daemon=True, name="gabby-engine")
        self._thread.start()
        if (self._multi and self._sync.timeout is not None
                and getattr(self._sync, "_client", None) is not None):
            # multi-host failure watchdog: a peer that dies INSIDE a
            # device collective leaves this controller's loop thread
            # blocked in the jit call forever — no exception, and the
            # plan-broadcast timeout never fires because the loop never
            # reaches it. The watchdog checks the coordination-service
            # liveness counters (HostSync.dead_peers) and fails all
            # in-flight work within a bounded time instead; the stuck
            # daemon thread is abandoned (the distributed runtime is not
            # recoverable past an abandoned collective).
            threading.Thread(target=self._watchdog, daemon=True,
                             name="gabby-watchdog").start()

    # ---- public API ----

    def submit(self, messages: list[dict[str, str]], **kw) -> Request:
        """Queue a chat request (Llama-3 chat template applied). Returns the
        Request whose `out` queue yields (delta_text, finish_reason|None)
        until a final item."""
        return self.submit_ids(self.chat.prompt_ids(messages), **kw)

    def submit_raw(self, prompt: str, **kw) -> Request:
        """Queue a raw text-completion request (no chat template; BOS +
        encoded prompt) — the legacy /v1/completions path."""
        ids = [self.tokenizer.token_id("<|begin_of_text|>")]
        ids += self.tokenizer.encode(prompt)
        return self.submit_ids(ids, **kw)

    def submit_ids(self, prompt_ids: list[int], *,
                   max_tokens: Optional[int] = None,
                   temperature: Optional[float] = None,
                   top_k: Optional[int] = None,
                   top_p: Optional[float] = None,
                   stop: Optional[list[str]] = None,
                   top_logprobs: int = 0,
                   priority: int = 0,
                   deadline_s: Optional[float] = None,
                   presence_penalty: float = 0.0,
                   frequency_penalty: float = 0.0,
                   logit_bias: Optional[dict] = None,
                   repetition_penalty: float = 1.0,
                   seed: Optional[int] = None,
                   internal: bool = False) -> Request:
        ec = self.ec
        if not 0 <= (top_logprobs or 0) <= 20:
            raise RequestError("top_logprobs must be in [0, 20]")
        if not 0.0 < (repetition_penalty or 1.0) <= 10.0:
            raise RequestError("repetition_penalty must be in (0, 10]")
        if not -8 <= int(priority or 0) <= 8:
            raise RequestError("priority must be in [-8, 8]")
        if deadline_s is not None and not deadline_s > 0:
            raise RequestError("deadline_ms must be > 0")
        for name, v in (("presence_penalty", presence_penalty),
                        ("frequency_penalty", frequency_penalty)):
            if not -2.0 <= (v or 0.0) <= 2.0:
                raise RequestError(f"{name} must be in [-2, 2]")
        if seed is not None:
            try:
                seed = int(seed) & 0x7FFFFFFF
            except (TypeError, ValueError):
                raise RequestError("seed must be an integer")
        bias: Optional[dict[int, float]] = None
        if logit_bias:
            try:
                bias = {int(k): float(v) for k, v in logit_bias.items()}
            except (TypeError, ValueError):
                raise RequestError("logit_bias keys must be token ids")
            if len(bias) > 300:  # OpenAI's documented cap
                raise RequestError("logit_bias supports at most 300 entries")
            for k, v in bias.items():
                if not 0 <= k < self.cfg.vocab_size:
                    raise RequestError(f"logit_bias token id {k} out of "
                                       f"vocab range")
                if not -100.0 <= v <= 100.0:
                    raise RequestError("logit_bias values must be in "
                                       "[-100, 100]")
        limit = ec.max_seq - 1
        if len(prompt_ids) > limit:
            # OpenAI semantics: over-length context is the CLIENT's error —
            # rejecting beats silently answering a truncated prompt
            raise RequestError(
                f"prompt is {len(prompt_ids)} tokens but this server's "
                f"context window is {ec.max_seq} (max prompt {limit})")
        if top_k is not None and top_k > sampling.MAX_CANDIDATES:
            # sampling pre-slices a static top-{MAX_CANDIDATES} candidate
            # set on device (ops/sampling.py); larger top_k would be
            # silently clamped, so reject it loudly instead
            raise RequestError(
                f"top_k={top_k} exceeds the supported maximum of "
                f"{sampling.MAX_CANDIDATES}")
        req = Request(
            prompt_ids=prompt_ids,
            max_tokens=max_tokens if max_tokens and max_tokens > 0
            else ec.default_max_tokens,
            temperature=temperature if temperature is not None and
            temperature >= 0 else ec.default_temperature,
            top_k=top_k if top_k is not None and top_k >= 0 else ec.default_top_k,
            top_p=top_p if top_p is not None and 0 < top_p <= 1 else ec.default_top_p,
            stop=[s for s in (stop or []) if s][:8],
            top_logprobs=int(top_logprobs or 0),
            priority=int(priority or 0),
            deadline_s=deadline_s,
            presence_penalty=float(presence_penalty or 0.0),
            frequency_penalty=float(frequency_penalty or 0.0),
            logit_bias=bias,
            repetition_penalty=float(repetition_penalty or 1.0),
            seed=seed,
            internal=internal,
        )
        # a STOPPED engine (shutdown, loop death, or the multi-host
        # watchdog declaring the cluster dead) must not accept work into a
        # queue nobody drains — the submitter's out.get would hang
        # forever. The check and the enqueue share the lock so a request
        # can never slip in after _fail_all_requests' (or _loop's
        # shutdown) drain: the flag is set BEFORE either drain runs.
        with self._lock:
            if self._failed or self._shutdown:
                req.out.put((None, self._fail_msg or "abort"))
                return req
            self._queue.put(req)
        self._wake.set()
        return req

    def generate_sync(self, messages: list[dict[str, str]],
                      on_delta: Optional[Callable[[str], None]] = None,
                      **kw) -> tuple[str, str, int, int]:
        """Blocking helper: returns (text, finish_reason, prompt_tokens,
        completion_tokens); calls on_delta per streamed chunk."""
        req = self.submit(messages, **kw)
        parts: list[str] = []
        while True:
            delta, fin = req.out.get()
            if delta:
                parts.append(delta)
                if on_delta:
                    on_delta(delta)
            if fin is not None:
                return ("".join(parts), fin, len(req.prompt_ids),
                        req.completion_tokens)

    def warmup(self, concurrency: Optional[int] = None) -> float:
        """Dress-rehearse the serving program set so the first real request
        never pays compilation (a cold server otherwise answers /healthz in
        seconds but stalls minutes on the first POST while the serving
        programs compile — VERDICT r3 weak #1). Mirrors bench.py's serving
        warm-up: one solo request first (single-admission + decode + finish
        programs), then a concurrent wave at 2x the slot count whose prompt
        lengths cover the prefill bucket ladder — burst admissions,
        multi-chunk prefill, the busy/drained decode-burst step ladder, and
        one prefix-donor copy (a repeat of the solo prompt). Synthetic token
        ids, no tokenizer dependence; rehearsal requests are tagged
        internal=True so they never touch the request counters, TTFT
        samples, or tracing spans — a REAL request that completes while
        the rehearsal runs (the HTTP socket is already open) keeps its
        stats (ADVICE r4: the old blanket reset_stats erased them).
        Rehearsal-thread failures propagate: a broken rehearsal raises
        instead of returning a success duration. Speculation state is
        restored afterwards too — synthetic prompts would otherwise feed
        the acceptance probe garbage and could disable speculation for
        real traffic. Single-host only: in multi-host mode the followers
        replay plans but never run this method, so the leader-side stat
        reset would desynchronize the replicated counters the speculation
        flip depends on. Returns seconds elapsed."""
        if self._multi:
            raise RuntimeError(
                "Engine.warmup is single-host only (a leader-side stats "
                "reset would desynchronize the replicated counters "
                "multi-host speculation decisions derive from)")
        t0 = time.monotonic()
        ec = self.ec
        spec_was = self._spec_enabled
        gen = max(4, min(max(ec.steps_per_call, ec.steps_per_call_busy) + 2,
                         ec.max_seq // 4))
        limit = max(1, ec.max_seq - 1 - gen)
        lens = sorted({min(b, limit) for b in self._buckets})
        multi_chunk = self._buckets[-1] + self._buckets[0]
        if multi_chunk <= limit:
            lens.append(multi_chunk)

        vocab = max(2, self.cfg.vocab_size - 2)

        def ids_for(i: int, n: int) -> list[int]:
            # distinct deterministic streams so the wave can't all ride the
            # prefix donor (i == 0 repeated exercises exactly that path)
            return [(i * 7919 + j * 104729) % vocab + 1 for j in range(n)]

        errs: list[BaseException] = []

        def run(i: int, n: int) -> None:
            try:
                req = self.submit_ids(ids_for(i, n), max_tokens=gen,
                                      internal=True)
                while req.out.get()[1] is None:
                    pass
            except BaseException as e:  # propagated after join
                errs.append(e)

        run(0, lens[0])  # solo: admission/decode/finish compile first
        n = concurrency if concurrency else 2 * ec.batch_slots
        threads = []
        for i in range(1, n + 1):
            ln = lens[i % len(lens)]
            src = 0 if i == 1 else i  # i == 1 repeats the solo prompt
            threads.append(threading.Thread(
                target=run, args=(src, lens[0] if i == 1 else ln)))
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errs:
            raise RuntimeError(
                f"warmup rehearsal failed ({len(errs)} request(s); "
                f"first: {errs[0]!r})") from errs[0]
        # restore speculation exactly as configured: the rehearsal's
        # synthetic token streams are not evidence about real traffic
        self._spec_enabled = spec_was
        if spec_was:
            self._spec_off_since = None
        self._plain_step_s.clear()   # compile-laden wall times out of the
        self._spec_step_s.clear()    # auto-break-even windows
        return time.monotonic() - t0

    def cancel(self, req: Request) -> None:
        """Abort a submitted request: its slot (or queue entry, or
        in-flight admission) is released at the next loop iteration and a
        final ("cancelled") item is pushed. Multi-host safe — the leader
        folds cancellations into the broadcast plan."""
        req.cancelled = True
        self._wake.set()

    def reset_stats(self) -> None:
        """Zero the serving counters/TTFTs (e.g. after a warm-up phase, so
        p50 TTFT reflects only the measured workload)."""
        with self._lock:
            for k in self.stats:
                self.stats[k] = 0
            # gauges and probe baselines are NOT cumulative counters:
            # re-derive them so the acceptance window and re-probe timer
            # stay consistent with the zeroed counters
            self.stats["spec_on"] = int(self._spec_enabled)
            self._spec_probe_base = (0, 0)
            if self._spec_off_since is not None:
                self._spec_off_since = 0
            self._ttfts.clear()
            self._spans.clear()

    def stats_snapshot(self) -> dict:
        """Engine-side serving metrics (TTFT is admit -> first token).
        Called from HTTP worker threads; `_lock` guards stats/_ttfts against
        the engine thread's mutations."""
        with self._lock:
            s = dict(self.stats)
            ttfts = list(self._ttfts)
            s["recent"] = list(self._spans)  # request tracing spans
        if ttfts:
            s["p50_ttft_ms"] = round(float(np.median(ttfts)) * 1e3, 2)
        s["active_slots"] = sum(1 for x in self._slots if x is not None)
        s["queued"] = self._queue.qsize() + len(self._backlog)
        return s

    def shutdown(self) -> None:
        # the flag must flip UNDER the lock: submit() holds it across its
        # check-and-enqueue, so any request that saw _shutdown == False has
        # already enqueued when we set it here, and the loop's final drain
        # (which runs after it observes the flag) will abort that entry —
        # without the lock a racing submit could enqueue after the drain
        # and its client would block forever
        with self._lock:
            self._shutdown = True
        self._wake.set()
        self._thread.join(timeout=30)

    # ---- engine loop ----

    def _host_fetch(self, vec) -> np.ndarray:
        """The single per-iteration host transfer. Under dp > 1 multi-host
        the vector is replicated first (see _fetch_replicate) so every
        controller fetches identical bytes."""
        if self._fetch_replicate is not None:
            vec = self._fetch_replicate(vec)
        return np.asarray(jax.device_get(vec))

    def _free_slots(self) -> list[int]:
        return [i for i, s in enumerate(self._slots) if s is None]

    def _attn_window(self, steps: int) -> Optional[int]:
        """Static attention-window bucket for this decode call: the
        smallest power-of-two (>= one flash chunk) covering every live
        slot's furthest possible read. The kernel's chunk grid shrinks to
        the bucket, so a max_seq-8192 engine serving 512-token contexts
        pays 512-row attention, not 8192 grid steps per (slot, layer).
        Power-of-two ladder -> a handful of compiled programs. Followers
        compute the identical value from their shadow slots (multi-host
        lockstep). None when the dense path should use the full window."""
        if self._paged:
            return None  # paged grid is page-table-bounded separately
        live = [s.prompt_len + len(s.request.token_ids)
                for s in self._slots if s is not None]
        if not live:
            return None
        span = (self.ec.speculate_tokens + 1) if self._spec_enabled else 1
        # pipelined fetches (pipeline_fetch): host token counts lag the
        # device by the pending burst's steps — cover them, or a lagged
        # count could under-provision the kernel grid at a bucket edge
        lag = self._pending_burst.steps if self._pending_burst else 0
        need = max(live) + lag + steps * span + 2
        w = 1024  # the flash kernel's chunk size
        while w < need:
            w *= 2
        return min(w, self.ec.max_seq)

    def _next_bucket(self, remaining: int, offset: int) -> int:
        """Smallest ladder bucket >= remaining that still fits before
        max_seq; when none covers `remaining`, the largest that fits (the
        prompt continues in later chunks). Never lets a bucket-sized write
        cross the cache end — with max_seq on the bucket grid a fitting
        bucket always exists (offsets advance in bucket multiples). Paged
        mode uses a page-aligned ladder so chunk writes stay
        page-granular."""
        room = self.ec.max_seq - offset
        for bkt in self._buckets:
            if bkt >= remaining and bkt <= room:
                return bkt
        return max(b for b in self._buckets if b <= room)

    def _chunk_schedule(self, n: int) -> tuple:
        """The static (offset, bucket) chunk sequence a prompt of n tokens
        prefills through."""
        out = []
        offset = 0
        while offset < n:
            bucket = self._next_bucket(n - offset, offset)
            out.append((offset, bucket))
            offset += min(bucket, n - offset)
        return tuple(out)

    @staticmethod
    def _req_meta(req: Request) -> dict:
        """The request fields a follower controller needs to mirror all
        host-side decisions (sampling splice, max_tokens, stop matching)."""
        return dict(max_tokens=req.max_tokens, temperature=req.temperature,
                    top_k=req.top_k, top_p=req.top_p, stop=list(req.stop),
                    top_logprobs=req.top_logprobs,
                    presence_penalty=req.presence_penalty,
                    frequency_penalty=req.frequency_penalty,
                    logit_bias=(dict(req.logit_bias)
                                if req.logit_bias else None),
                    repetition_penalty=req.repetition_penalty,
                    seed=req.seed)

    @staticmethod
    def _stub_request(ids, meta: dict) -> Request:
        """Follower-side shadow of the leader's Request: same control
        fields, but its out queue has no reader (deltas are dropped)."""
        return Request(prompt_ids=list(ids), **meta)

    # ---- paged-pool bookkeeping (self._paged only) ----

    def _push_page_table(self) -> None:
        pt = jnp.asarray(self._pt_host)
        # the table leaf is deliberately NOT layout-pinned (see
        # generate.CacheLoops: the persistent compilation cache drops
        # custom output layouts, so a pin here would desync cache-served
        # executables). CacheLoops.formats holds its plain sharding; on a
        # mesh the push must land replicated without an implicit transfer.
        fmt = (self._gen.formats.page_table
               if self._gen.formats is not None else self._pt_sharding)
        if fmt is not None:
            pt = jax.device_put(pt, fmt)
        self._cache = dataclasses.replace(self._cache, page_table=pt)

    def _release_slot_pages(self, slot_ix: int) -> None:
        """Drop this slot's page references (shared pages survive via
        other holders' refcounts) and clear its prefix-registry entry."""
        if self._slot_pages[slot_ix]:
            self._alloc.release(self._slot_pages[slot_ix])
            self._slot_pages[slot_ix] = []
        self._pt_host[slot_ix, :] = 0  # stale entries -> scratch page
        self._slot_prompts[slot_ix] = None

    def _evict_idle_pages(self, keep: int = -1) -> None:
        """Pool pressure relief: free the resident (prefix-donor) pages of
        FREE slots. Live slots are never touched."""
        for i, s in enumerate(self._slots):
            if s is None and i != keep and self._slot_pages[i]:
                self._release_slot_pages(i)

    def _ensure_pages(self, slot_ix: int, upto_row: int) -> bool:
        """Back rows [0, upto_row) of the slot with physical pages."""
        ps = self.ec.page_size
        need = (min(upto_row, self.ec.max_seq) + ps - 1) // ps
        cur = len(self._slot_pages[slot_ix])
        if need <= cur:
            return True
        got = self._alloc.alloc(need - cur)
        if got is None:
            self._evict_idle_pages(keep=slot_ix)
            got = self._alloc.alloc(need - cur)
            if got is None:
                return False
        self._slot_pages[slot_ix].extend(got)
        for lp in range(cur, need):
            self._pt_host[slot_ix, lp] = self._slot_pages[slot_ix][lp]
        self._push_page_table()
        return True

    def _find_donor(self, ids: list[int]) -> tuple[int, int]:
        """Longest-common-prefix match of `ids` against resident slot
        prompts. Returns (donor_slot, common_len) with common_len rounded
        down to the bucket grid (so suffix-prefill offsets stay on it) and
        capped to leave at least one token to prefill (the admission needs
        last-token logits) and one bucket of cache room. (-1, 0) if no
        match clears the worthwhile threshold."""
        grid = self._buckets[0]
        n = len(ids)
        best, best_common = -1, 0
        for slot_ix, resident in enumerate(self._slot_prompts):
            if resident is None:
                continue
            limit = min(len(resident), n - 1, self.ec.max_seq - grid)
            common = 0
            while common < limit and resident[common] == ids[common]:
                common += 1
            common = (common // grid) * grid
            if common > best_common:
                best, best_common = slot_ix, common
        if best_common < 64:  # below this, the copy isn't worth a device call
            return -1, 0
        return best, best_common

    @staticmethod
    def _slack(req: Request) -> float:
        """Seconds until the request's deadline; +inf without one."""
        if req.deadline_s is None:
            return float("inf")
        return req.submit_ts + req.deadline_s - time.monotonic()

    def _drain_ingress(self) -> None:
        """Move ingress-queue arrivals into the backlog, dropping entries
        cancelled (or deadline-expired) before admission."""
        while True:
            try:
                self._backlog.append(self._queue.get_nowait())
            except queue.Empty:
                break
        kept = []
        for r in self._backlog:
            if r.cancelled:
                r.out.put((None, "cancelled"))
            elif self._slack(r) <= 0:
                # fail fast: prefilling a request whose deadline already
                # passed burns device time nobody is waiting for
                r.out.put((None, "error: deadline exceeded while queued"))
            else:
                kept.append(r)
        self._backlog = kept

    def _pop_next_admission(self) -> Optional[Request]:
        """Admission policy: highest priority stratum first; within it,
        earliest-deadline-first once any deadline is within spf_age_limit
        of expiring (EDF — a deadline at risk outranks a shorter prompt),
        otherwise shortest prompt first under "spf" (minimizes mean TTFT —
        a short request behind a long one otherwise waits that prompt's
        whole prefill) or arrival order under "fifo". The starvation guard
        sits ABOVE the strata: the oldest waiter goes first once it has
        aged past spf_age_limit, so a stream of high-priority arrivals
        delays low-priority work by a bounded time, never forever.
        Leader-only decision; followers see the result through the plan."""
        self._drain_ingress()
        if not self._backlog:
            return None
        # the guard applies under EVERY policy: "fifo" with priority
        # strata starves low-priority work just as surely as spf does
        oldest = min(range(len(self._backlog)),
                     key=lambda i: self._backlog[i].submit_ts)
        if (time.monotonic() - self._backlog[oldest].submit_ts
                > self.ec.spf_age_limit):
            return self._backlog.pop(oldest)
        top = max(r.priority for r in self._backlog)
        stratum = [i for i, r in enumerate(self._backlog)
                   if r.priority == top]
        urgent = [i for i in stratum
                  if self._slack(self._backlog[i]) < self.ec.spf_age_limit]
        if urgent:
            ix = min(urgent, key=lambda i: self._slack(self._backlog[i]))
        elif self.ec.admission_policy == "spf":
            ix = min(stratum,
                     key=lambda i: (len(self._backlog[i].prompt_ids), i))
        else:
            ix = stratum[0]
        return self._backlog.pop(ix)

    def _select_burst(self) -> Optional[dict]:
        """Leader-side burst selection: when >= 2 slots are free and
        several requests with the same chunk schedule are queued, group
        them for ONE batched prefill call per chunk (weights stream once
        for the whole group instead of once per slot). The batched write
        is lane-masked, so other slots' LIVE decode state is untouched —
        a warm engine batches admissions too, not just a cold one.
        Restricted to prompts <= 2 chunks so the static-offset schedule
        stays a handful of compiles. Returns the broadcastable spec."""
        free = self._free_slots()
        if len(free) < 2:
            return None
        self._drain_ingress()
        if len(self._backlog) < 2:
            return None
        # bursts form within the top-priority stratum only: batching a
        # lower-priority request is free for the group, but anchoring a
        # burst on one could push the high-priority pick a schedule back
        top = max(r.priority for r in self._backlog)
        pool = [r for r in self._backlog if r.priority == top]
        if len(pool) < 2:
            return None
        # anchor the group's schedule on the admission policy's next pick
        anchor = (min(pool, key=lambda r: len(r.prompt_ids))
                  if self.ec.admission_policy == "spf" else pool[0])
        key0 = self._chunk_schedule(len(anchor.prompt_ids))
        if self._paged:
            # the whole group's pages are provisioned inside the burst;
            # don't start one the pool can't back (leave 2 spare pages for
            # live slots' decode horizon). Count PAGES, not chunks: with
            # page_size < 512 a chunk spans bucket/page_size pages, and
            # undercounting here turns pool churn into a mid-burst
            # RuntimeError that kills the engine.
            rows = key0[-1][0] + key0[-1][1]  # schedule end (padded rows)
            pages_per_slot = -(-rows // self.ec.page_size)
            need = min(len(free), len(pool)) * pages_per_slot
            if self._alloc.available() < need + 2:
                return None
        group = []
        for r in pool:
            if len(group) >= len(free):
                break
            sched = self._chunk_schedule(len(r.prompt_ids))
            # a request with a strong resident-prefix match admits far
            # cheaper through the single path (row copy + tiny suffix
            # prefill) than through a full batched prefill; penalized
            # requests also take the single path (their admission splices
            # penalty rows, which the batched admit doesn't thread)
            _, common = self._find_donor(r.prompt_ids)
            if common * 2 >= len(r.prompt_ids) or r.penalized:
                continue
            if sched == key0 and len(sched) <= 2:
                group.append(r)
        if len(group) < 2:
            return None
        for r in group:
            self._backlog.remove(r)
        self._burst_reqs = group
        return {"sched": key0,
                "slots": free[:len(group)],
                "prompts": [list(r.prompt_ids) for r in group],
                "metas": [self._req_meta(r) for r in group]}

    def _execute_burst(self, spec: dict) -> None:
        """Run a burst spec's device calls and slot bookkeeping — identical
        on every controller (followers rebuild the group as stubs). The
        group's rows sit at their slot indices; the lane mask keeps every
        other slot's cache/state (possibly mid-decode) untouched."""
        b = len(self._slots)
        prompts = spec["prompts"]
        slots = spec["slots"]
        if self._multi and not self._sync.is_leader:
            group = [self._stub_request(p, m)
                     for p, m in zip(prompts, spec["metas"])]
        else:
            group = self._burst_reqs
            self._burst_reqs = None

        lengths = np.ones((b,), np.int32)
        mask = np.zeros((b,), bool)
        for slot_ix, p in zip(slots, prompts):
            lengths[slot_ix] = len(p)
            mask[slot_ix] = True
            self._slot_prompts[slot_ix] = None  # being overwritten
            if self._paged:
                self._release_slot_pages(slot_ix)
        lane_mask = jnp.asarray(mask)
        logits = None
        for offset, bucket in spec["sched"]:
            if self._paged:
                for slot_ix in slots:
                    if not self._ensure_pages(slot_ix, offset + bucket):
                        # _select_burst prechecked the pool; hitting this
                        # means severe churn — surface it
                        raise RuntimeError("kv page pool exhausted "
                                           "mid-burst")
            chunk = np.zeros((b, bucket), np.int32)
            for slot_ix, p in zip(slots, prompts):
                take = min(bucket, len(p) - offset)
                if take > 0:
                    chunk[slot_ix, :take] = p[offset:offset + take]
            logits, self._cache = self._gen.prefill_batch_chunk(
                self._prefill_params, self.cfg, jnp.asarray(chunk),
                jnp.asarray(lengths), lane_mask, self._cache, offset)

        self._admit_key, sub = jax.random.split(self._admit_key)
        ec = self.ec
        temp = np.full((b,), ec.default_temperature, np.float32)
        topk = np.full((b,), ec.default_top_k, np.int32)
        topp = np.full((b,), ec.default_top_p, np.float32)
        seeds = np.full((b,), -1, np.int32)
        for slot_ix, r, p in zip(slots, group, prompts):
            temp[slot_ix], topk[slot_ix], topp[slot_ix] = (
                r.temperature, r.top_k, r.top_p)
            seeds[slot_ix] = -1 if r.seed is None else r.seed
            padded = np.zeros((ec.max_seq,), np.int32)
            padded[:len(p)] = p
            self._history = generate.write_history(
                self._history, jnp.int32(slot_ix), jnp.asarray(padded),
                jnp.int32(len(p)))
        (self._tokens, self._positions, self._active, self._sstate,
         self._history, self._first_lp) = generate.admit_slots(
            logits, jnp.asarray(lengths), jnp.asarray(temp),
            jnp.asarray(topk), jnp.asarray(topp), sub, lane_mask,
            self._tokens, self._positions, self._active, self._sstate,
            self._history, self._first_lp, seeds=jnp.asarray(seeds))

        now = time.monotonic()
        with self._lock:
            for slot_ix, req, p in zip(slots, group, prompts):
                self._slot_prompts[slot_ix] = list(p)
                slot = _Slot(request=req, prompt_len=len(req.prompt_ids),
                             first_pending=True)
                if req.top_logprobs:
                    lp_t, id_t = generate.top_candidates_host(
                        logits[slot_ix], n_top=req.top_logprobs)
                    slot.first_top = (np.asarray(id_t), np.asarray(lp_t))
                self._slots[slot_ix] = slot
                # a new occupant: invalidate any pending pipelined
                # record's claim on this lane (its packed view predates
                # this admission — active flags and tokens are stale)
                self._slot_epoch[slot_ix] += 1
                req.first_token_ts = now
                if not req.internal:
                    self.stats["requests"] += 1
                    self.stats["prompt_tokens"] += len(req.prompt_ids)
                    self._ttfts.append(now - req.submit_ts)
            if len(self._ttfts) > 1024:
                del self._ttfts[:512]
            self.stats["burst_admissions"] += sum(
                1 for r in group if not r.internal)

    def _prefill_one_chunk(self, adm: "_Admission") -> bool:
        """Advance an in-flight admission by ONE prefill chunk; returns True
        when the prompt is fully prefilled. One chunk per engine-loop
        iteration keeps long-prompt admissions from stalling active decode
        streams for more than a chunk's worth of time (chunked prefill,
        BASELINE config 5)."""
        remaining = len(adm.ids) - adm.offset
        bucket = self._next_bucket(remaining, adm.offset)
        take = min(bucket, remaining)
        if self._paged and not self._ensure_pages(adm.slot_ix,
                                                  adm.offset + bucket):
            raise RuntimeError("kv page pool exhausted")
        chunk = np.zeros((bucket,), np.int32)
        chunk[:take] = adm.ids[adm.offset:adm.offset + take]
        if (self._sp_mesh is not None
                and bucket >= self.ec.sp_prefill_tokens
                and bucket % self._sp_mesh.shape["data"] == 0):
            # long chunk + idle data axis: sequence-parallel prefill
            # (deterministic from bucket/config — multi-host controllers
            # replay the identical call)
            from gabby_tpu.parallel.sp import sp_prefill_slot
            adm.last_logits, self._cache = sp_prefill_slot(
                self._prefill_params, self.cfg, jnp.asarray(chunk),
                jnp.int32(take), jnp.int32(adm.slot_ix),
                jnp.int32(adm.offset), self._cache,
                mesh=self._sp_mesh, ring=self.ec.sp_prefill_ring)
            # sp_prefill_slot is NOT one of CacheLoops' layout-pinned jits:
            # its returned cache rides AUTO layouts, and re-entering the
            # pinned decode loops with a mismatched arg layout hard-errors
            # when the executable was loaded from the persistent
            # compilation cache (see _push_page_table). No-op when layouts
            # already agree.
            self._cache = self._gen.pin_cache(self._cache)
        else:
            adm.last_logits, self._cache = self._gen.prefill_slot(
                self._prefill_params, self.cfg, jnp.asarray(chunk),
                jnp.int32(take), jnp.int32(adm.slot_ix),
                jnp.int32(adm.offset), self._cache)
        adm.offset += take
        return adm.offset >= len(adm.ids)

    def _setup_penalties(self, slot_ix: int, req: Request,
                         ids) -> Optional[jnp.ndarray]:
        """Splice a penalized request's rows into the (lazily created)
        PenaltyState and return its [V] admission rows as (counts_row,
        bias_row, prompt_row) device arrays — or None when the request
        doesn't use penalties. Freed slots' rows are zeroed in _finish,
        so clean slots never need clearing here."""
        if not req.penalized:
            return None
        v = self.cfg.vocab_size
        if self._pstate is None:
            self._pstate = generate.PenaltyState.zeros(
                self.ec.batch_slots, v)
        # counts start at ZERO: OpenAI's documented formula penalizes
        # c[j] = "how often the token was SAMPLED prior to this position"
        # — the prompt's own tokens carry no penalty (seeding with the
        # prompt histogram effectively banned tokens a long prompt
        # repeated, diverging from OpenAI-compatible clients)
        counts_row = np.zeros((v,), np.int32)
        bias_row = np.zeros((v,), np.float32)
        for k, b in (req.logit_bias or {}).items():
            bias_row[k] = b
        # the prompt-presence mask feeds ONLY repetition_penalty (the
        # prompt-aware knob); counts stay sampled-only for OpenAI math
        prompt_row = np.zeros((v,), bool)
        prompt_row[np.asarray(ids, np.int64)] = True
        counts_row = jnp.asarray(counts_row)
        bias_row = jnp.asarray(bias_row)
        prompt_row = jnp.asarray(prompt_row)
        self._pstate = generate.set_penalty_slot(
            self._pstate, jnp.int32(slot_ix), counts_row,
            jnp.float32(req.presence_penalty),
            jnp.float32(req.frequency_penalty), bias_row,
            jnp.float32(req.repetition_penalty), prompt_row)
        self._pen_slots.add(slot_ix)
        return counts_row, bias_row, prompt_row

    def _finish_admission(self, adm: "_Admission") -> None:
        """Activate the fully-prefilled slot ON DEVICE (first token sampled
        there too; it reaches the host in the next packed fetch)."""
        slot_ix, req, n = adm.slot_ix, adm.req, len(adm.ids)
        padded = np.zeros((self.ec.max_seq,), np.int32)
        padded[:n] = adm.ids
        self._history = generate.write_history(
            self._history, jnp.int32(slot_ix), jnp.asarray(padded),
            jnp.int32(n))
        pen_rows = self._setup_penalties(slot_ix, req, adm.ids)
        if pen_rows is not None:
            # the first token samples from the ADJUSTED distribution too
            counts_row, bias_row, prompt_row = pen_rows
            adm.last_logits = generate.penalize_row(
                adm.last_logits, counts_row,
                jnp.float32(req.presence_penalty),
                jnp.float32(req.frequency_penalty), bias_row,
                jnp.float32(req.repetition_penalty), prompt_row)
        self._admit_key, sub = jax.random.split(self._admit_key)
        (self._tokens, self._positions, self._active, self._sstate,
         self._history, self._first_lp) = generate.admit_slot(
            adm.last_logits, jnp.int32(slot_ix), jnp.int32(n),
            req.temperature, req.top_k, req.top_p, sub,
            self._tokens, self._positions, self._active, self._sstate,
            self._history, self._first_lp,
            seed=jnp.int32(-1 if req.seed is None else req.seed))
        if pen_rows is not None:
            # the first token is an emitted token: count it
            self._pstate = generate.count_slot_token(
                self._pstate, jnp.int32(slot_ix), self._tokens[slot_ix])

        slot = _Slot(request=req, prompt_len=n, first_pending=True)
        if req.top_logprobs:
            lp_t, id_t = generate.top_candidates_host(
                adm.last_logits, n_top=req.top_logprobs)
            slot.first_top = (np.asarray(id_t), np.asarray(lp_t))
        self._slots[slot_ix] = slot
        self._slot_epoch[slot_ix] += 1  # see the burst-admission bump
        # the slot's cache now holds this prompt's full KV: register it
        # for prefix reuse by later admissions
        self._slot_prompts[slot_ix] = [int(t) for t in adm.ids]
        with self._lock:
            req.first_token_ts = time.monotonic()
            if not req.internal:
                self.stats["requests"] += 1
                self.stats["prompt_tokens"] += n
                self._ttfts.append(req.first_token_ts - req.submit_ts)
            if len(self._ttfts) > 1024:
                del self._ttfts[:512]

    def _emit_token(self, slot_ix: int, token_id: int,
                    logprob: float = 0.0, top=None) -> None:
        """Append a token to the slot's request; stream decoded delta.

        Decodes ONLY the new token's bytes through the slot's incremental
        UTF-8 decoder (which holds back incomplete multi-byte sequences
        split across tokens), so per-token host work is independent of how
        many tokens came before. The concatenated stream is byte-identical
        to a whole-sequence tokenizer.decode (tests/test_engine.py)."""
        slot = self._slots[slot_ix]
        if slot is None:
            return
        req = slot.request
        if token_id in self._stop_set:
            self._finish(slot_ix, "stop")
            return
        req.token_ids.append(token_id)
        req.token_logprobs.append(logprob)
        if req.top_logprobs:
            # `top` is (ids, logprobs) rows of the call-wide n_top bucket;
            # slice down to what THIS request asked for
            k = req.top_logprobs
            req.token_top.append(
                [] if top is None else
                [(int(i), float(x)) for i, x in zip(top[0][:k], top[1][:k])])
        req.completion_tokens = len(req.token_ids)
        raw = self.tokenizer.token_raw(token_id)
        new_text = ""
        if raw is not None:
            special, payload = raw
            if special:
                # whole-sequence decode flushes the byte buffer (replace-
                # decoding any incomplete tail) before a special's literal
                # text; mirror that exactly
                new_text = slot.dec.decode(b"", True) + payload
                slot.dec.reset()
            else:
                new_text = slot.dec.decode(payload)
        held = slot.text_held + new_text

        # stop sequences: finish at the earliest occurrence, never emitting
        # the stop text itself (OpenAI semantics). The holdback window
        # keeps the last max(len(stop))-1 chars unemitted, so any match is
        # entirely within `held` — no need to re-scan emitted text.
        if req.stop:
            hits = [j for j in (held.find(s) for s in req.stop) if j >= 0]
            if hits:
                cut = min(hits)
                if cut > 0:
                    req.out.put((held[:cut], None))
                slot.text_held = ""
                slot.drop_tail = True
                self._finish(slot_ix, "stop")
                return
            safe = len(held) - max(map(len, req.stop)) + 1
        else:
            safe = len(held)
        if safe > 0:
            req.out.put((held[:safe], None))
            slot.text_held = held[safe:]
        else:
            slot.text_held = held
        if len(req.token_ids) >= req.max_tokens:
            self._finish(slot_ix, "length")

    def _finish(self, slot_ix: int, reason: str) -> None:
        slot = self._slots[slot_ix]
        if slot is None:
            return
        # flush the held-back text plus any incomplete UTF-8 tail
        tail = ""
        if not slot.drop_tail:
            tail = slot.text_held + slot.dec.decode(b"", True)
        req = slot.request
        now = time.monotonic()
        span = {
            "prompt_tokens": len(req.prompt_ids),
            "completion_tokens": len(req.token_ids),
            "finish": reason,
            # queue wait + prefill, i.e. submit -> first emitted token
            "ttft_ms": (round((req.first_token_ts - req.submit_ts) * 1e3, 1)
                        if req.first_token_ts else None),
            "total_ms": round((now - req.submit_ts) * 1e3, 1),
        }
        with self._lock:
            if not slot.request.internal:
                self.stats["completion_tokens"] += len(
                    slot.request.token_ids)
                self._spans.append(span)
        self._slots[slot_ix] = None
        # invalidate any pending pipelined burst's claim on this slot: a
        # record dispatched before this finish must not emit into whatever
        # occupies the slot next (see _BurstRecord.epochs)
        self._slot_epoch[slot_ix] += 1
        self._active = self._active.at[slot_ix].set(False)
        # park the freed slot's write position (see __init__); update all
        # state BEFORE notifying the client so a caller that observes the
        # finish sees the slot fully released
        self._positions = self._positions.at[slot_ix].set(self._park)
        if slot_ix in self._pen_slots:
            self._pen_slots.discard(slot_ix)
            if self._pen_slots:
                # a later admission must not inherit this slot's rows
                v = self.cfg.vocab_size
                self._pstate = generate.set_penalty_slot(
                    self._pstate, jnp.int32(slot_ix),
                    jnp.zeros((v,), jnp.int32), jnp.float32(0.0),
                    jnp.float32(0.0), jnp.zeros((v,), jnp.float32),
                    jnp.float32(1.0), jnp.zeros((v,), bool))
            else:
                self._pstate = None  # back to the penalty-free program
        slot.request.out.put((tail or None, reason))

    @property
    def _stop_set(self) -> set[int]:
        if not hasattr(self, "_stop_set_cache"):
            self._stop_set_cache = set(
                int(x) for x in np.asarray(self._eos_ids))
        return self._stop_set_cache

    def _loop_guarded(self) -> None:
        """A dead engine thread must not strand waiting requests: on an
        unexpected loop error, every in-flight and queued request gets an
        error finish instead of hanging its HTTP worker forever."""
        try:
            self._loop()
        except Exception as e:  # noqa: BLE001 — deliberately broad
            import traceback
            traceback.print_exc()
            self._fail_all_requests(f"error: engine died: {e}")

    def _fail_all_requests(self, msg: str) -> None:
        """Terminal failure: error-finish every in-flight and queued
        request and stop the engine. Idempotent — callable from the loop
        thread (after an exception) or the multi-host watchdog (while the
        loop thread is still stuck in a dead collective)."""
        with self._lock:
            if self._failed:
                return
            self._failed = True
            self._fail_msg = msg
        self._shutdown = True
        for slot_ix, slot in enumerate(self._slots):
            if slot is not None:
                slot.request.out.put((None, msg))
                self._slots[slot_ix] = None
        for req in self._backlog:
            req.out.put((None, msg))
        self._backlog.clear()
        while True:
            try:
                self._queue.get_nowait().out.put((None, msg))
            except queue.Empty:
                break

    def _watchdog(self) -> None:
        sync = self._sync
        poll = min(2.0, sync.timeout / 4)
        misses = 0
        while not self._shutdown:
            time.sleep(poll)
            try:
                dead = sync.dead_peers()
            except Exception:  # noqa: BLE001 — treat probe failure as fatal
                dead = [p for p in range(sync.num_processes)
                        if p != sync.process_index]
            if not dead:
                misses = 0
                continue
            # one confirmation poll on top of the counter-stall window
            # guards against a single starved heartbeat read
            misses += 1
            if misses >= 2:
                self._fail_all_requests(
                    f"error: peer controller(s) {dead} lost — multi-host "
                    f"serving cannot continue (liveness counter stalled "
                    f"past {sync.timeout:.0f}s)")
                return

    def _compose_plan(self, admitting: Optional[_Admission]) -> Optional[dict]:
        """Leader-side (or single-process) decision for one loop iteration:
        what to admit and how many decode steps to fuse. Returns None when
        there is nothing at all to do (idle)."""
        if self._shutdown:
            return {"op": "shutdown"}
        plan: dict = {}
        # client-side cancellations fold into the plan so every controller
        # frees the same slots at the same point
        cancels = [i for i, s in enumerate(self._slots)
                   if s is not None and s.request.cancelled]
        if cancels:
            plan["cancel"] = cancels
        # in-flight deadline expiry: finish the slot with what it has
        # (reason "deadline") instead of decoding to max_tokens for a
        # client whose budget is spent. Leader-clock decision, replayed by
        # followers through the plan like cancellation.
        overdue = [i for i, s in enumerate(self._slots)
                   if s is not None and not s.request.cancelled
                   and self._slack(s.request) <= 0]
        if overdue:
            plan["deadline"] = overdue
        # sweep the ingress queue even when no slot is free, so a request
        # whose deadline expired while waiting gets its 408 now, not when
        # a slot eventually opens
        self._drain_ingress()
        if admitting is not None and admitting.req.cancelled:
            plan["cancel_admission"] = True
        if admitting is None:
            try:
                burst = self._select_burst()
            except Exception:
                import traceback
                traceback.print_exc()  # fall through to the single path
                burst = None
            if burst is not None:
                plan["burst"] = burst
            else:
                free = self._free_slots()
                if free:
                    req = self._pop_next_admission()
                    if req is not None:
                        self._pending_admit = req
                        donor, common = self._find_donor(req.prompt_ids)
                        plan["admit"] = {"slot": free[0],
                                         "ids": list(req.prompt_ids),
                                         "meta": self._req_meta(req),
                                         "donor": donor, "common": common}
        if (admitting is None and "burst" not in plan and "admit" not in plan
                and not any(s is not None for s in self._slots)):
            return None
        # short decode bursts while an admission is in flight (a waiting
        # request's TTFT sits behind each decode call), long ones
        # otherwise. A non-empty queue with NO free slot is NOT busy:
        # short bursts can't admit anything then — they only multiply
        # per-iteration host-fetch overhead (measured: this was the main
        # reason a 3x-oversubscribed bench crawled between waves).
        busy = admitting is not None or "admit" in plan
        steps = (self.ec.steps_per_call_busy if busy
                 else self.ec.steps_per_call)
        if not busy and (self._backlog or not self._queue.empty()):
            # requests are waiting on a slot: don't decode past the
            # nearest PREDICTABLE free-up (a slot hitting max_tokens), so
            # the admission starts the very next iteration
            remaining = [s.request.max_tokens - len(s.request.token_ids)
                         for s in self._slots if s is not None]
            if remaining:
                tgt = max(1, min(steps, min(remaining)))
                # power-of-two so the fused decode loop (steps is a static
                # jit arg) compiles a bounded set of programs
                steps = 1 << (tgt.bit_length() - 1)
        plan["steps"] = steps
        return plan

    def _execute_plan(self, plan: dict,
                      admitting: Optional[_Admission]
                      ) -> Optional[_Admission]:
        """Run one iteration's device calls + host bookkeeping. In
        multi-host mode every controller executes this with the SAME plan
        against the same (replicated) slot state, so all jit dispatches and
        all host-side finish decisions stay in lockstep."""
        for i in plan.get("cancel", ()):
            self._finish(i, "cancelled")
        for i in plan.get("deadline", ()):
            self._finish(i, "deadline")
        if plan.get("cancel_admission") and admitting is not None:
            admitting.req.out.put((None, "cancelled"))
            admitting = None
        if "burst" in plan:
            self._execute_burst(plan["burst"])
        if "admit" in plan:
            if self._multi and not self._sync.is_leader:
                req = self._stub_request(plan["admit"]["ids"],
                                         plan["admit"]["meta"])
            else:
                req = self._pending_admit
                self._pending_admit = None
            dst = plan["admit"]["slot"]
            admitting = _Admission(
                slot_ix=dst, req=req,
                ids=np.asarray(plan["admit"]["ids"], np.int32))
            donor, common = plan["admit"].get("donor", -1), \
                plan["admit"].get("common", 0)
            if self._paged:
                # paged prefix reuse is ZERO-COPY: adopt the donor's
                # whole-page prefix by reference (refcounted). The slot's
                # own old pages are dropped first unless it IS the donor.
                if donor == dst and common > 0:
                    self._slot_prompts[dst] = None  # prefix rows resident
                    # pages PAST the common prefix may be refcount-shared
                    # with another live slot (this slot donated them to a
                    # later admission, or itself adopted them earlier);
                    # suffix-prefilling through the page table would write
                    # into that slot's KV. Drop them — the prefix pages
                    # below `common` stay shared read-only, and
                    # _ensure_pages allocates fresh suffix pages.
                    ps = self.ec.page_size
                    keep = common // ps
                    tail = self._slot_pages[dst][keep:]
                    if tail:
                        self._alloc.release(tail)
                        del self._slot_pages[dst][keep:]
                        self._pt_host[dst, keep:] = 0
                        self._push_page_table()
                else:
                    self._release_slot_pages(dst)
                    if donor >= 0 and common > 0:
                        ps = self.ec.page_size
                        shared = self._alloc.share(
                            self._slot_pages[donor][:common // ps])
                        self._slot_pages[dst] = shared
                        for lp, pg in enumerate(shared):
                            self._pt_host[dst, lp] = pg
                        self._push_page_table()
            else:
                # the slot's old resident prompt is about to be overwritten
                self._slot_prompts[dst] = None
                if donor >= 0 and common > 0 and donor != dst:
                    # dense prefix reuse: clone the donor's rows (the
                    # donor's prefix rows are frozen — decode writes land
                    # at positions >= its prompt length)
                    self._cache = self._gen.copy_slot_prefix(
                        self._cache, jnp.int32(donor), jnp.int32(dst))
            if donor >= 0 and common > 0:
                admitting.offset = common
                if not admitting.req.internal:
                    with self._lock:
                        self.stats["prefix_hits"] += 1
                        self.stats["prefix_tokens_reused"] += common

        # advance the in-flight admission by ONE chunk, then fall through
        # to decode: prefill and decode interleave so a long prompt never
        # stalls active streams for more than a chunk
        if admitting is not None:
            try:
                if self._prefill_one_chunk(admitting):
                    self._finish_admission(admitting)
                    admitting = None
            except Exception as e:  # defensive: bad request params
                admitting.req.out.put((None, f"error: {e}"))
                admitting = None

        if not any(s is not None for s in self._slots):
            self._drain_pending_burst()  # no follow-up burst is coming
            return admitting

        steps = plan["steps"]
        if self._paged:
            # provision every live slot's pages past this call's furthest
            # possible write (speculation writes draft rows d+1 per macro
            # step, and the verify block extends d rows past the last
            # accepted position); a slot the pool cannot back finishes now
            # (its generated text so far is delivered)
            span = ((self.ec.speculate_tokens + 1) if self._spec_enabled
                    else 1)
            # pipelined fetches: host token counts lag by the pending
            # burst's steps — provision pages for them too, or a lagged
            # count could under-allocate the page horizon
            lag = self._pending_burst.steps if self._pending_burst else 0
            for i, s in enumerate(self._slots):
                if s is None:
                    continue
                horizon = (s.prompt_len + len(s.request.token_ids)
                           + lag + steps * span + span + 1)
                if not self._ensure_pages(i, horizon):
                    self._finish(i, "length")
            if not any(s is not None for s in self._slots):
                self._drain_pending_burst()
                return admitting
        pre_tokens = self._tokens  # holds just-admitted first tokens
        b = len(self._slots)
        window = self._attn_window(steps)
        # OpenAI top_logprobs: when any live request asked for candidate
        # alternatives, the decode loop also returns exact top-k rows.
        # Bucketed {5, 10, 20} so the (steps, window, n_top) compile set
        # stays bounded; derived from replicated slot state, so every
        # multi-host controller dispatches the identical program.
        n_top = max((s.request.top_logprobs for s in self._slots
                     if s is not None), default=0)
        if n_top:
            n_top = 5 if n_top <= 5 else (10 if n_top <= 10 else 20)
        # speculation runs all the way to the cache cap: near max_seq the
        # device loop stops drafting but keeps emitting single verified
        # tokens to plain decode_loop's exact capacity bound (ADVICE r2;
        # verify_step's blended clamped write keeps history intact).
        # Penalized batches take the plain path: a draft's greedy argmax
        # would need per-position evolving counts inside the verify block
        # — not worth the complexity for a rarely-combined pair (history
        # goes stale meanwhile; verification keeps later spec calls
        # correct, acceptance just dips)
        if (self._spec_enabled and self._pstate is None
                and not self._probe_plain_now()):
            t_call = time.perf_counter()
            dl = self.ec.speculate_tokens
            (out_em, out_n, out_lp, self._tokens, self._positions,
             self._active, self._cache, self._sstate, self._history,
             out_top_lp, out_top_ids) = self._gen.spec_decode_loop(
                self.params, self.cfg, self._tokens, self._positions,
                self._active, self._cache, self._sstate, self._history,
                steps, dl, self._eos_ids, window=window, n_top=n_top)
            packed = self._host_fetch(jnp.concatenate([
                out_em.reshape(-1).astype(jnp.int32),
                out_n.reshape(-1).astype(jnp.int32),
                self._active.astype(jnp.int32),
                pre_tokens.astype(jnp.int32),
                jax.lax.bitcast_convert_type(out_lp.reshape(-1), jnp.int32),
                jax.lax.bitcast_convert_type(self._first_lp, jnp.int32),
                jax.lax.bitcast_convert_type(
                    out_top_lp.reshape(-1), jnp.int32),
                out_top_ids.reshape(-1)]))
            kbt = steps * b * (dl + 1)
            em = packed[:kbt].reshape(steps, b, dl + 1)
            counts = packed[kbt:kbt + steps * b].reshape(steps, b)
            active_host = packed[kbt + steps * b:kbt + steps * b + b] != 0
            first_toks = packed[kbt + steps * b + b:kbt + steps * b + 2 * b]
            base = kbt + steps * b + 2 * b
            lp_flat = packed[base:base + kbt + b].view(np.float32)
            lps = lp_flat[:kbt].reshape(steps, b, dl + 1)
            first_lps = lp_flat[kbt:]
            top_lps = packed[base + kbt + b:base + kbt + b + kbt * n_top]\
                .view(np.float32).reshape(steps, b, dl + 1, n_top)
            top_ids = packed[base + kbt + b + kbt * n_top:]\
                .reshape(steps, b, dl + 1, n_top)
            # packed fetch above synced the device: wall time covers the
            # whole verify burst (auto break-even numerator). First call
            # per shape compiles — the rolling window flushes it out.
            self._spec_step_s.append((time.perf_counter() - t_call) / steps)
            with self._lock:
                self.stats["decode_steps"] += steps
                self.stats["spec_macro_steps"] += int(
                    np.sum(counts > 0))
                self.stats["spec_tokens"] += int(np.sum(counts))
            for slot_ix, slot in enumerate(self._slots):
                if slot is not None and slot.first_pending:
                    slot.first_pending = False
                    self._emit_token(slot_ix, int(first_toks[slot_ix]),
                                     float(first_lps[slot_ix]),
                                     top=slot.first_top)
            for step in range(steps):
                for slot_ix in range(b):
                    if self._slots[slot_ix] is None:
                        continue
                    for t in range(int(counts[step, slot_ix])):
                        if self._slots[slot_ix] is None:
                            break
                        self._emit_token(
                            slot_ix, int(em[step, slot_ix, t]),
                            float(lps[step, slot_ix, t]),
                            top=((top_ids[step, slot_ix, t],
                                  top_lps[step, slot_ix, t])
                                 if n_top else None))
            self._maybe_disable_spec()
            # capacity finishes (device deactivated without EOS) — the
            # spec path fetches synchronously, no epoch guard needed
            for slot_ix, slot in enumerate(self._slots):
                if slot is not None and not active_host[slot_ix]:
                    self._finish(slot_ix, "length")
        else:
            t_call = time.perf_counter()
            (out_tokens, out_active, out_lp, self._tokens,
             self._positions, self._active, self._cache, self._sstate,
             out_top_lp, out_top_ids, self._pstate) = self._gen.decode_loop(
                self.params, self.cfg, self._tokens, self._positions,
                self._active, self._cache, self._sstate, steps,
                eos_ids=self._eos_ids, window=window, n_top=n_top,
                pstate=self._pstate)
            with self._lock:
                self.stats["decode_steps"] += steps

            # ONE host transfer for everything this iteration needs
            # (arrays are replicated across controllers, so in multi-host
            # mode every process fetches identical values and decides
            # identically)
            rec = _BurstRecord(
                packed_dev=generate.pack_host_view(
                    out_tokens, out_active, self._active, pre_tokens,
                    out_lp, self._first_lp, out_top_lp, out_top_ids),
                steps=steps, b=b, n_top=n_top,
                epochs=tuple(self._slot_epoch),
                first_slots=tuple(
                    i for i, s in enumerate(self._slots)
                    if s is not None and s.first_pending))
            if self._pipeline:
                # dispatch-ahead: hold this burst's packed view; the fetch
                # happens after the NEXT burst dispatches, so the transfer
                # latency rides under its device compute. (The previous
                # pending record is fetched now — its compute finished
                # while this iteration's plan/prefill/dispatch ran.)
                pending, self._pending_burst = self._pending_burst, rec
                if pending is not None:
                    self._process_burst(pending)
            else:
                self._process_burst(rec)
                if self._pstate is None:
                    # penalty-free plain bursts only: the penalized
                    # program costs more and would skew the auto
                    # break-even denominator. (Pipelined mode never
                    # records: dispatch-to-fetch no longer bounds one
                    # burst, and pipelining implies speculation off.)
                    self._plain_step_s.append(
                        (time.perf_counter() - t_call) / steps)
            self._maybe_reprobe_spec()

        return admitting

    def _process_burst(self, rec: _BurstRecord) -> None:
        """Fetch one burst's packed host view and do its host bookkeeping:
        first-token + decode-token emission, and capacity ("length")
        finishes for slots the device deactivated without an EOS. Runs
        synchronously right after dispatch, or one iteration later under
        pipeline_fetch — the epoch guard drops emissions into slots that
        were freed after the record's dispatch."""
        steps, b, n_top = rec.steps, rec.b, rec.n_top
        kb = steps * b
        packed = self._host_fetch(rec.packed_dev)
        toks = packed[:kb].reshape(steps, -1)               # [K, B]
        emitted = packed[kb:2 * kb].reshape(steps, -1) != 0  # [K, B]
        active_host = packed[2 * kb:2 * kb + b] != 0         # [B]
        first_toks = packed[2 * kb + b:2 * kb + 2 * b]       # [B]
        base = 2 * kb + 2 * b
        lp_flat = packed[base:base + kb + b].view(np.float32)
        lps = lp_flat[:kb].reshape(steps, -1)                # [K, B]
        first_lps = lp_flat[kb:]                             # [B]
        top_lps = packed[base + kb + b:base + kb + b + kb * n_top]\
            .view(np.float32).reshape(steps, b, n_top)
        top_ids = packed[base + kb + b + kb * n_top:]\
            .reshape(steps, b, n_top)

        def claimed(slot_ix: int) -> bool:
            return (self._slots[slot_ix] is not None
                    and self._slot_epoch[slot_ix] == rec.epochs[slot_ix])

        # deliver on-device-sampled first tokens of fresh admissions
        # BEFORE this call's decode outputs (generation order) — only for
        # slots whose first token this record actually carries
        for slot_ix in rec.first_slots:
            slot = self._slots[slot_ix]
            if slot is not None and slot.first_pending and claimed(slot_ix):
                slot.first_pending = False
                self._emit_token(slot_ix, int(first_toks[slot_ix]),
                                 float(first_lps[slot_ix]),
                                 top=slot.first_top)
        for step in range(toks.shape[0]):
            for slot_ix in range(toks.shape[1]):
                if emitted[step, slot_ix] and claimed(slot_ix):
                    self._emit_token(
                        slot_ix, int(toks[step, slot_ix]),
                        float(lps[step, slot_ix]),
                        top=((top_ids[step, slot_ix],
                              top_lps[step, slot_ix])
                             if n_top else None))
        # a slot the DEVICE deactivated without an EOS hit its cache
        # capacity (decode_loop's new_pos < max_seq guard): finish it
        # host-side or its request would hang forever
        for slot_ix, slot in enumerate(self._slots):
            if slot is not None and not active_host[slot_ix] \
                    and claimed(slot_ix):
                self._finish(slot_ix, "length")

    def _drain_pending_burst(self) -> None:
        """Process the outstanding pipelined burst now (idle iterations,
        early returns, shutdown): clients must never wait on a record
        whose follow-up burst isn't coming."""
        pending, self._pending_burst = self._pending_burst, None
        if pending is not None:
            self._process_burst(pending)

    def _probe_plain_now(self) -> bool:
        """spec_auto_breakeven needs PLAIN-burst wall samples, but with
        speculation enabled every burst takes the spec branch — so until
        the plain window has enough samples, every 16th burst runs plain;
        once it is full, every 128th burst STILL runs plain so the rolling
        denominator tracks current batch occupancy and chip contention
        instead of freezing at the engine's first minutes (ADVICE r4: the
        deque is maxlen-bounded, so each refresh displaces the oldest
        sample). Output-safe: the two loops are interchangeable per
        iteration (the disable/re-probe flips already rely on that;
        history staleness is tolerated exactly like the penalized-batch
        plain path). Single-host only — multi-host uses the configured
        constant and must dispatch identical programs on every
        controller."""
        if not self.ec.spec_auto_breakeven or self._multi:
            return False
        self._plain_probe_ctr += 1
        period = 16 if len(self._plain_step_s) < 8 else 128
        return self._plain_probe_ctr % period == 0

    def _spec_breakeven_now(self) -> float:
        """The break-even in force: the measured verify/plain per-step
        cost ratio once both rolling windows have enough samples
        (spec_auto_breakeven, single-host), else the configured prior.
        Multi-host always uses the configured constant — controllers must
        flip speculation at identical plans, and wall timings are local."""
        if (not self.ec.spec_auto_breakeven or self._multi
                or len(self._plain_step_s) < 8
                or len(self._spec_step_s) < 8):
            return self.ec.spec_breakeven
        import statistics
        plain = statistics.median(self._plain_step_s)
        if plain <= 0:
            return self.ec.spec_breakeven
        return max(1.0, statistics.median(self._spec_step_s) / plain)

    def _maybe_disable_spec(self) -> None:
        """Speculation must PAY for its wider verify pass: if measured
        tokens-per-macro-step stays below the break-even over a fair
        128-macro-step sample, fall back to the plain decode loop. With
        spec_reprobe_steps > 0 the engine re-probes later (workloads
        shift); 0 keeps the disable sticky. Deterministic across
        multi-host controllers: both the disable and the re-probe derive
        from replicated counters, so every controller flips at the
        identical plan (and the break-even stays the configured constant
        there — see _spec_breakeven_now)."""
        with self._lock:
            ms = self.stats["spec_macro_steps"] - self._spec_probe_base[0]
            tk = self.stats["spec_tokens"] - self._spec_probe_base[1]
        breakeven = self._spec_breakeven_now()
        with self._lock:
            self.stats["spec_breakeven_derived"] = round(breakeven, 3)
        if ms >= 128 and tk < breakeven * ms:
            self._spec_enabled = False
            with self._lock:
                self._spec_off_since = self.stats["decode_steps"]
                self.stats["spec_on"] = 0
                self.stats["spec_disables"] += 1
            import sys
            print(f"[engine] speculation disabled: acceptance "
                  f"{tk / max(ms, 1):.2f} tokens/verify over {ms} steps "
                  f"(break-even {breakeven:.2f})",
                  file=sys.stderr, flush=True)

    def _maybe_reprobe_spec(self) -> None:
        """Re-enable a disabled speculation for another acceptance sample
        once enough plain decode steps have passed (see spec_reprobe_steps)."""
        if (self._spec_enabled or self.ec.speculate_tokens <= 0
                or self.ec.spec_reprobe_steps <= 0
                or self._spec_off_since is None):
            return
        with self._lock:
            steps_off = self.stats["decode_steps"] - self._spec_off_since
            base = (self.stats["spec_macro_steps"],
                    self.stats["spec_tokens"])
        if steps_off >= self.ec.spec_reprobe_steps:
            self._spec_probe_base = base
            self._spec_off_since = None
            self._spec_enabled = True
            with self._lock:
                self.stats["spec_on"] = 1
            import sys
            print(f"[engine] speculation re-probe after {steps_off} plain "
                  f"steps", file=sys.stderr, flush=True)

    def _loop(self) -> None:
        admitting: Optional[_Admission] = None
        leader = not self._multi or self._sync.is_leader
        while True:
            if leader:
                plan = self._compose_plan(admitting)
                if plan is None:
                    # idle: no follow-up burst will trigger the pipelined
                    # fetch — settle the outstanding record now
                    self._drain_pending_burst()
                    if not self._multi:
                        self._wake.wait(timeout=0.05)
                        self._wake.clear()
                        continue
                    # multi-host idle: wait briefly for work, then send a
                    # heartbeat no-op so followers never sit in a
                    # collective long enough to trip its timeout
                    self._wake.wait(timeout=2.0)
                    self._wake.clear()
                    plan = self._compose_plan(admitting) or {"op": "noop"}
            else:
                plan = None
            if self._multi:
                plan = self._sync.broadcast(plan)
            if plan.get("op") == "noop":
                continue
            if plan.get("op") == "shutdown":
                break
            admitting = self._execute_plan(plan, admitting)

        # drain on shutdown
        self._drain_pending_burst()
        if admitting is not None:
            admitting.req.out.put((None, "abort"))
        for slot_ix in range(len(self._slots)):
            if self._slots[slot_ix] is not None:
                self._finish(slot_ix, "abort")
        for req in self._backlog:
            req.out.put((None, "abort"))
        self._backlog.clear()
        while True:
            try:
                req = self._queue.get_nowait()
                req.out.put((None, "abort"))
            except queue.Empty:
                break
