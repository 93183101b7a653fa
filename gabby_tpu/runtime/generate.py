"""Jitted generation loops.

`decode_loop` runs K decode steps as ONE compiled program (lax.scan over
steps, greedy/sampled token fed back on-device). Serving decodes in chunks
of `steps_per_call` and streams tokens between calls: host dispatch cost is
amortized K-fold, and XLA can overlap the per-step collectives with compute
inside the scan. This is the TPU-shaped replacement for the per-token
dispatch loop a CUDA engine would run.

All shapes are static; per-slot `active` masks make dead slots (finished or
empty) write nothing and sample nothing visible.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from gabby_tpu.config import ModelConfig
from gabby_tpu.models import llama
from gabby_tpu.ops import sampling
from gabby_tpu.runtime.kv_cache import KVCache


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingState:
    """Per-slot sampling parameters (arrays -> no retrace on churn)."""

    temperature: jnp.ndarray  # [B] f32; 0 = greedy
    top_k: jnp.ndarray  # [B] i32; 0 = disabled
    top_p: jnp.ndarray  # [B] f32; 1.0 = disabled
    key: jax.Array  # PRNG key (the engine-global stream)
    # OpenAI `seed`: -1 = global stream; >= 0 = the lane draws from
    # fold_in(PRNGKey(seed), position) so the request's sampled output
    # reproduces regardless of batch composition or call fusion
    seed: jnp.ndarray  # [B] i32

    @staticmethod
    def greedy(batch: int) -> "SamplingState":
        return SamplingState(
            temperature=jnp.zeros((batch,), jnp.float32),
            top_k=jnp.zeros((batch,), jnp.int32),
            top_p=jnp.ones((batch,), jnp.float32),
            key=jax.random.PRNGKey(0),
            seed=jnp.full((batch,), -1, jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PenaltyState:
    """OpenAI sampling-penalty state, per slot. Threaded through
    decode_loop as an OPTIONAL pytree: None (the common case) compiles a
    program with zero penalty work; a live state adds one fused [B, V]
    elementwise adjust per step plus a scatter-add count update. The
    engine materializes it lazily when a request with penalties or
    logit_bias is admitted and drops it (back to the fast program) when
    the last such request finishes."""

    counts: jnp.ndarray     # [B, V] i32 — tokens SAMPLED so far (OpenAI)
    presence: jnp.ndarray   # [B] f32 — subtracted once per seen token
    frequency: jnp.ndarray  # [B] f32 — subtracted per occurrence
    bias: jnp.ndarray       # [B, V] f32 — logit_bias rows (zeros = off)
    # HF/vLLM-style repetition_penalty (extension field): tokens seen in
    # the PROMPT or sampled so far get logit/rep when positive, logit*rep
    # when negative (rep > 1 penalizes). 1.0 = off. prompt_mask carries
    # the prompt-histogram half of "seen" that OpenAI's counts exclude.
    rep: jnp.ndarray          # [B] f32 — 1.0 = off
    prompt_mask: jnp.ndarray  # [B, V] bool — token appeared in the prompt

    @staticmethod
    def zeros(batch: int, vocab: int) -> "PenaltyState":
        return PenaltyState(
            counts=jnp.zeros((batch, vocab), jnp.int32),
            presence=jnp.zeros((batch,), jnp.float32),
            frequency=jnp.zeros((batch,), jnp.float32),
            bias=jnp.zeros((batch, vocab), jnp.float32),
            rep=jnp.ones((batch,), jnp.float32),
            prompt_mask=jnp.zeros((batch, vocab), bool),
        )


def apply_penalties(logits: jnp.ndarray,
                    pstate: Optional[PenaltyState]) -> jnp.ndarray:
    """logits [B, V] adjusted: repetition_penalty FIRST (HF semantics, on
    the raw logits), then OpenAI's + logit_bias - presence*(count > 0)
    - frequency*count. Identity when pstate is None (traced away
    entirely)."""
    if pstate is None:
        return logits
    cnt = pstate.counts
    seen = pstate.prompt_mask | (cnt > 0)
    rp = pstate.rep[:, None]
    rep_adj = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, rep_adj, logits)
    return (logits + pstate.bias
            - jnp.where(cnt > 0, pstate.presence[:, None], 0.0)
            - cnt.astype(jnp.float32) * pstate.frequency[:, None])


def count_token(pstate: Optional[PenaltyState], nxt: jnp.ndarray,
                active: jnp.ndarray) -> Optional[PenaltyState]:
    """Record the just-emitted token of every ACTIVE lane in the
    occurrence counts (no-op when penalties are off)."""
    if pstate is None:
        return None
    b = nxt.shape[0]
    counts = pstate.counts.at[jnp.arange(b), nxt].add(
        active.astype(jnp.int32))
    return dataclasses.replace(pstate, counts=counts)


@jax.jit
def set_penalty_slot(pstate: PenaltyState, slot: jnp.ndarray,
                     counts_row: jnp.ndarray, presence: jnp.ndarray,
                     frequency: jnp.ndarray, bias_row: jnp.ndarray,
                     rep: jnp.ndarray,
                     prompt_row: jnp.ndarray) -> PenaltyState:
    """Splice one slot's penalty rows at admission (counts_row starts at
    zero: OpenAI's formula counts only tokens SAMPLED so far, never the
    prompt; the engine passes zeros and in-loop counting does the rest.
    prompt_row is the prompt-presence mask repetition_penalty needs)."""
    return PenaltyState(
        counts=pstate.counts.at[slot].set(counts_row),
        presence=pstate.presence.at[slot].set(presence),
        frequency=pstate.frequency.at[slot].set(frequency),
        bias=pstate.bias.at[slot].set(bias_row),
        rep=pstate.rep.at[slot].set(rep),
        prompt_mask=pstate.prompt_mask.at[slot].set(prompt_row),
    )


@jax.jit
def count_slot_token(pstate: PenaltyState, slot: jnp.ndarray,
                     token: jnp.ndarray) -> PenaltyState:
    """Count one slot's just-sampled token (the admission-time first
    token, which decode_loop's in-loop counting never sees)."""
    return dataclasses.replace(
        pstate, counts=pstate.counts.at[slot, token].add(1))


@jax.jit
def penalize_row(logits: jnp.ndarray, counts_row: jnp.ndarray,
                 presence: jnp.ndarray, frequency: jnp.ndarray,
                 bias_row: jnp.ndarray, rep: jnp.ndarray,
                 prompt_row: jnp.ndarray) -> jnp.ndarray:
    """Penalty-adjust a single [V] logits row (the admission-time first
    token, sampled from prefill logits before the slot's rows exist in
    the batch PenaltyState). Same operation order as apply_penalties."""
    seen = prompt_row | (counts_row > 0)
    rep_adj = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(seen, rep_adj, logits)
    return (logits + bias_row
            - jnp.where(counts_row > 0, presence, 0.0)
            - counts_row.astype(jnp.float32) * frequency)


@partial(jax.jit, static_argnames=("cfg", "num_steps", "window", "n_top"),
         donate_argnames=("cache",))
def decode_loop(params, cfg: ModelConfig, tokens: jnp.ndarray,
                positions: jnp.ndarray, active: jnp.ndarray, cache: KVCache,
                sstate: SamplingState, num_steps: int,
                eos_ids: Optional[jnp.ndarray] = None,
                window: Optional[int] = None, n_top: int = 0,
                pstate: Optional[PenaltyState] = None):
    """Run `num_steps` decode iterations on-device.

    tokens: [B] current token per slot.  positions: [B] its cache index.
    active: [B] bool.  eos_ids: [E] i32 stop set (per-model), or None.
    window: STATIC bound on live context for the WHOLE call (see
    llama.decode_step) — the engine picks it from a power-of-two ladder so
    long provisioned windows price at the live context. Must cover every
    active slot's position + num_steps.

    Returns (out_tokens [num_steps, B], out_active [num_steps, B],
    out_logprobs [num_steps, B] f32 — each emitted token's log-probability
    under the full softmax — plus final tokens, positions, active, cache,
    sstate). out_active marks tokens that were generated by a live slot
    (inactive slots emit garbage to keep shapes static; the host discards
    them).

    n_top > 0 additionally returns the EXACT top-n_top alternatives of
    every step's distribution (OpenAI `top_logprobs`): out_top_lp
    [num_steps, B, n_top] f32 and out_top_ids [num_steps, B, n_top] i32.
    Static so the lax.top_k over [B, V] (~0.4 ms/step at V=128k) is only
    paid when some live request asked for it; at n_top == 0 the outputs
    are zero-width and free.
    """
    max_seq = cache.max_seq

    def step(carry, _):
        tokens, positions, active, cache, key, pstate = carry
        # inactive lanes read ONE cache row instead of their parked
        # position's whole window (a freed slot parked at max_seq-1 would
        # otherwise stream the entire cache row every step)
        read_pos = jnp.where(active, positions, 1)
        logits, cache = llama.decode_step(params, cfg, tokens, positions,
                                          cache, window=window,
                                          attn_positions=read_pos)
        # OpenAI penalties/logit_bias: the adjusted distribution feeds
        # sampling AND the reported logprobs/top-k (self-consistency)
        logits = apply_penalties(logits, pstate)
        key, sub = jax.random.split(key)
        nxt = sampling.sample(logits, sub, temperature=sstate.temperature,
                              top_k=sstate.top_k, top_p=sstate.top_p,
                              lane_seeds=sstate.seed,
                              lane_positions=positions)
        lp = token_logprob(logits, nxt)
        top_lp, top_ids = top_candidates(logits, n_top)
        pstate = count_token(pstate, nxt, active)
        # slots that are done keep re-emitting their last token, inactive
        nxt = jnp.where(active, nxt, tokens)
        new_pos = jnp.where(active, positions + 1, positions)
        emitted_by = active
        if eos_ids is not None:
            hit_eos = jnp.any(nxt[:, None] == eos_ids[None, :], axis=-1)
            active = active & ~hit_eos
        # hard stop at cache capacity (slot's NEXT write would overflow)
        active = active & (new_pos < max_seq)
        return (nxt, new_pos, active, cache, key, pstate), \
            (nxt, emitted_by, lp, top_lp, top_ids)

    (tokens, positions, active, cache, key, pstate), \
        (out_tokens, out_active, out_lp, out_top_lp, out_top_ids) = (
            jax.lax.scan(step, (tokens, positions, active, cache,
                                sstate.key, pstate), None, length=num_steps))
    sstate = dataclasses.replace(sstate, key=key)
    return (out_tokens, out_active, out_lp, tokens, positions, active,
            cache, sstate, out_top_lp, out_top_ids, pstate)


def token_logprob(logits: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """log P(ids) under softmax(logits). logits [..., V] f32, ids [...]."""
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    chosen = jnp.take_along_axis(logits, ids[..., None], axis=-1)[..., 0]
    return chosen - lse


def top_candidates(logits: jnp.ndarray, n_top: int
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EXACT top-n_top (logprob, id) pairs of each distribution (OpenAI
    `top_logprobs` — exact lax.top_k, not approx_max_k: the displayed
    alternatives must be the true argmax set). logits [..., V] ->
    ([..., n_top] f32 logprobs, [..., n_top] i32 ids); zero-width when
    n_top == 0 so callers can thread the outputs unconditionally."""
    if n_top == 0:
        shp = logits.shape[:-1] + (0,)
        return jnp.zeros(shp, jnp.float32), jnp.zeros(shp, jnp.int32)
    tl, ti = jax.lax.top_k(logits, n_top)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    return tl - lse[..., None], ti.astype(jnp.int32)


# host-callable variant (first-token candidates at admission time)
top_candidates_host = partial(jax.jit,
                              static_argnames=("n_top",))(top_candidates)


@partial(jax.jit, static_argnames=("cfg", "num_steps", "draft_len",
                                   "window", "n_top"),
         donate_argnames=("cache",))
def spec_decode_loop(params, cfg: ModelConfig, tokens: jnp.ndarray,
                     positions: jnp.ndarray, active: jnp.ndarray,
                     cache: KVCache, sstate: SamplingState,
                     history: jnp.ndarray, num_steps: int, draft_len: int,
                     eos_ids: jnp.ndarray, window: Optional[int] = None,
                     n_top: int = 0):
    """Speculative decode: `num_steps` MACRO-steps, each verifying up to
    `draft_len` n-gram drafts in one forward (llama.verify_step), so one
    weight stream can yield several tokens.

    Drafting is prompt-lookup (quality-neutral, no draft model): find the
    most recent occurrence of the slot's current bigram in its own token
    `history` [B, S] and propose the tokens that followed it. Greedy slots
    only — acceptance compares drafts against exact argmax, so the emitted
    stream is BIT-IDENTICAL to plain decode. Sampled (temperature > 0)
    lanes draft nothing and behave exactly like decode_loop.

    Returns (out_tokens [K, B, draft_len+1], out_counts [K, B] — tokens
    emitted per slot per macro-step, 0 for inactive — plus the updated
    tokens, positions, active, cache, sstate, history).
    """
    max_seq = cache.max_seq
    d = draft_len
    t_blk = d + 1
    s_hist = history.shape[1]
    b = tokens.shape[0]

    def step(carry, _):
        tokens, positions, active, cache, history, key = carry

        # ---- draft: most recent bigram match in the slot's own history
        prev = jnp.take_along_axis(
            history, jnp.maximum(positions - 1, 0)[:, None], axis=1)[:, 0]
        j = jnp.arange(s_hist - 1)
        matches = ((history[:, :-1] == prev[:, None])
                   & (history[:, 1:] == tokens[:, None])
                   & (j[None, :] + 1 < positions[:, None])
                   & (positions[:, None] > 0))
        jstar = jnp.argmax(
            jnp.where(matches, j[None, :], -1), axis=1)      # [B]
        found = jnp.any(matches, axis=1)
        # near the window end a slot stops DRAFTING (the extra block rows
        # would cross max_seq; verify_step's blended clamped write keeps
        # the row-0 write safe) but still emits single tokens to the same
        # cache-capacity bound as plain decode_loop — speculation must not
        # shrink the effective context window
        cap_ok = positions + t_blk <= max_seq
        # draft tokens = history[jstar+2 ..]; only as far as KNOWN history
        navail = jnp.clip(positions - (jstar + 1), 0, d)
        count = jnp.where(found & active & cap_ok
                          & (sstate.temperature <= 0.0),
                          navail, 0)                          # [B]
        didx = jnp.clip(jstar[:, None] + 2 + jnp.arange(d)[None, :], 0,
                        s_hist - 1)
        draft = jnp.take_along_axis(history, didx, axis=1)    # [B, d]

        # ---- verify all candidates in one forward
        tokens_bt = jnp.concatenate([tokens[:, None], draft], axis=1)
        read_pos = jnp.where(active, positions, 1)
        logits_bt, cache = llama.verify_step(params, cfg, tokens_bt,
                                             positions, cache,
                                             window=window,
                                             attn_positions=read_pos)
        pred = jnp.argmax(logits_bt, axis=-1).astype(jnp.int32)  # [B, T]

        # sampled lanes: token 0 via the full sampler (their count is 0)
        key, sub = jax.random.split(key)
        sampled0 = sampling.sample(logits_bt[:, 0], sub,
                                   temperature=sstate.temperature,
                                   top_k=sstate.top_k, top_p=sstate.top_p,
                                   lane_seeds=sstate.seed,
                                   lane_positions=positions)
        em0 = jnp.where(sstate.temperature <= 0.0, pred[:, 0], sampled0)
        em = jnp.concatenate([em0[:, None], pred[:, 1:]], axis=1)  # [B, T]
        lp = token_logprob(logits_bt, em)                          # [B, T]
        top_lp, top_ids = top_candidates(logits_bt, n_top)       # [B,T,n]

        # accepted drafts: longest prefix where draft matches the argmax
        # the verify just computed for the PRECEDING position
        okd = ((draft == pred[:, :-1])
               & (jnp.arange(d)[None, :] < count[:, None]))
        acc = jnp.sum(jnp.cumprod(okd.astype(jnp.int32), axis=1), axis=1)
        n_emit = jnp.where(active, acc + 1, 0)                # [B]

        # clamp to capacity FIRST (plain decode's bound: emissions may
        # advance new_pos to max_seq, no further), so an EOS that falls
        # beyond the clamp doesn't read as "stop"
        room = jnp.maximum(max_seq - positions, 0)
        n_emit = jnp.minimum(n_emit, room)
        # then cut at the first EOS emitted
        is_eos = jnp.any(em[:, :, None] == eos_ids[None, None, :], axis=-1)
        tpos = jnp.arange(t_blk)[None, :]
        eos_pos = jnp.min(jnp.where(is_eos, tpos, t_blk), axis=1)  # [B]
        hit_eos = eos_pos < n_emit
        n_emit = jnp.minimum(n_emit, eos_pos + 1)

        last_ix = jnp.maximum(n_emit - 1, 0)
        new_tok = jnp.where(
            n_emit > 0,
            jnp.take_along_axis(em, last_ix[:, None], axis=1)[:, 0],
            tokens)
        new_pos = positions + n_emit
        new_active = active & ~hit_eos & (new_pos < max_seq)

        # append emitted tokens to history (rows past the new position are
        # untrusted and excluded by the bigram search's position bound)
        upd_idx = jnp.clip(positions[:, None] + 1 + tpos, 0, s_hist - 1)
        keep = tpos < n_emit[:, None]
        cur_vals = jnp.take_along_axis(history, upd_idx, axis=1)
        history = _scatter_rows(history, upd_idx,
                                jnp.where(keep, em, cur_vals))

        out = (em, jnp.where(active, n_emit, 0), lp, top_lp, top_ids)
        return (new_tok, new_pos, new_active, cache, history, key), out

    (tokens, positions, active, cache, history, key), \
        (out_em, out_n, out_lp, out_top_lp, out_top_ids) = (
            jax.lax.scan(step, (tokens, positions, active, cache, history,
                                sstate.key), None, length=num_steps))
    sstate = dataclasses.replace(sstate, key=key)
    return (out_em, out_n, out_lp, tokens, positions, active, cache,
            sstate, history, out_top_lp, out_top_ids)


def _scatter_rows(hist: jnp.ndarray, idx: jnp.ndarray,
                  vals: jnp.ndarray) -> jnp.ndarray:
    """history[b, idx[b, t]] = vals[b, t] (history is tiny — [B, S] i32 —
    so XLA scatter/copy costs here are noise, unlike the KV cache)."""
    b = hist.shape[0]
    bi = jnp.broadcast_to(jnp.arange(b)[:, None], idx.shape)
    return hist.at[bi, idx].set(vals)


@jax.jit
def write_history(history: jnp.ndarray, row: jnp.ndarray, ids: jnp.ndarray,
                  length: jnp.ndarray) -> jnp.ndarray:
    """Admission-time: place a slot's (padded) prompt ids at history[row].
    ids: [S] padded to history width; entries past `length` are zeroed so
    stale tokens can't fake n-gram matches."""
    valid = jnp.where(jnp.arange(ids.shape[0]) < length, ids, 0)
    return history.at[row].set(valid)


@partial(jax.jit, static_argnames=("cfg", "offset"), donate_argnames=("cache",))
def prefill_chunk(params, cfg: ModelConfig, tokens: jnp.ndarray,
                  cache: KVCache, offset: int):
    """Jitted prefill of one [B, T] chunk at static offset; returns the
    LAST-position logits only (what sampling needs) and the cache.

    The unembed runs on the [B, 1, D] last-row slice, NOT the full
    [B, T, D] hidden block: at prefill M the grouped-scale int4 unembed's
    fallback materializes the dequantized [D, V] table per call (measured
    ~6% of 8x1024 prefill, r4b `prefill_shadow` vs `prefill_shadow_u8`),
    while at decode-sized M it streams int4 codes through the grouped
    kernel — slicing first turns prefill's unembed into the cheap decode
    form."""
    h, cache = llama.prefill_hidden(params, cfg, tokens, cache,
                                    offset=offset)
    return llama._unembed(params, cfg, h[:, -1:])[:, 0], cache


@jax.jit
def pack_host_view(out_tokens: jnp.ndarray, out_active: jnp.ndarray,
                   active: jnp.ndarray, pre_tokens: jnp.ndarray,
                   out_logprobs: jnp.ndarray,
                   first_logprobs: jnp.ndarray,
                   top_lp: jnp.ndarray, top_ids: jnp.ndarray) -> jnp.ndarray:
    """Packs the per-call host feedback (emitted tokens [K,B], their
    emitted-by mask [K,B], final slot liveness [B], the pre-decode tokens
    [B] — the on-device-sampled FIRST token of freshly admitted slots —
    the f32 logprobs of both bitcast to i32, and the top-candidate
    logprobs/ids — zero-width unless some request asked for
    `top_logprobs`) into ONE vector so the engine pays a single host
    transfer per loop iteration (device_get round-trips dominate when the
    device sits behind a tunnel, and they're not free anywhere)."""
    return jnp.concatenate([
        out_tokens.reshape(-1).astype(jnp.int32),
        out_active.reshape(-1).astype(jnp.int32),
        active.astype(jnp.int32),
        pre_tokens.astype(jnp.int32),
        jax.lax.bitcast_convert_type(out_logprobs.reshape(-1), jnp.int32),
        jax.lax.bitcast_convert_type(first_logprobs, jnp.int32),
        jax.lax.bitcast_convert_type(top_lp.reshape(-1), jnp.int32),
        top_ids.reshape(-1),
    ])


@jax.jit
def admit_slot(logits, slot, prompt_len, temperature, top_k, top_p, key,
               tokens, positions, active, sstate: SamplingState,
               history: jnp.ndarray, first_lp: jnp.ndarray,
               seed=-1):
    """Finalizes an admission ON DEVICE: samples the first token from the
    prefill logits with the request's params and splices all per-slot state
    — no host round-trip (the sampled token reaches the host in the next
    packed fetch). Also records the first token at history[slot,
    prompt_len] (the n-gram speculation corpus; the prompt itself was
    placed by write_history)."""
    # NB: `seed`'s default is a plain int, NOT jnp.int32(-1) — a jnp scalar
    # in the def line materializes at IMPORT, initializing the PJRT backend;
    # on this image that dials the axon tunnel, and a downed tunnel then
    # hangs every `import gabby_tpu.runtime.generate`.
    temp1 = jnp.full((1,), temperature, jnp.float32)
    # seeded lanes fold the write-position-minus-one convention decode
    # uses (this token lands at prompt_len; decode folds `positions`
    # for the token landing at positions + 1)
    first = sampling.sample(
        logits[None, :], key, temperature=temp1,
        top_k=jnp.full((1,), top_k, jnp.int32),
        top_p=jnp.full((1,), top_p, jnp.float32),
        lane_seeds=jnp.asarray(seed, jnp.int32)[None],
        lane_positions=jnp.asarray(prompt_len - 1, jnp.int32)[None])[0]
    tokens = tokens.at[slot].set(first)
    positions = positions.at[slot].set(prompt_len)
    active = active.at[slot].set(True)
    history = history.at[slot, jnp.minimum(prompt_len,
                                           history.shape[1] - 1)].set(first)
    first_lp = first_lp.at[slot].set(
        token_logprob(logits[None], first[None])[0])
    sstate = dataclasses.replace(
        sstate,
        temperature=sstate.temperature.at[slot].set(temperature),
        top_k=sstate.top_k.at[slot].set(top_k),
        top_p=sstate.top_p.at[slot].set(top_p),
        seed=sstate.seed.at[slot].set(jnp.asarray(seed, jnp.int32)),
    )
    return tokens, positions, active, sstate, history, first_lp


@partial(jax.jit, static_argnames=("cfg", "offset"), donate_argnames=("cache",))
def prefill_batch_chunk(params, cfg: ModelConfig, tokens: jnp.ndarray,
                        lengths: jnp.ndarray, lane_mask: jnp.ndarray,
                        cache: KVCache, offset: int):
    """Batched burst admission: prefill a [B, T] chunk for the lanes in
    `lane_mask` at once (weights stream once for the whole group; unmasked
    lanes' cache rows — possibly live, decoding slots — stay untouched) and
    return per-row logits at each row's LAST VALID position (lengths differ
    per row; rows whose prompt ended in an earlier chunk get garbage —
    group only same-chunk-count prompts)."""
    h, cache = llama.prefill_hidden(params, cfg, tokens, cache,
                                    offset=offset, lane_mask=lane_mask)
    b, t = tokens.shape
    ix = jnp.clip(lengths - 1 - offset, 0, t - 1)
    h_last = h[jnp.arange(b), ix]  # [B, D]
    logits = llama._unembed(params, cfg, h_last[:, None])[:, 0]  # [B, V]
    return logits, cache


@jax.jit
def admit_slots(logits, lengths, temperature, top_k, top_p, key, lane_mask,
                tokens, positions, active, sstate: SamplingState,
                history: jnp.ndarray, first_lp: jnp.ndarray,
                seeds=None):
    """Batched admit_slot for the lanes in `lane_mask` (burst admission):
    samples each row's first token with its own params and splices the slot
    state. Unmasked rows keep their previous state."""
    if seeds is None:
        seeds = jnp.full((logits.shape[0],), -1, jnp.int32)
    nxt = sampling.sample(logits, key, temperature=temperature,
                          top_k=top_k, top_p=top_p,
                          lane_seeds=seeds, lane_positions=lengths - 1)
    lane = lane_mask
    first_lp = jnp.where(lane, token_logprob(logits, nxt), first_lp)
    tokens = jnp.where(lane, nxt, tokens)
    positions = jnp.where(lane, lengths, positions)
    active = jnp.where(lane, True, active)
    b = tokens.shape[0]
    col = jnp.minimum(lengths, history.shape[1] - 1)
    cur = history[jnp.arange(b), col]
    history = history.at[jnp.arange(b), col].set(jnp.where(lane, nxt, cur))
    sstate = dataclasses.replace(
        sstate,
        temperature=jnp.where(lane, temperature, sstate.temperature),
        top_k=jnp.where(lane, top_k, sstate.top_k),
        top_p=jnp.where(lane, top_p, sstate.top_p),
        seed=jnp.where(lane, seeds, sstate.seed),
    )
    return tokens, positions, active, sstate, history, first_lp


@partial(jax.jit, donate_argnames=("cache",))
def copy_slot_prefix(cache: KVCache, src: jnp.ndarray, dst: jnp.ndarray
                     ) -> KVCache:
    """Prefix-cache reuse: copy src slot's ENTIRE cache row onto dst (one
    static-shape dynamic-update-slice per field — ~100 us for a 2k-row 1B
    cache vs ~10 ms to recompute a 512-token prefill). Only the validated
    common-prefix rows are semantically meaningful; everything past them is
    overwritten by the admission's suffix prefill or by decode writes
    before any step can read it (the positions invariant). src/dst are
    traced, so this is ONE compile for any slot pair."""
    def cp(arr):
        if arr is None:
            return None
        row = jax.lax.dynamic_slice_in_dim(arr, src, 1, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(arr, row, dst, axis=1)

    return KVCache(k=cp(cache.k), v=cp(cache.v),
                   k_scale=cp(cache.k_scale), v_scale=cp(cache.v_scale))


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill_slot(params, cfg: ModelConfig, tokens: jnp.ndarray,
                 length: jnp.ndarray, slot: jnp.ndarray, offset: jnp.ndarray,
                 cache: KVCache):
    """Jitted single-slot prefill (continuous batching): [T]-bucket chunk
    into cache row `slot` at position `offset`. length/slot/offset are
    traced — one compile per T bucket. Returns (last-valid logits [V],
    cache)."""
    return llama.prefill_slot(params, cfg, tokens, length, slot, offset, cache)


class CacheLoops:
    """The cache-carrying jit entries with the KV cache's BOUNDARY layouts
    pinned to row-major.

    Why this exists: left to its auto layout assignment, XLA gives
    decode_loop's cache parameters/results an S-minor entry layout while
    the loop body (whose Pallas kernels require row-major operands)
    computes row-major — so every call pays four full-cache layout copies
    (HLO copy.221/222/226/227; ~46 us/step at 64-step calls on the 1B
    bench, ~4x that at serving's short busy calls, and the dominant share
    of the long-provisioned-window tax). Pinning the boundary with
    jax.experimental.layout Formats — the layout create_cache already
    produces — removes them entirely (verified in the compiled HLO).
    Layout pins need CONCRETE shardings, so these jits are built per
    engine/bench from the actual cache tree (+ its NamedShardings under a
    mesh) instead of at module level.

    Wrappers accept the same signatures as the module-level functions but
    forward positionally (pjit forbids kwargs once in_shardings is set).

    CPU backend: the pins are skipped and the SHARED module-level jits are
    used instead (override with GABBY_CACHE_LAYOUTS=1/0). Two reasons,
    both measured on this toolchain: (a) the copies this class removes are
    a TPU layout-assignment artifact — XLA:CPU is row-major everywhere, so
    the pin buys nothing there; (b) per-engine jit instances defeat the
    process-wide jit cache, and a long CPU test session compiling every
    engine's loops from scratch degrades XLA:CPU until its biggest
    compile (the paged+TP decode loop) grinds for tens of minutes or
    overflows the compile thread's 8 MB stack (order-dependent SIGSEGV in
    backend_compile_and_load; reproduced only after a full-suite prefix,
    never standalone).
    """

    def __init__(self, cache, cache_shardings=None):
        import os

        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        pin = os.environ.get("GABBY_CACHE_LAYOUTS")
        self.formats = None
        if (pin == "0") or (pin is None
                            and jax.default_backend() == "cpu"):
            self._decode = decode_loop
            self._spec = spec_decode_loop
            self._prefill_slot = prefill_slot
            self._prefill_batch = prefill_batch_chunk
            self._copy_prefix = copy_slot_prefix
            return

        if cache_shardings is None:
            dev = jax.devices()[0]

            def mk(x):
                return Format(Layout(tuple(range(x.ndim))),
                              SingleDeviceSharding(dev))

            fmt = jax.tree.map(mk, cache)
        else:
            fmt = jax.tree.map(
                lambda x, s: Format(Layout(tuple(range(x.ndim))), s),
                cache, cache_shardings)
        # The paged page table ([B, max_pages] i32 bookkeeping) must NOT
        # carry a layout pin. Its row-major pin differs from the backend's
        # default layout for small int arrays ((1, 0) tiled on v5e), and
        # the persistent compilation cache DROPS custom output layouts
        # when it serves an executable (reproduced in 20 lines: a jit
        # whose out_shardings pin (0, 1) for an int32[8, 4] leaf emits
        # (0, 1) freshly compiled but (1, 0) when loaded from the disk
        # cache — and device_put-to-Format relayouts break the same way).
        # A cache-served prefill therefore emits the default layout and
        # the next pinned decode dispatch hard-errors ("Layout passed to
        # jit does not match the layout on the respective arg", r5c
        # on-chip at page_size 512). The pins exist for the BIG pools
        # (the four-copy problem above); the table rides its default
        # layout consistently everywhere instead.
        if hasattr(cache, "page_table"):
            import dataclasses as _dc
            fmt = _dc.replace(fmt, page_table=fmt.page_table.sharding)
        self.formats = fmt
        N = None
        self._decode = jax.jit(
            decode_loop.__wrapped__, static_argnums=(1, 7, 9, 10),
            donate_argnums=(5,),
            in_shardings=(N, N, N, N, fmt, N, N, N),
            out_shardings=(N, N, N, N, N, N, fmt, N, N, N, N))
        self._spec = jax.jit(
            spec_decode_loop.__wrapped__, static_argnums=(1, 8, 9, 11, 12),
            donate_argnums=(5,),
            in_shardings=(N, N, N, N, fmt, N, N, N),
            out_shardings=(N, N, N, N, N, N, fmt, N, N, N, N))
        self._prefill_slot = jax.jit(
            prefill_slot.__wrapped__, static_argnums=(1,),
            donate_argnums=(6,),
            in_shardings=(N, N, N, N, N, fmt),
            out_shardings=(N, fmt))
        self._prefill_batch = jax.jit(
            prefill_batch_chunk.__wrapped__, static_argnums=(1, 6),
            donate_argnums=(5,),
            in_shardings=(N, N, N, N, fmt),
            out_shardings=(N, fmt))
        self._copy_prefix = jax.jit(
            copy_slot_prefix.__wrapped__, donate_argnums=(0,),
            in_shardings=(fmt, N, N), out_shardings=fmt)

    def pin_cache(self, cache):
        """Places a freshly created cache on the pinned boundary layout so
        the first call's arg layout already matches the jit pins. A
        default-layout initial cache would otherwise be relayouted at
        dispatch — a one-time full-cache copy at warm start, and with a
        persistent compilation cache (executable loaded from disk, relayout
        step skipped) a hard 'Layout passed to jit does not match' error.
        No-op on the CPU/unpinned path."""
        if self.formats is None:
            return cache
        return jax.device_put(cache, self.formats)

    def decode_loop(self, params, cfg, tokens, positions, active, cache,
                    sstate, num_steps, eos_ids=None, window=None, n_top=0,
                    pstate=None):
        return self._decode(params, cfg, tokens, positions, active, cache,
                            sstate, num_steps, eos_ids, window, n_top,
                            pstate)

    def spec_decode_loop(self, params, cfg, tokens, positions, active,
                         cache, sstate, history, num_steps, draft_len,
                         eos_ids, window=None, n_top=0):
        return self._spec(params, cfg, tokens, positions, active, cache,
                          sstate, history, num_steps, draft_len, eos_ids,
                          window, n_top)

    def prefill_slot(self, params, cfg, tokens, length, slot, offset,
                     cache):
        return self._prefill_slot(params, cfg, tokens, length, slot,
                                  offset, cache)

    def prefill_batch_chunk(self, params, cfg, tokens, lengths, lane_mask,
                            cache, offset):
        return self._prefill_batch(params, cfg, tokens, lengths, lane_mask,
                                   cache, offset)

    def copy_slot_prefix(self, cache, src, dst):
        return self._copy_prefix(cache, src, dst)
