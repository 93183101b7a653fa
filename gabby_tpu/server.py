"""Serving entry point: `python -m gabby_tpu.server`.

The full product the reference sketches (/root/reference/src/main.cc:109-124
plus its unchecked TODO list): the C++ HTTP front-end (via gabby_tpu.bridge)
serving OpenAI chat completions, backed by the continuous-batching JAX
engine. Flags mirror the reference's (--port, --workers, --model-dir,
timeouts, log levels) plus engine knobs (quantization, slots, max-seq).

Examples:
  python -m gabby_tpu.server --model-dir ~/models/llama-3.2-1b --quant 8
  python -m gabby_tpu.server --preset tiny --random-weights --port 0
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading
from typing import Optional

import jax
import jax.numpy as jnp


def _build_engine(args, sync=None):
    from gabby_tpu import config as cfglib
    from gabby_tpu.models import llama
    from gabby_tpu.ops import quant
    from gabby_tpu.runtime.engine import Engine, EngineConfig
    from gabby_tpu.tokenizer import Tokenizer

    bits = args.quant if args.quant in (4, 8) else None
    if args.act_fp8:
        # must be set before anything traces (jit caches don't key on it)
        quant.set_act_fp8(True)

    mesh = None
    multi = sync is not None and sync.num_processes > 1
    if multi:
        # multi-controller: one global mesh spanning every process's
        # devices. dp > 1 shards the slot batch over the data axis (the
        # engine replicates its packed host view before each fetch, so
        # controllers stay in lockstep — Engine._host_fetch)
        from gabby_tpu.parallel import make_mesh
        n = jax.device_count()
        if n % args.dp != 0:
            sys.exit(f"--dp {args.dp} must divide the global device count "
                     f"{n}")
        if args.slots % args.dp != 0:
            sys.exit(f"--slots {args.slots} must be divisible by --dp "
                     f"{args.dp} (slots shard over the data axis)")
        mesh = make_mesh(dp=args.dp, tp=n // args.dp)
    elif args.tp > 1 or args.dp > 1:
        from gabby_tpu.parallel import make_mesh
        n = args.dp * args.tp
        mesh = make_mesh(dp=args.dp, tp=args.tp, devices=jax.devices()[:n])
        if args.slots % args.dp != 0:
            sys.exit(f"--slots {args.slots} must be divisible by --dp "
                     f"{args.dp} (slots shard over the data axis)")

    if args.model_dir:
        from gabby_tpu.loader import load_model_dir
        put_fn = None
        if mesh is not None:
            # shard leaves AS they load: big checkpoints never need to fit
            # unsharded on a single device
            from gabby_tpu.parallel import sharded_device_put_fn
            put_fn = sharded_device_put_fn(mesh)
        cfg, params, tokenizer = load_model_dir(
            args.model_dir, dtype=jnp.bfloat16, quant_bits=bits,
            max_seq_len=args.max_seq, device_put_fn=put_fn)
    else:
        preset = getattr(cfglib, args.preset)
        cfg = preset(max_seq_len=args.max_seq)
        if not args.random_weights:
            sys.exit("no --model-dir given: pass --random-weights to serve "
                     "a randomly initialized model (smoke tests only)")
        params = llama.init_params(cfg, jax.random.PRNGKey(0),
                                   dtype=jnp.bfloat16 if args.preset != "tiny"
                                   else jnp.float32)
        if bits:
            params = quant.quantize_tree(params, bits)
        tokenizer = Tokenizer.byte_fallback(cfg.vocab_size)

    # tensor-parallel placement over local devices when asked
    cache_shardings = None
    tp_size = 1 if mesh is None else mesh.shape.get("model", 1)
    fusable = (tp_size == 1
               or (cfg.q_dim % tp_size == 0 and cfg.kv_dim % tp_size == 0
                   and cfg.intermediate_size % tp_size == 0))
    if fusable:
        # fuse qkv and gate/up into single matmuls (one kernel call streams
        # the whole group). Under a model axis the fusion is SHARD-AWARE:
        # per-shard column blocks so the TP column sharding stays exact
        # (llama.fuse_projections / cfg.fused_tp)
        params = llama.fuse_projections(params, tp=tp_size)
        if tp_size > 1:
            import dataclasses
            cfg = dataclasses.replace(cfg, fused_tp=tp_size)
    if mesh is not None:
        from gabby_tpu.parallel import (cache_shardings as mk_cache_sh,
                                        paged_cache_shardings, shard_params)
        if not args.model_dir or fusable:
            # random weights were built replicated; fused leaves are fresh
            # concatenations that must be (re-)pinned to the mesh
            params = shard_params(params, mesh, fused_tp=tp_size)
        if args.paged_pages > 0:
            cache_shardings = paged_cache_shardings(
                mesh, quantized=args.kv_quant)
        else:
            cache_shardings = mk_cache_sh(mesh, quantized=args.kv_quant)

    econfig = EngineConfig(
        batch_slots=args.slots,
        paged_pages=args.paged_pages,
        page_size=args.page_size,
        max_seq=args.max_seq,
        steps_per_call=args.steps_per_call,
        steps_per_call_busy=args.steps_per_call_busy,
        default_max_tokens=args.max_tokens,
        kv_quantized=args.kv_quant,
        speculate_tokens=args.speculate,
        spec_breakeven=args.spec_breakeven,
        spec_reprobe_steps=args.spec_reprobe_steps,
        # --pair-kv defaults to AUTO: on when eligible (dense cache, no
        # mesh, even kv-head count). Decode measured ~10.5% faster and
        # mixed serving 1025 vs 947 tok/s on-chip once the paired prefill
        # was routed to its XLA fallback (the round-3 "collapse" was the
        # paired prefill kernel failing v5e's scoped-VMEM COMPILE limit —
        # ops/attention.slot_prefill_attention). --no-pair-kv reverts;
        # on-chip parity probes: tools/pair_chip_check.py,
        # tools/pair_engine_chip_check.py.
        # auto-pair: dense AND paged — the r4b paged-pairing loss was the
        # paired prefill falling off-kernel; the round-5 paired
        # flash-prefill kernel (query-group grid axis) reversed it
        # (r5a 256-row ladder: 1197.5 paired vs 1148.0 unpaired tok/s;
        # r5c 512-row paired reaches dense parity, 1195 vs 1201).
        # --no-pair-kv reverts
        pair_kv_heads=(args.pair_kv if args.pair_kv is not None
                       else (cache_shardings is None
                             and cfg.num_kv_heads % 2 == 0)),
        prefill_int8_shadow=args.prefill_int8_shadow,
        # sequence-parallel prefill for long admissions under dp>1
        # (parallel/sp.py; ring=True swaps the Ulysses all-gather for ring
        # attention over ICI, parallel/ring.py)
        sp_prefill_tokens=args.sp_prefill_tokens,
        sp_prefill_ring=args.sp_ring,
        pipeline_fetch=args.pipeline_fetch,
        cache_dtype="float32" if args.preset == "tiny" and not args.model_dir
        else "bfloat16",
    )
    return Engine(cfg, params, tokenizer, econfig,
                  cache_shardings=cache_shardings, sync=sync), cfg


def _top_entries(engine, rows):
    """OpenAI `top_logprobs` payload: per generated token, the top-k
    alternatives of its distribution as [{token, logprob}] (rows are the
    engine's (id, logprob) pairs)."""
    return [[{"token": engine.tokenizer.decode([i]),
              "logprob": round(lp, 6)} for i, lp in row]
            for row in rows]


def make_handler(engine):
    """Adapts bridge requests to the engine (the Generator seam)."""

    def handler(request: dict, emit) -> None:
        kw = dict(
            max_tokens=request.get("max_tokens") or None,
            temperature=(request["temperature"]
                         if request.get("temperature", -1) >= 0 else None),
            top_k=request.get("top_k") if request.get("top_k", -1) >= 0 else None,
            top_p=(request["top_p"]
                   if 0 < request.get("top_p", -1) <= 1 else None),
            stop=request.get("stop") or None,
            top_logprobs=int(request.get("top_logprobs") or 0),
            priority=int(request.get("priority") or 0),
            deadline_s=(request["deadline_ms"] / 1e3
                        if request.get("deadline_ms") else None),
            presence_penalty=float(request.get("presence_penalty") or 0.0),
            frequency_penalty=float(request.get("frequency_penalty") or 0.0),
            logit_bias=request.get("logit_bias") or None,
            repetition_penalty=float(
                request.get("repetition_penalty") or 1.0),
            seed=(int(request["seed"])
                  if request.get("seed", -1) >= 0 else None),
        )
        from gabby_tpu.runtime.engine import RequestError
        try:
            if request.get("raw"):
                req = engine.submit_raw(request.get("prompt", ""), **kw)
            else:
                req = engine.submit(request["messages"], **kw)
        except RequestError as e:
            # client error (over-length prompt, unsupported top_k): the
            # front-end maps status 400 to a Bad Request response
            emit({"error": str(e), "status": 400, "done": True})
            return
        streaming = bool(request.get("stream"))
        want_lp = bool(request.get("logprobs"))
        lp_seen = 0  # tokens already attached to streamed chunks
        parts: list[str] = []
        while True:
            delta, fin = req.out.get()
            if delta:
                if streaming:
                    chunk = {"delta": delta}
                    if want_lp:
                        # logprobs of tokens delivered since the last
                        # chunk (engine appends before each queue push,
                        # so the prefix read here is complete)
                        upto = len(req.token_logprobs)
                        if req.top_logprobs:
                            # the engine appends token_top AFTER
                            # token_logprobs; reading between the two
                            # appends would drop a top-k row and misalign
                            # every later chunk — clamp to the shorter list
                            upto = min(upto, len(req.token_top))
                        chunk["token_logprobs"] = [
                            round(x, 6)
                            for x in req.token_logprobs[lp_seen:upto]]
                        chunk["tokens"] = [
                            engine.tokenizer.decode([i])
                            for i in req.token_ids[lp_seen:upto]]
                        if req.top_logprobs:
                            chunk["top_logprobs"] = _top_entries(
                                engine, req.token_top[lp_seen:upto])
                        lp_seen = upto
                    if not emit(chunk):
                        # client went away: free the slot instead of
                        # generating the rest for nobody, then drain
                        engine.cancel(req)
                        while fin is None:
                            _, fin = req.out.get()
                        return
                else:
                    parts.append(delta)
            if fin is not None:
                if fin.startswith("error"):
                    err = {"error": fin, "done": True}
                    if "deadline" in fin:
                        err["status"] = 408  # expired while queued
                    emit(err)
                    return
                if fin == "abort":
                    # engine shut down (or died) with this request in
                    # flight: an error, NOT a zero-token 200 the client
                    # can't tell from a real empty completion
                    emit({"error": "engine shut down", "status": 503,
                          "done": True})
                    return
                final = {
                    "delta": "" if streaming else "".join(parts),
                    "done": True,
                    # "deadline" passes through (documented extension: the
                    # request's deadline_ms elapsed mid-generation; the
                    # text generated so far is returned)
                    "finish_reason": ("stop" if fin == "stop" else
                                      "deadline" if fin == "deadline"
                                      else "length"),
                    "prompt_tokens": len(req.prompt_ids),
                    "completion_tokens": req.completion_tokens,
                }
                if request.get("logprobs") and req.token_logprobs:
                    # per generated token: its string form and log-prob
                    # under the full softmax (non-streaming responses)
                    final["token_logprobs"] = [round(x, 6)
                                               for x in req.token_logprobs]
                    final["tokens"] = [engine.tokenizer.decode([i])
                                       for i in req.token_ids]
                    if req.top_logprobs:
                        final["top_logprobs"] = _top_entries(
                            engine, req.token_top)
                emit(final)
                return

    return handler


def main(argv: Optional[list[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="gabby_tpu.server")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--read-timeout-millis", type=int, default=60000)
    p.add_argument("--write-timeout-millis", type=int, default=600000)
    p.add_argument("--model-dir", default="")
    p.add_argument("--preset", default="llama32_1b",
                   choices=["tiny", "llama32_1b", "llama32_3b", "llama3_8b",
                            "llama3_70b"])
    p.add_argument("--random-weights", action="store_true",
                   help="serve random weights (no --model-dir; smoke tests)")
    p.add_argument("--quant", type=int, default=0, choices=[0, 4, 8],
                   help="weight-only quantization bits (0 = bf16)")
    p.add_argument("--kv-quant", action="store_true",
                   help="INT8 KV cache")
    p.add_argument("--act-fp8", action="store_true",
                   help="pass activations through the fp8(e4m3) grid with "
                        "per-token scales before every matmul (BASELINE "
                        "config 5; emulated on TPUs without fp8 MXUs)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree over local devices")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel degree (decode slots shard over the "
                        "mesh's data axis; requires --slots %% dp == 0)")
    p.add_argument("--slots", type=int, default=8,
                   help="continuous-batching decode slots")
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--paged-pages", type=int, default=0,
                   help="KV cache page pool size (> 0 switches to the "
                        "paged cache: capacity scales with tokens in use, "
                        "prefix reuse shares pages zero-copy; 0 = dense)")
    p.add_argument("--page-size", type=int, default=512,
                   help="rows per KV page in paged mode (512 measured "
                        "fastest; smaller pages = finer capacity "
                        "granularity)")
    p.add_argument("--prefill-int8-shadow", action="store_true",
                   help="prefill through an exact int8 shadow of int4 "
                        "weights (2x weight HBM, same numerics, int8-speed "
                        "TTFT; see EngineConfig.prefill_int8_shadow)")
    p.add_argument("--pair-kv", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="paired kv-head cache layout: half the MXU passes "
                        "in flash decode attention (dense AND paged "
                        "caches; see EngineConfig.pair_kv_heads). Default: "
                        "auto — on when eligible (no mesh, even kv-head "
                        "count); measured ~10%% faster decode and serving "
                        "on-chip. --no-pair-kv reverts")
    p.add_argument("--sp-prefill-tokens", type=int, default=1024,
                   help="sequence-parallel prefill threshold: admission "
                        "chunks >= this many tokens shard their token axis "
                        "over the mesh's data axis when --dp > 1 "
                        "(Ulysses-style; 0 disables)")
    p.add_argument("--sp-ring", action="store_true",
                   help="use ring attention over ICI for sequence-parallel "
                        "prefill instead of the GSPMD K/V all-gather: "
                        "per-device chunk K/V memory drops to O(T/dp) for "
                        "prompts whose gathered K/V would not fit")
    p.add_argument("--pipeline-fetch", action="store_true",
                   help="dispatch decode burst N+1 before fetching burst "
                        "N's host view (measured a serving LOSS on "
                        "tunneled D2H paths — see EngineConfig."
                        "pipeline_fetch; only for deployments whose D2H "
                        "is out-of-band with program execution)")
    p.add_argument("--speculate", type=int, default=0,
                   help="speculative decoding: verify up to N n-gram "
                        "prompt-lookup drafts per forward for greedy "
                        "requests (bit-identical output; auto-disables "
                        "when acceptance is too low)")
    p.add_argument("--spec-breakeven", type=float, default=1.2,
                   help="tokens/verify below which speculation loses "
                        "throughput (re-derive per hardware; see "
                        "EngineConfig.spec_breakeven)")
    p.add_argument("--spec-reprobe-steps", type=int, default=8192,
                   help="re-probe a disabled speculation after this many "
                        "plain decode steps (0 = sticky-off)")
    p.add_argument("--max-tokens", type=int, default=512,
                   help="default completion cap")
    p.add_argument("--steps-per-call", type=int, default=8)
    p.add_argument("--steps-per-call-busy", type=int, default=8,
                   help="decode steps fused per device call while requests "
                        "are queued or prefilling (lower = better TTFT)")
    p.add_argument("--coordinator", default="",
                   help="multi-host: jax.distributed coordinator host:port "
                        "(start the same command on every host; host 0 "
                        "serves HTTP, the rest follow its plan broadcasts)")
    p.add_argument("--num-processes", type=int, default=0,
                   help="multi-host: total controller processes")
    p.add_argument("--process-id", type=int, default=-1,
                   help="multi-host: this controller's index")
    p.add_argument("--model-id", default="")
    p.add_argument("--log-level", type=int, default=3,
                   help="front-end log level (0 off .. 4 debug)")
    p.add_argument("--sync-timeout", type=float, default=60.0,
                   help="multi-host: seconds a plan broadcast may block "
                        "before the peer is declared dead and in-flight "
                        "requests fail (0 = wait forever)")
    p.add_argument("--profiler-port", type=int, default=0,
                   help="start a jax.profiler trace server on this port")
    p.add_argument("--compile-cache", default="~/.cache/gabby_tpu/xla",
                   metavar="DIR",
                   help="persistent XLA compilation cache directory: every "
                        "cold start after the first loads its serving "
                        "programs from disk instead of recompiling "
                        "(measured 6.8s -> 0.3s per program on this host). "
                        "'' disables")
    p.add_argument("--warmup", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="dress-rehearse the engine before /readyz reports "
                        "ready (compiles the serving program set so the "
                        "first real request never stalls on compilation; "
                        "/healthz stays pure liveness). --no-warmup skips")
    args = p.parse_args(argv)

    if args.compile_cache:
        import os
        cache_dir = os.path.expanduser(args.compile_cache)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.profiler_port:
        jax.profiler.start_server(args.profiler_port)

    sync = None
    if args.coordinator:
        from gabby_tpu.parallel.mesh import initialize_multihost
        from gabby_tpu.parallel.multihost import HostSync
        initialize_multihost(args.coordinator,
                             args.num_processes or None,
                             args.process_id if args.process_id >= 0 else None)
        sync = HostSync(timeout=args.sync_timeout or None)

    from gabby_tpu.bridge import NativeServer

    engine, cfg = _build_engine(args, sync=sync)

    if sync is not None and not sync.is_leader:
        # follower controller: no HTTP front door — the engine thread
        # replays the leader's plan broadcasts until the leader's shutdown
        # plan arrives (delivered when the leader exits)
        print(f"follower {sync.process_index}/{sync.num_processes} "
              "serving leader plans", flush=True)
        engine._thread.join()
        return 0
    model_id = args.model_id or (args.model_dir.rstrip("/").rsplit("/", 1)[-1]
                                 if args.model_dir else args.preset)
    server = NativeServer(
        make_handler(engine), port=args.port, workers=args.workers,
        model_id=model_id, read_timeout_millis=args.read_timeout_millis,
        write_timeout_millis=args.write_timeout_millis,
        log_level=args.log_level, stats_fn=engine.stats_snapshot)
    # multi-host: warmup is single-host only (Engine.warmup docstring —
    # a leader-side stats reset would desynchronize the replicated
    # counters the speculation flip derives from)
    do_warmup = args.warmup and sync is None
    if do_warmup:
        server.set_ready(False)
    port = server.start()
    print(f"listening on port {port}", flush=True)
    if do_warmup:
        # /readyz answers 503 ("warming") while this runs; requests that
        # arrive early still work — they just queue behind the rehearsal
        secs = engine.warmup()
        server.set_ready(True)
        print(f"ready (warm-up {secs:.1f}s)", flush=True)
    elif args.warmup:
        print("warm-up skipped (multi-host)", flush=True)

    stop = threading.Event()

    def on_signal(sig, frame):
        del sig, frame
        stop.set()

    try:
        signal.signal(signal.SIGINT, on_signal)
        signal.signal(signal.SIGTERM, on_signal)
    except ValueError:
        # main() embedded off the main thread (tests, notebook hosts):
        # signals stay with the embedder; stop via KeyboardInterrupt from
        # there or let daemon threads die with the process
        pass
    # wait in Python (not in native Wait) so signals are deliverable
    while not stop.is_set():
        stop.wait(0.2)
    server.close()
    engine.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
