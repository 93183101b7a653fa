"""REAL multi-process serving-step test: two jax.distributed controllers
(CPU backend, 4 virtual devices each) form one global 1x8 mesh, host 0
broadcasts the serving plan (HostSync), and both hosts run identical
TP-sharded prefill+decode steps in lockstep. Asserts both processes decode
the same tokens — the multi-controller contract BASELINE config 4 (8B INT4
over v5e-16) depends on. The driver's dryrun covers single-process virtual
meshes only; this covers the actual cross-process path."""

import os
import subprocess
import sys

import pytest

WORKER = r'''
import os, sys, pickle
import numpy as np

port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.getcwd())  # cwd = repo root (set by the test)

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
import jax.numpy as jnp
from gabby_tpu.config import tiny
from gabby_tpu.models import llama
from gabby_tpu.ops import quant
from gabby_tpu.parallel import cache_shardings, make_mesh, shard_params
from gabby_tpu.parallel.multihost import HostSync
from gabby_tpu.runtime import generate
from gabby_tpu.runtime.kv_cache import create_cache

assert jax.device_count() == 4 * nprocs, jax.devices()
sync = HostSync()
mesh = make_mesh(dp=1, tp=jax.device_count())

cfg = tiny(num_heads=2 * jax.device_count(), num_kv_heads=jax.device_count(),
           head_dim=8, hidden_size=32, intermediate_size=64,
           vocab_size=256, max_seq_len=32)
params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
params = shard_params(quant.quantize_tree(params, 8), mesh)
batch = 2
cache = jax.device_put(create_cache(cfg, batch, cfg.max_seq_len, quantized=True),
                       cache_shardings(mesh, quantized=True))

# host 0 decides the plan; everyone else replays it
plan = sync.broadcast({"prompt": [5, 9, 77, 31, 2, 8, 11, 3],
                       "steps": 6} if sync.is_leader else None)
prompt = np.asarray(plan["prompt"], np.int32)

# per-slot prefill in lockstep (same traced shapes on every host)
for slot in range(batch):
    logits, cache = generate.prefill_slot(
        params, cfg, jnp.asarray(prompt), jnp.int32(len(prompt)),
        jnp.int32(slot), jnp.int32(0), cache)

first = jnp.argmax(logits, -1).astype(jnp.int32)
tokens = jnp.full((batch,), first, jnp.int32)
positions = jnp.full((batch,), len(prompt), jnp.int32)
active = jnp.ones((batch,), bool)
sstate = generate.SamplingState.greedy(batch)

out_tokens, *_ = generate.decode_loop(
    params, cfg, tokens, positions, active, cache, sstate, plan["steps"])
print("TOKENS", pid, np.asarray(out_tokens).reshape(-1).tolist(), flush=True)
sync.barrier("done")
'''


@pytest.mark.parametrize("nprocs", [2])
def test_two_process_lockstep_decode(tmp_path, nprocs):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(port), str(i),
                          str(nprocs)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    token_lines = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("TOKENS"):
                _, pid, toks = line.split(" ", 2)
                token_lines[pid] = toks
    assert len(token_lines) == nprocs
    assert len(set(token_lines.values())) == 1, (
        f"hosts diverged: {token_lines}")
