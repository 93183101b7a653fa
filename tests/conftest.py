"""Test environment: force JAX onto CPU with 8 virtual devices so mesh /
sharding / collective tests run without TPUs (SURVEY.md §4). Must run before
anything imports jax."""

import os
import resource
import sys
import threading

# XLA:CPU segfaults (SIGSEGV inside backend_compile_and_load) partway
# through a long suite run: always the first fresh compile after ~60
# accumulated tests, regardless of WHICH program is being compiled
# (reproduced 4/4 on the jit path, the eager apply_primitive path, and
# once as a 35-minute compile grind instead of a crash; every crashing
# compile passes instantly when the same test file runs alone). Two
# defenses, both load-bearing:
#   1. a large stack for the main thread (RLIMIT_STACK) and for every
#      Python-created thread (threading.stack_size — glibc ignores a
#      raised rlimit for pthread defaults, measured 8 MB either way),
#      since engine loop threads run jit compiles;
#   2. jax.clear_caches() between test modules (the autouse fixture
#      below) so compiled-executable state cannot accumulate across the
#      whole session.
try:
    resource.setrlimit(resource.RLIMIT_STACK,
                       (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass
threading.stack_size(64 * 1024 * 1024)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jax may already be imported (sitecustomize) with JAX_PLATFORMS=axon baked
# in from the environment, so the env var alone is not enough — force the
# platform through the config as well (backends are not initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The CPU backend's default matmul precision truncates f32 inputs; golden
# tests compare f32 logits against torch, so force exact f32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the suite is compile-bound on a 1-CPU
# host (45+ min serial), and the per-module jax.clear_caches() defense
# above forces recompiles of shapes shared across files. The disk cache
# survives both clear_caches and process restarts, so every run after the
# first loads executables instead of compiling them. GABBY_TEST_COMPILE_CACHE=''
# disables (e.g. to measure true compile times).
_cc = os.environ.get("GABBY_TEST_COMPILE_CACHE",
                     os.path.expanduser("~/.cache/gabby_tpu/xla-tests"))
if _cc:
    os.makedirs(_cc, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Defense 2 (see header): evict compiled executables after every test
    module so XLA:CPU state cannot accumulate session-wide. Costs some
    recompiles of shapes shared across files; prevents the
    order-dependent native compiler SIGSEGV."""
    yield
    jax.clear_caches()
