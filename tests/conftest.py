"""Test environment: force JAX onto CPU with 8 virtual devices so mesh /
sharding / collective tests run without TPUs (SURVEY.md §4). Must run before
anything imports jax."""

import os
import sys

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
