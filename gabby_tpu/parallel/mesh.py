"""Device mesh construction.

The reference has no distributed anything (SURVEY.md §2b: no second process,
no device code). Here scale-out is XLA-native: one Mesh with ("data",
"model") axes; tensor parallelism rides the "model" axis over ICI, request
throughput rides "data". Multi-host serving uses the same mesh spanning a
pod slice via jax.distributed (multi-controller), with the HTTP front door
on host 0 broadcasting requests (see runtime/engine.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

AXES = ("data", "model")


def make_mesh(dp: int = 1, tp: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """dp x tp mesh over the given (default: all) devices.

    tp defaults to len(devices) // dp. The "model" axis is placed innermost
    so tensor-parallel collectives ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    assert dp * tp == len(devices), (
        f"dp*tp = {dp}*{tp} != {len(devices)} devices")
    try:
        dev_array = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    except (ValueError, AssertionError):
        dev_array = np.array(devices).reshape(dp, tp)
    return Mesh(dev_array, AXES)


def local_mesh() -> Mesh:
    """1x1 mesh on the first device — lets single-chip code share the
    sharded code path (specs all collapse to replicated)."""
    return make_mesh(dp=1, tp=1, devices=jax.devices()[:1])


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up for multi-host pod slices. No-op if already
    initialized or if running single-process.

    Recoverability is enabled so that a peer's death surfaces as a
    collective ERROR for the runtime's failure handling (HostSync
    timeouts fail in-flight requests; engine._loop_guarded maps it to
    request errors) instead of the coordination service LOG(FATAL)-ing
    the surviving processes before they can react — the serving-level
    discipline tests/test_multihost.py::test_follower_death_* asserts."""
    try:
        try:
            jax.config.update("jax_enable_recoverability", True)
        except Exception:
            pass  # older jax: flag absent; coordination service defaults
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
