"""Multi-host serving coordination.

In JAX's multi-controller runtime every process must issue IDENTICAL jit
calls in the same order, but requests only arrive at host 0's HTTP front
door. HostSync closes that gap: host 0 broadcasts each serving-loop
iteration's plan (admissions, decode step count) and every host replays the
same device calls — params stay TP-sharded across hosts, control stays in
lockstep. (Replaces the NCCL/MPI coordination role; SURVEY.md §2b — the
reference has no distributed anything.)

Payloads are arbitrary pickled objects, moved with a two-phase broadcast
(fixed [1] length first, then the padded payload) since
`broadcast_one_to_all` needs identical shapes on every process.
"""

from __future__ import annotations

import pickle
from typing import Any

import jax
import numpy as np


class HostSync:
    """Process-0 -> all broadcast of small host-side control payloads."""

    def __init__(self):
        self.process_index = jax.process_index()
        self.num_processes = jax.process_count()

    @property
    def is_leader(self) -> bool:
        return self.process_index == 0

    def broadcast(self, payload: Any = None) -> Any:
        """Leader passes the payload; followers pass anything (ignored).
        Returns the leader's payload on every host. Collective: every
        process must call this at the same point in its loop."""
        from jax.experimental import multihost_utils

        if self.num_processes == 1:
            return payload
        data = pickle.dumps(payload if self.is_leader else None)
        length = multihost_utils.broadcast_one_to_all(
            np.asarray([len(data)], np.int32),
            is_source=self.is_leader)
        n = int(length[0])
        buf = np.zeros((n,), np.uint8)
        if self.is_leader:
            buf[:] = np.frombuffer(data, np.uint8)
        buf = multihost_utils.broadcast_one_to_all(
            buf, is_source=self.is_leader)
        return pickle.loads(buf.tobytes())

    def barrier(self, name: str = "gabby") -> None:
        from jax.experimental import multihost_utils

        if self.num_processes > 1:
            multihost_utils.sync_global_devices(name)
