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
import queue
import threading
import time
from typing import Any, Optional

import jax
import numpy as np


class HostSyncTimeout(RuntimeError):
    """A collective did not complete in time: a peer controller is dead or
    unreachable. The cluster cannot make progress — the caller must fail
    its in-flight work and stop issuing collectives (the distributed
    runtime is not recoverable past an abandoned collective)."""


class HostSync:
    """Process-0 -> all broadcast of small host-side control payloads.

    timeout: seconds a broadcast may block before declaring a peer dead
    (HostSyncTimeout). The engine's leader heartbeats a no-op plan every
    <= 2 s when idle, so any wait near the timeout means a process is
    gone, not merely idle — this is the cluster-level analogue of the
    request-level socket timeouts (SURVEY §5 "multi-host health
    checking"): a crashed follower fails the leader's in-flight requests
    within a bounded time instead of deadlocking it (and vice versa),
    mirroring the reference's request-level fault discipline
    (/root/reference/src/http/server.cc:371-378) at the layer it never
    had."""

    HB_INTERVAL = 1.0  # seconds between liveness-counter bumps

    def __init__(self, timeout: Optional[float] = 60.0):
        self.process_index = jax.process_index()
        self.num_processes = jax.process_count()
        self.timeout = timeout
        # Liveness ground truth: every process bumps a counter in the
        # coordination service's KV store once a second; `dead_peers`
        # reads the others'. This detects a peer stuck/killed INSIDE a
        # device collective — a hang the broadcast timeout can never see,
        # because the serving loop blocks in the jit call and never
        # reaches the next broadcast. (The coordination service's own
        # heartbeat detection exists but defaults to 100 s and ends in
        # LOG(FATAL) rather than an error the engine can map to request
        # failures.)
        self._client = None
        self._hb_seen: dict[int, tuple[Optional[int], float]] = {}
        # persistent timed-broadcast worker state (lazily started)
        self._bc_req: queue.Queue = queue.Queue()
        self._bc_res: queue.Queue = queue.Queue()
        self._bc_thread: Optional[threading.Thread] = None
        self._bc_poisoned = False
        if self.num_processes > 1:
            try:
                from jax._src import distributed
                self._client = distributed.global_state.client
            except Exception:  # noqa: BLE001 — probe is best-effort
                self._client = None
            now = time.monotonic()
            self._hb_seen = {p: (None, now)
                             for p in range(self.num_processes)
                             if p != self.process_index}
            if self._client is not None:
                threading.Thread(target=self._heartbeat_loop, daemon=True,
                                 name="hostsync-heartbeat").start()

    def _heartbeat_loop(self) -> None:
        key = f"gabby/hb/{self.process_index}"
        while True:
            try:
                self._client.key_value_increment(key, 1)
            except Exception:  # noqa: BLE001
                return  # coordinator gone — peers see our stall either way
            time.sleep(self.HB_INTERVAL)

    def dead_peers(self, stall: Optional[float] = None) -> list[int]:
        """Process ids whose liveness counter has not advanced within
        `stall` seconds (default: the instance timeout) — or EVERY peer,
        when the coordination service itself is unreachable (the
        coordinator process died). Empty list = cluster healthy. A peer
        that never bumped its counter counts from this HostSync's
        construction (all processes construct it in lockstep)."""
        stall = self.timeout if stall is None else stall
        if self.num_processes == 1 or self._client is None or stall is None:
            return []
        now = time.monotonic()
        dead = []
        for p, (val, since) in self._hb_seen.items():
            try:
                cur = int(self._client.key_value_try_get(f"gabby/hb/{p}"))
            except jax.errors.JaxRuntimeError as e:
                if "NOT_FOUND" in str(e):
                    cur = None  # not bumped yet: stall clock keeps running
                else:
                    return [q for q in self._hb_seen]  # coordinator dead
            except Exception:  # noqa: BLE001 — transport failure
                return [q for q in self._hb_seen]
            if cur is not None and cur != val:
                self._hb_seen[p] = (cur, now)
            elif now - since > stall:
                dead.append(p)
        return dead

    @property
    def is_leader(self) -> bool:
        return self.process_index == 0

    def _broadcast_impl(self, payload: Any) -> Any:
        from jax.experimental import multihost_utils

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

    def broadcast(self, payload: Any = None,
                  timeout: Optional[float] = None) -> Any:
        """Leader passes the payload; followers pass anything (ignored).
        Returns the leader's payload on every host. Collective: every
        process must call this at the same point in its loop. Raises
        HostSyncTimeout after `timeout` (default: the instance timeout;
        None = wait forever) — the collective itself cannot be cancelled,
        so its daemon worker thread is abandoned and no further
        collectives may be issued."""
        if self.num_processes == 1:
            return payload
        timeout = self.timeout if timeout is None else timeout
        if timeout is None:
            return self._broadcast_impl(payload)
        if self._bc_poisoned:
            raise HostSyncTimeout(
                "a previous broadcast timed out; the abandoned collective "
                "makes this HostSync unusable")
        # ONE persistent daemon worker serves every timed broadcast (the
        # serving loop calls this per iteration — a thread per call paid
        # creation + join + the test harness's large stack reservation on
        # the multi-host hot path). On timeout the worker is abandoned
        # mid-collective and the instance is poisoned, exactly as before.
        if self._bc_thread is None:
            self._bc_thread = threading.Thread(
                target=self._broadcast_worker, daemon=True,
                name="hostsync-broadcast")
            self._bc_thread.start()
        self._bc_req.put(payload)
        try:
            kind, val = self._bc_res.get(timeout=timeout)
        except queue.Empty:
            self._bc_poisoned = True
            raise HostSyncTimeout(
                f"plan broadcast did not complete within {timeout:.0f}s "
                f"(process {self.process_index}/{self.num_processes}): a "
                f"peer controller is dead or partitioned") from None
        if kind == "err":
            raise val
        return val

    def _broadcast_worker(self) -> None:
        while True:
            payload = self._bc_req.get()
            try:
                self._bc_res.put(("ok", self._broadcast_impl(payload)))
            except BaseException as e:  # noqa: BLE001 — relayed to caller
                self._bc_res.put(("err", e))

    def barrier(self, name: str = "gabby") -> None:
        from jax.experimental import multihost_utils

        if self.num_processes > 1:
            multihost_utils.sync_global_devices(name)
