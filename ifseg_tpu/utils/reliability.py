"""Failure detection / sanitizers (SURVEY.md §5).

TPU-native analogs of the reference's functional sanitizers:
  - ``check_grad_norms``: cross-host gradient-norm consistency — the de-facto
    replica-desync detector (trainer.py:1408-1445)
  - ``param_fingerprint`` / ``check_param_sync``: cross-host parameter hash
    check (catches desynced replicas after a restore or a flaky collective)
  - ``Heartbeat``: watchdog thread that logs (and optionally kills) when the
    train loop stops making progress
    (distributed/distributed_timeout_wrapper.py:17-94)
  - ``nan_debug``: context manager enabling ``jax_debug_nans`` to localize the
    op producing a NaN (the NanDetector rerun analog, nan_detector.py:14-108;
    the trainer's in-step non-finite skip handles recovery, this is for
    debugging)
"""

import contextlib
import logging
import os
import signal
import threading
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def global_grad_norm(grads: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


def check_grad_norms(local_norm: float, tolerance: float = 1e-4) -> bool:
    """All-gather grad norms across hosts and assert consistency
    (trainer.py:1408-1445).  Single-process: trivially True."""
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    norms = multihost_utils.process_allgather(jnp.asarray(local_norm))
    norms = np.asarray(norms)
    ref = norms[0]
    ok = bool(np.all(np.abs(norms - ref) <= tolerance * max(abs(ref), 1e-6)))
    if not ok:
        logger.error(
            "grad norms inconsistent across hosts: %s — replicas desynced "
            "(bad data sharding or collective failure)", norms.tolist()
        )
    return ok


@jax.jit
def _fingerprint_program(params: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(params)
    acc = jnp.zeros((), jnp.float32)
    for i, p in enumerate(leaves):
        acc = acc + (i + 1) * jnp.sum(p.astype(jnp.float32) ** 2)
    return acc


def param_fingerprint(params: Any) -> np.ndarray:
    """Cheap order-stable fingerprint of a parameter pytree.

    ONE jitted program over the whole tree, not an eager op per leaf: with
    cross-process-sharded params every per-leaf reduction is its own
    collective program, each with a fresh Gloo communicator rendezvous whose
    key-value window is a hard 30 s — a storm of hundreds of tiny programs
    deadlocks two time-sharing processes as soon as the shared compile cache
    lets one race ahead of the other (observed: worker 0 parked in the
    subsequent allgather while worker 1 was still mid-storm).  A desynced
    REPLICATED leaf still changes the result per-process (its contribution is
    computed locally, no collective), which is exactly what the cross-host
    comparison in check_param_sync needs to see."""
    return np.asarray(jax.device_get(_fingerprint_program(params)))


def check_param_sync(params: Any, tolerance: float = 1e-5) -> bool:
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    fp = param_fingerprint(params)
    fps = np.asarray(multihost_utils.process_allgather(jnp.asarray(fp)))
    ok = bool(np.all(np.abs(fps - fps[0]) <= tolerance * max(abs(fps[0]), 1e-6)))
    if not ok:
        logger.error("parameter fingerprints differ across hosts: %s", fps.tolist())
    return ok


class Heartbeat:
    """Kill/log when no progress within ``timeout`` seconds
    (DistributedTimeoutWrapper analog)."""

    def __init__(self, timeout: float, kill: bool = False):
        self.timeout = timeout
        self.kill = kill
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def beat(self):
        self._last = time.monotonic()

    def start(self):
        if self.timeout <= 0:
            return self

        def watch():
            while not self._stop.wait(min(self.timeout / 4, 30.0)):
                stalled = time.monotonic() - self._last
                if stalled > self.timeout:
                    logger.error(
                        "no training progress for %.0fs (timeout %.0fs)",
                        stalled, self.timeout,
                    )
                    if self.kill:
                        os.kill(os.getpid(), signal.SIGINT)
                    self._last = time.monotonic()  # don't spam

        self._thread = threading.Thread(target=watch, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    """Enable jax_debug_nans for the block — errors at the producing op."""
    if not enable:
        yield
        return
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)
