"""Reliability + profiling utilities."""

import time

import numpy as np
import jax.numpy as jnp

from ifseg_tpu.utils.metrics import (
    AverageMeter,
    MetersDict,
    StopwatchMeter,
    SumMeter,
    TimeMeter,
)
from ifseg_tpu.utils.profiling import CompilationWatchdog, StepTimer, span
from ifseg_tpu.utils.reliability import (
    Heartbeat,
    check_grad_norms,
    check_param_sync,
    global_grad_norm,
    param_fingerprint,
)


def test_global_grad_norm():
    g = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.zeros((2, 2))}
    assert float(global_grad_norm(g)) == 5.0


def test_single_process_checks_pass():
    assert check_grad_norms(1.234)
    assert check_param_sync({"w": jnp.ones((3,))})


def test_param_fingerprint_changes_with_params():
    a = param_fingerprint({"w": jnp.ones((4,))})
    b = param_fingerprint({"w": jnp.ones((4,)) * 2})
    assert a != b


def test_watchdog_flags_slow_step():
    wd = CompilationWatchdog(warmup_steps=0, threshold=5.0)
    for _ in range(10):
        assert not wd.step(0.01)
    assert wd.step(1.0)  # 100x median -> recompile suspicion


def test_step_timer_and_span():
    t = StepTimer()
    with t, span("unit_test_step"):
        time.sleep(0.01)
    assert t.last >= 0.01


def test_heartbeat_detects_stall(caplog):
    hb = Heartbeat(timeout=0.1).start()
    time.sleep(0.35)
    hb.stop()
    assert any("no training progress" in r.message for r in caplog.records)


def test_meters_state_roundtrip():
    md = MetersDict()
    md.add_meter("avg", AverageMeter(round=3))
    md.add_meter("sum", SumMeter())
    md["avg"].update(2.0, 1)
    md["avg"].update(4.0, 1)
    md["sum"].update(np.asarray([1.0, 2.0]))
    state = md.state_dict()
    md2 = MetersDict()
    md2.load_state_dict(state)
    assert md2["avg"].avg == 3.0
    np.testing.assert_array_equal(md2["sum"].sum, [1.0, 2.0])


def test_named_aggregator_reset_between_uses():
    """Reusing a named aggregator without reset would accumulate across
    validations (regression: train-time valid mIoU was cumulative)."""
    from ifseg_tpu.utils import metrics as m

    for expected in (1.0, 0.25):
        m.reset_meters("val_reset_test")
        with m.aggregate("val_reset_test") as agg:
            inter = np.array([1.0]) * expected
            union = np.array([1.0])
            m.log_seg_areas((inter, inter, inter, union))
        assert agg.get_smoothed_values()["mIoU"] == expected
