"""utils: step timers, logger, profiling hooks."""

import time


def test_step_timer_rates():
    from mrisr_tpu.utils import StepTimer

    t = StepTimer(items_per_step=4)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3
    assert s["elapsed_s"] >= 0.03
    assert 0 < s["steps_per_sec"] <= 100
    # both fields are independently rounded to 2 decimals from a wall-clock
    # rate — exact equality flakes (r1 verdict); allow rounding slack
    import pytest

    assert s["items_per_sec"] == pytest.approx(s["steps_per_sec"] * 4, abs=0.011)
    t.reset()
    assert t.steps == 0


def test_logger_singleton():
    from mrisr_tpu.utils import get_logger

    a = get_logger("mrisr.test")
    b = get_logger("mrisr.test")
    assert a is b and len(a.handlers) == 1


def test_profile_trace_noop_and_nan_debug():
    import jax

    from mrisr_tpu.utils import enable_nan_debug, profile_trace

    with profile_trace(None):
        pass
    enable_nan_debug(True)
    assert jax.config.jax_debug_nans
    enable_nan_debug(False)
    assert not jax.config.jax_debug_nans
