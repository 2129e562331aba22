"""Foundation-layer utilities (reference: common/{log,progress_bar}.h tests,
math/random.h random_test.cpp)."""

import io
import contextlib

import numpy as np
import jax.numpy as jnp

from momentum_tpu.utils.logging import get_logger, set_log_level
from momentum_tpu.utils.progress import ProgressBar
from momentum_tpu.utils.profiling import profile_scope
from momentum_tpu.utils.random import (
    GlobalRandom,
    get_global_random,
    set_global_seed,
)


def test_progress_bar_draws_and_clamps():
    buf = io.StringIO()
    with ProgressBar("solving", total=10, stream=buf, force=True) as bar:
        bar.increment(4)
        bar.set_progress(10)
        bar.increment(5)  # beyond total must clamp, not crash
    out = buf.getvalue()
    assert "solving" in out
    assert "100%" in out or "10/10" in out


def test_log_level_round_trip():
    logger = get_logger()
    set_log_level("debug")
    assert logger.level == 10
    set_log_level("warning")
    assert logger.level == 30
    set_log_level("info")


def test_profile_scope_is_transparent():
    with profile_scope("unit-test-zone"):
        x = jnp.sum(jnp.arange(8))
    assert int(x) == 28


def test_global_random_determinism():
    """Same seed → same stream; reseeding restarts it (random_test.cpp)."""
    set_global_seed(12345)
    a = get_global_random().uniform(size=5)
    set_global_seed(12345)
    b = get_global_random().uniform(size=5)
    np.testing.assert_array_equal(a, b)

    r1 = GlobalRandom(7)
    r2 = GlobalRandom(7)
    np.testing.assert_array_equal(r1.normal(size=4), r2.normal(size=4))
    np.testing.assert_array_equal(r1.integers(0, 100, 8),
                                  r2.integers(0, 100, 8))
    assert r1.seed == 7
