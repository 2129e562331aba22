"""skeleton_utility.h helpers: model-parameter extrapolation + resampling."""

import numpy as np
import jax.numpy as jnp

from momentum_tpu.character.utility import (
    extrapolate_model_parameters,
    resample_motion,
)


def test_extrapolate_basic():
    prev = jnp.asarray([0.0, 0.0, 1.0])
    cur = jnp.asarray([0.1, 1.0, 1.0])
    out = np.asarray(extrapolate_model_parameters(prev, cur))
    # delta [0.1, 1.0, 0] clamps to [0.1, 0.4, 0], scaled by 0.8
    np.testing.assert_allclose(out, [0.18, 1.32, 1.0], atol=1e-6)


def test_extrapolate_clamps_negative_delta():
    prev = jnp.asarray([1.0])
    cur = jnp.asarray([0.0])
    out = np.asarray(extrapolate_model_parameters(prev, cur,
                                                  factor=0.5, max_delta=0.3))
    np.testing.assert_allclose(out, [-0.15], atol=1e-6)


def test_extrapolate_active_mask_passthrough():
    prev = jnp.zeros(3)
    cur = jnp.asarray([0.1, 1.0, 0.2])
    out = np.asarray(extrapolate_model_parameters(
        prev, cur, active=jnp.asarray([True, False, True])))
    assert out[1] == np.float32(1.0)  # inactive → current unchanged
    np.testing.assert_allclose(out[0], 0.18, atol=1e-6)


def test_extrapolate_size_mismatch_returns_current():
    cur = jnp.asarray([0.5, 0.5])
    out = np.asarray(extrapolate_model_parameters(jnp.zeros(3), cur))
    np.testing.assert_allclose(out, np.asarray(cur), atol=0)


def test_extrapolate_batched():
    prev = jnp.zeros((4, 2))
    cur = jnp.full((4, 2), 0.1)
    out = np.asarray(extrapolate_model_parameters(prev, cur))
    np.testing.assert_allclose(out, np.full((4, 2), 0.18), atol=1e-6)


def test_resample_motion_identity_and_downsample():
    poses = np.arange(10, dtype=np.float32)[:, None]
    same = resample_motion(poses, 30.0, 30.0)
    np.testing.assert_allclose(same, poses, atol=0)
    half = resample_motion(poses, 30.0, 15.0)
    np.testing.assert_allclose(half[:, 0], [0, 2, 4, 6, 8], atol=1e-6)
