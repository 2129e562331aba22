"""Pallas damped-Cholesky kernels vs dense reference (interpret mode, CPU).

Both kernels lose to the XLA blocked path on real hardware (see
docs/BENCHMARKS.md) but stay correct and available; these tests pin their
numerics so a future revival starts from a verified base."""

import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.ops.chol_pallas import (
    chol_solve_pallas,
    chol_solve_pallas_blocked,
)


def _problem(B=4, n=64, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(0, 1, (B, n, n)).astype(np.float32)
    A = M @ np.transpose(M, (0, 2, 1)) + n * np.eye(n, dtype=np.float32)
    damp = rng.uniform(0.1, 1.0, (B, n)).astype(np.float32)
    b = rng.normal(0, 1, (B, n)).astype(np.float32)
    ref = np.stack([np.linalg.solve(A[i] + np.diag(damp[i]), b[i])
                    for i in range(B)])
    return jnp.asarray(A), jnp.asarray(damp), jnp.asarray(b), ref


@pytest.mark.parametrize("kernel,kw", [
    (chol_solve_pallas, {}),
    (chol_solve_pallas_blocked, {"bt": 4}),
])
def test_damped_solve_matches_dense(kernel, kw):
    A, damp, b, ref = _problem()
    x = kernel(A, damp, b, interpret=True, **kw)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(x) / scale, ref / scale, atol=3e-6)


def test_blocked_handles_batch_padding():
    A, damp, b, ref = _problem(B=3, n=32)
    x = chol_solve_pallas_blocked(A, damp, b, interpret=True, bt=4)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(x) / scale, ref / scale, atol=3e-6)
