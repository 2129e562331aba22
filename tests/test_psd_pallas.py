"""psd_solve_pallas (batch-in-lanes panel factorization) == psd_solve.

Runs the kernel in Pallas interpreter mode on the CPU suite platform; the
compiled-mode dispatch is TPU-only (ops/psd_pallas.psd_solve_pallas_available)
and A/B-measured by benchmarks/bench_psd_pallas.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from momentum_tpu.math.linalg import psd_solve
from momentum_tpu.ops.psd_pallas import factor_pallas, psd_solve_pallas


@pytest.mark.parametrize("n", [157, 160, 64])
def test_matches_psd_solve(rng, n):
    b_sz = 128
    j = rng.normal(size=(b_sz, n + 40, n)).astype(np.float32)
    a = jnp.einsum("brp,brq->bpq", j, j) + 0.1 * jnp.eye(n)
    rhs = jnp.asarray(rng.normal(size=(b_sz, n)).astype(np.float32))
    x_ref = psd_solve(a, rhs)
    x_pal = psd_solve_pallas(a, rhs, interpret=True)
    scale = float(jnp.max(jnp.abs(x_ref))) + 1e-30
    np.testing.assert_allclose(np.asarray(x_pal) / scale,
                               np.asarray(x_ref) / scale, atol=2e-5)


def test_factor_matches_blocked_cholesky(rng, monkeypatch):
    from momentum_tpu.math.linalg import blocked_cholesky

    monkeypatch.setenv("MOMENTUM_TPU_PSD_PW", "32")  # match XLA panel width
    b_sz, n = 128, 160
    j = rng.normal(size=(b_sz, n + 20, n)).astype(np.float32)
    a = jnp.einsum("brp,brq->bpq", j, j) + 0.5 * jnp.eye(n)
    linvs_p, l21s_p, widths = factor_pallas(a, interpret=True)
    assert widths == [32] * 5
    _, (linvs_x, cols_x) = blocked_cholesky(a)
    for lp, cx in zip(l21s_p, cols_x):  # cols_x = [lkk; l21]
        np.testing.assert_allclose(np.asarray(lp), np.asarray(cx)[..., 32:, :],
                                   rtol=2e-3, atol=2e-4)
    for ip, ix in zip(linvs_p, linvs_x):
        np.testing.assert_allclose(np.asarray(ip), np.asarray(ix),
                                   rtol=2e-3, atol=2e-4)


def test_matrix_rhs(rng):
    b_sz, n = 128, 96
    j = rng.normal(size=(b_sz, n + 10, n)).astype(np.float32)
    a = jnp.einsum("brp,brq->bpq", j, j) + 0.1 * jnp.eye(n)
    rhs = jnp.asarray(rng.normal(size=(b_sz, n, 3)).astype(np.float32))
    x_ref = psd_solve(a, rhs)
    x_pal = psd_solve_pallas(a, rhs, interpret=True)
    scale = float(jnp.max(jnp.abs(x_ref))) + 1e-30
    np.testing.assert_allclose(np.asarray(x_pal) / scale,
                               np.asarray(x_ref) / scale, atol=2e-5)
