"""Structured linear-algebra tests: block-tridiagonal / banded / arrowhead
solvers vs dense numpy solves (reference analog: online_householder_qr tests,
momentum/test/math/online_householder_qr_test.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.sequence.block_tridiag import (
    banded_to_tridiag,
    block_tridiag_solve,
    schur_arrowhead_solve,
)


def _rng():
    return np.random.default_rng(12345)


def _spd_tridiag(rng, f, p):
    diag = np.zeros((f, p, p))
    upper = rng.normal(size=(f - 1, p, p)) * 0.3
    for i in range(f):
        m = rng.normal(size=(p, p))
        diag[i] = m @ m.T + (p + 2) * np.eye(p)
    return diag, upper


def _dense_from_tridiag(diag, upper):
    f, p, _ = diag.shape
    h = np.zeros((f * p, f * p))
    for i in range(f):
        h[i * p:(i + 1) * p, i * p:(i + 1) * p] = diag[i]
    for i in range(f - 1):
        h[i * p:(i + 1) * p, (i + 1) * p:(i + 2) * p] = upper[i]
        h[(i + 1) * p:(i + 2) * p, i * p:(i + 1) * p] = upper[i].T
    return h


@pytest.mark.parametrize("f,p", [(1, 3), (2, 3), (7, 4), (16, 2)])
def test_block_tridiag_matches_dense(f, p):
    rng = _rng()
    diag, upper = _spd_tridiag(rng, f, p)
    rhs = rng.normal(size=(f, p, 2))
    x = np.asarray(block_tridiag_solve(
        jnp.asarray(diag, jnp.float32), jnp.asarray(upper, jnp.float32),
        jnp.asarray(rhs, jnp.float32)))
    h = _dense_from_tridiag(diag, upper)
    x_dense = np.linalg.solve(h, rhs.reshape(f * p, 2)).reshape(f, p, 2)
    np.testing.assert_allclose(x, x_dense, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("f,p,q", [(6, 3, 2), (9, 2, 3), (8, 3, 2)])
def test_banded_aggregation_matches_dense(f, p, q):
    rng = _rng()
    # build SPD banded: H = Lᵀ L with L banded gives half-bandwidth q
    n = f * p
    dense = np.zeros((n, n))
    m = rng.normal(size=(n, n)) * 0.2
    for i in range(n):
        for j in range(n):
            if abs(i // p - j // p) > q:
                m[i, j] = 0.0
    dense = m @ m.T + (2 * n) * np.eye(n)
    # zero out blocks beyond bandwidth q (product of banded isn't exactly banded)
    for bi in range(f):
        for bj in range(f):
            if abs(bi - bj) > q:
                dense[bi * p:(bi + 1) * p, bj * p:(bj + 1) * p] = 0.0

    diag = np.stack([dense[i * p:(i + 1) * p, i * p:(i + 1) * p] for i in range(f)])
    offs = [
        np.stack([dense[i * p:(i + 1) * p, (i + k) * p:(i + k + 1) * p]
                  for i in range(f - k)])
        for k in range(1, q + 1)
    ]
    rhs = rng.normal(size=(f, p, 1))

    # pad frames to a multiple of q with identity blocks / zero rhs
    pad = (-f) % q
    if pad:
        diag_p = np.concatenate([diag, np.tile(np.eye(p), (pad, 1, 1))])
        offs_p = [np.concatenate([o, np.zeros((pad, p, p))]) for o in offs]
        offs_p = [o[:f + pad - (k + 1)] for k, o in enumerate(offs_p)]
        rhs_p = np.concatenate([rhs, np.zeros((pad, p, 1))])
    else:
        diag_p, offs_p, rhs_p = diag, offs, rhs

    sd, su = banded_to_tridiag(
        jnp.asarray(diag_p, jnp.float32), [jnp.asarray(o, jnp.float32) for o in offs_p])
    g = diag_p.shape[0] // q
    x_sup = np.asarray(block_tridiag_solve(sd, su, jnp.asarray(
        rhs_p.reshape(g, q * p, 1), jnp.float32)))
    x = x_sup.reshape(-1, p, 1)[:f]

    x_dense = np.linalg.solve(dense, rhs.reshape(f * p)).reshape(f, p, 1)
    np.testing.assert_allclose(x, x_dense, rtol=2e-3, atol=2e-4)


def test_schur_arrowhead_matches_dense():
    rng = _rng()
    f, p, nu = 6, 3, 2
    diag, upper = _spd_tridiag(rng, f, p)
    u_coupling = rng.normal(size=(f, p, nu)) * 0.3
    m = rng.normal(size=(nu, nu))
    u_block = m @ m.T + 10 * np.eye(nu)
    rhs_f = rng.normal(size=(f, p))
    rhs_u = rng.normal(size=(nu,))

    x_f, x_u = schur_arrowhead_solve(
        jnp.asarray(diag, jnp.float32), jnp.asarray(upper, jnp.float32),
        jnp.asarray(u_coupling, jnp.float32), jnp.asarray(u_block, jnp.float32),
        jnp.asarray(rhs_f, jnp.float32), jnp.asarray(rhs_u, jnp.float32))

    n = f * p
    h = np.zeros((n + nu, n + nu))
    h[:n, :n] = _dense_from_tridiag(diag, upper)
    for i in range(f):
        h[i * p:(i + 1) * p, n:] = u_coupling[i]
        h[n:, i * p:(i + 1) * p] = u_coupling[i].T
    h[n:, n:] = u_block
    b = np.concatenate([rhs_f.reshape(-1), rhs_u])
    x = np.linalg.solve(h, b)
    np.testing.assert_allclose(np.asarray(x_f).reshape(-1), x[:n], rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(x_u), x[n:], rtol=3e-3, atol=3e-4)


def test_cyclic_reduction_matches_thomas():
    """The batched-parallel CR path equals the sequential Thomas scan on
    random SPD tridiagonal systems of every parity/size class."""
    from momentum_tpu.sequence.block_tridiag import (
        block_tridiag_solve_cr, block_tridiag_solve_thomas)

    rng = np.random.default_rng(7)
    for f, p, k in ((1, 4, 1), (2, 6, 2), (7, 5, 2), (16, 4, 1), (33, 3, 3)):
        m = rng.normal(0, 1, (f, p, p))
        diag = jnp.asarray(m @ np.transpose(m, (0, 2, 1)) + 4 * p * np.eye(p),
                           jnp.float32)
        upper = jnp.asarray(rng.normal(0, 0.3, (max(f - 1, 0), p, p)),
                            jnp.float32)
        rhs = jnp.asarray(rng.normal(0, 1, (f, p, k)), jnp.float32)
        x_t = block_tridiag_solve_thomas(diag, upper, rhs)
        x_c = block_tridiag_solve_cr(diag, upper, rhs)
        scale = float(jnp.max(jnp.abs(x_t)))
        np.testing.assert_allclose(np.asarray(x_c) / scale,
                                   np.asarray(x_t) / scale, atol=1e-5,
                                   err_msg=f"F={f} p={p} k={k}")


def test_spike_partitioned_matches_thomas():
    """Single-device SPIKE partitioning (the production dispatch for long
    sequences) equals the sequential scan, including non-divisible chunk
    sizes and multiple right-hand sides."""
    from momentum_tpu.sequence.block_tridiag import (
        block_tridiag_solve_partitioned, block_tridiag_solve_thomas)

    rng = np.random.default_rng(11)
    for f, p, k, parts in ((37, 5, 2, 4), (64, 4, 1, 8), (100, 3, 3, 8),
                           (130, 6, 2, 16)):
        m = rng.normal(0, 1, (f, p, p))
        diag = jnp.asarray(m @ np.transpose(m, (0, 2, 1)) + 4 * p * np.eye(p),
                           jnp.float32)
        upper = jnp.asarray(rng.normal(0, 0.3, (f - 1, p, p)), jnp.float32)
        rhs = jnp.asarray(rng.normal(0, 1, (f, p, k)), jnp.float32)
        x_t = block_tridiag_solve_thomas(diag, upper, rhs)
        x_s = block_tridiag_solve_partitioned(diag, upper, rhs, parts)
        scale = float(jnp.max(jnp.abs(x_t)))
        np.testing.assert_allclose(np.asarray(x_s) / scale,
                                   np.asarray(x_t) / scale, atol=1e-5,
                                   err_msg=f"F={f} p={p} K={parts}")
