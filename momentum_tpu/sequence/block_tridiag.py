"""Structured linear algebra for sequence solves.

The reference factors the band-plus-arrowhead GN system with a streaming
Householder QR (math/online_householder_qr.h:369-410) whose sequential
column elimination is the wrong shape for TPU. The TPU-native equivalent
(SURVEY.md §2.9/§7.8) solves the block-banded *normal equations* directly —
the precedent is SequenceCholeskySolverT (sequence_cholesky_solver.h:20-60),
which also forms banded normal equations.

Pieces:
  * block_tridiag_solve — block Thomas recursion via two lax.scan passes
    (each step = a few p×p MXU matmuls + one p×p Cholesky).
  * banded_to_tridiag — aggregates a half-bandwidth-q block-banded system
    into a block-tridiagonal one with (q·p)-sized superblocks, so any
    window-(q+1) sequence error reduces to the tridiagonal case.
  * schur_arrowhead_solve — eliminates per-frame blocks against the shared
    "universal" parameters (the arrowhead), mirroring the reference's
    per-frame/common split (sequence_solver_function.h:31-131).

All functions are jittable, differentiable, and batched in the trailing
right-hand-side dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from momentum_tpu.math.linalg import psd_solve

__all__ = ["block_tridiag_solve", "banded_to_tridiag", "schur_arrowhead_solve"]


def _chol_solve(a, b):
    return psd_solve(a, b)


def block_tridiag_solve(diag: jnp.ndarray, upper: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve a symmetric positive-definite block-tridiagonal system.

    diag:  (F, p, p)   diagonal blocks A_f
    upper: (F-1, p, p) super-diagonal blocks B_f = H[f, f+1] (so H[f+1, f] = B_fᵀ)
    rhs:   (F, p, k)
    Returns x (F, p, k).

    Block Thomas algorithm: forward Schur elimination then back-substitution,
    both as lax.scan (sequential over frames; each step is dense p×p work).
    """
    f_total = diag.shape[0]
    if f_total == 1:
        return _chol_solve(diag[0], rhs[0])[None]

    # forward: S_0 = A_0, y_0 = b_0;
    # S_f = A_f − B_{f-1}ᵀ S_{f-1}⁻¹ B_{f-1};  y_f = b_f − B_{f-1}ᵀ S_{f-1}⁻¹ y_{f-1}
    def fwd(carry, inp):
        s_prev, y_prev = carry
        a_f, b_prev, r_f = inp
        w = _chol_solve(s_prev, jnp.concatenate([b_prev, y_prev], axis=-1))
        p = b_prev.shape[-1]
        s_f = a_f - b_prev.T @ w[:, :p]
        y_f = r_f - b_prev.T @ w[:, p:]
        return (s_f, y_f), (s_f, y_f)

    (s_last, y_last), (s_rest, y_rest) = jax.lax.scan(
        fwd, (diag[0], rhs[0]), (diag[1:], upper, rhs[1:])
    )
    s_all = jnp.concatenate([diag[:1], s_rest], axis=0)
    y_all = jnp.concatenate([rhs[:1], y_rest], axis=0)

    # backward: x_{F-1} = S⁻¹ y; x_f = S_f⁻¹ (y_f − B_f x_{f+1})
    x_last = _chol_solve(s_last, y_last)

    def bwd(x_next, inp):
        s_f, y_f, b_f = inp
        x_f = _chol_solve(s_f, y_f - b_f @ x_next)
        return x_f, x_f

    _, x_rest = jax.lax.scan(
        bwd, x_last, (s_all[:-1], y_all[:-1], upper), reverse=True
    )
    return jnp.concatenate([x_rest, x_last[None]], axis=0)


def banded_to_tridiag(diag: jnp.ndarray, offs: list[jnp.ndarray]):
    """Aggregate a half-bandwidth-q block-banded SPD system into a
    block-tridiagonal system of (q·p)-sized superblocks.

    diag: (F, p, p); offs[k-1]: (F-k, p, p) = H[f, f+k] for k = 1..q.
    F must be padded to a multiple of q by the caller (identity diag blocks,
    zero rhs). Returns (super_diag (G, qp, qp), super_upper (G-1, qp, qp))
    with G = F // q.
    """
    q = len(offs)
    f_total, p, _ = diag.shape
    assert f_total % q == 0, "pad frame count to a multiple of the bandwidth"
    g = f_total // q
    qp = q * p

    # dense within-superblock assembly: block (i, j) of superframe s is
    # H[s*q+i, s*q+j]
    sup_diag = jnp.zeros((g, qp, qp), diag.dtype)
    for i in range(q):
        sup_diag = sup_diag.at[:, i * p:(i + 1) * p, i * p:(i + 1) * p].set(
            diag[i::q][:g]
        )
    for k in range(1, q):
        blocks = offs[k - 1]
        for i in range(q - k):
            j = i + k
            b = blocks[i::q][:g]
            sup_diag = sup_diag.at[:, i * p:(i + 1) * p, j * p:(j + 1) * p].set(b)
            sup_diag = sup_diag.at[:, j * p:(j + 1) * p, i * p:(i + 1) * p].set(
                jnp.swapaxes(b, -1, -2)
            )

    # coupling superblock (s, s+1): H[s*q+i, (s+1)*q+j] nonzero when
    # (q - i) + j ≤ q i.e. j ≤ i, offset k = q - i + j
    sup_upper = jnp.zeros((g - 1, qp, qp), diag.dtype) if g > 1 else jnp.zeros((0, qp, qp), diag.dtype)
    for i in range(q):
        for j in range(q):
            k = q - i + j
            if 1 <= k <= q:
                blocks = offs[k - 1]
                rows = blocks[i::q]  # frame index s*q + i
                b = rows[:g - 1]
                sup_upper = sup_upper.at[:, i * p:(i + 1) * p, j * p:(j + 1) * p].set(b)
    return sup_diag, sup_upper


def schur_arrowhead_solve(
    diag: jnp.ndarray,  # (F, p, p)
    upper: jnp.ndarray,  # (F-1, p, p)
    u_coupling: jnp.ndarray,  # (F, p, nu) frame-universal coupling H[f, u]
    u_block: jnp.ndarray,  # (nu, nu)
    rhs_f: jnp.ndarray,  # (F, p)
    rhs_u: jnp.ndarray,  # (nu,)
):
    """Solve [[T, U], [Uᵀ, S]] [x_f; x_u] = [b_f; b_u] with T block-tridiagonal.

    The arrowhead elimination: x_u = (S − Uᵀ T⁻¹ U)⁻¹ (b_u − Uᵀ T⁻¹ b_f),
    then x_f = T⁻¹ (b_f − U x_u). One banded solve with nu+1 right-hand
    sides + one dense nu×nu solve — the TPU replacement for the reference's
    serialized common-column QR updates (online_householder_qr.h:369-410).
    """
    f_total, p, nu = u_coupling.shape
    rhs = jnp.concatenate([u_coupling, rhs_f[..., None]], axis=-1)  # (F, p, nu+1)
    sol = block_tridiag_solve(diag, upper, rhs)
    t_inv_u = sol[..., :nu]  # (F, p, nu)
    t_inv_b = sol[..., nu]  # (F, p)

    ut_tinv_u = jnp.einsum("fpu,fpv->uv", u_coupling, t_inv_u)
    ut_tinv_b = jnp.einsum("fpu,fp->u", u_coupling, t_inv_b)
    schur = u_block - ut_tinv_u
    x_u = _chol_solve(schur, rhs_u - ut_tinv_b)

    x_f = t_inv_b - jnp.einsum("fpu,u->fp", t_inv_u, x_u)
    return x_f, x_u
