"""Small-matrix linear algebra helpers.

`psd_solve` replaces jax.scipy's cho_factor/cho_solve pair: on TPU the scipy
wrappers lower to a path ~80× slower for batched small matrices (measured
9.85 ms vs 0.13 ms for 2048×31×31 on v5e); the raw lax.linalg cholesky +
two triangular solves hit the fast batched kernels directly.

For larger n (the 157-parameter full-body rig), XLA's own batched Cholesky
is column-at-a-time — every one of the n steps re-touches the full (B, n, n)
matrix, ~n passes over HBM (measured 92 ms for (2048, 157, 157) on v5e where
the bandwidth bound is < 1 ms). `blocked_cholesky` restores the blocked
right-looking algorithm: per 32-wide panel, one small Cholesky + one
triangular inverse + MXU matmuls for the trailing syrk update — O(n/32)
passes instead of O(n).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["psd_solve", "damped_psd_solve", "blocked_cholesky",
           "blocked_cholesky_solve"]

_BLOCK = int(__import__("os").environ.get("MOMENTUM_TPU_CHOL_BLOCK", 32))
# below this size XLA's native path wins (fewer dispatches)
_BLOCKED_MIN_N = 64


def _use_blocked() -> bool:
    """The blocked/unrolled path is a TPU optimization (10× at n=157 on v5e).

    On CPU the fully-unrolled panels generate enormous HLO ("Very slow
    compile") and LAPACK's cholesky is already fast — dispatch there instead.
    Trace-time platform check: `jax.default_backend()` is a plain Python
    query, safe inside jit tracing."""
    if jax.default_backend() == "cpu":
        return False
    return True


def _chol_unrolled(a: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of a small (..., k, k) SPD block, fully unrolled.

    XLA's lax.linalg.cholesky lowers to a While loop whose per-step overhead
    dominates at these sizes on TPU; k unrolled column stages fuse instead."""
    k = a.shape[-1]
    l = jnp.zeros_like(a)
    for j in range(k):
        col = a[..., j:, j]
        if j:
            col = col - jnp.einsum(
                "...im,...m->...i", l[..., j:, :j], l[..., j, :j])
        d = jnp.sqrt(col[..., :1])
        l = l.at[..., j:, j].set(col / d)
    return l


def _tri_inv(l: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a small (..., k, k) lower-triangular block (k a power of 2
    times an odd base ≤ 2) via breadth-batched block recursion:
    inv([[A,0],[B,C]]) = [[A⁻¹,0],[−C⁻¹ B A⁻¹, C⁻¹]], with the two halves
    stacked on the batch axis so each level is O(1) batched matmuls."""
    k = l.shape[-1]
    if k == 1:
        return 1.0 / l
    if k % 2:
        eye = jnp.broadcast_to(jnp.eye(k, dtype=l.dtype), l.shape)
        return jax.lax.linalg.triangular_solve(l, eye, left_side=True,
                                               lower=True)
    h = k // 2
    batch = l.shape[:-2]
    sub = jnp.stack([l[..., :h, :h], l[..., h:, h:]], axis=0)
    inv = _tri_inv(sub)
    i11, i22 = inv[0], inv[1]
    i21 = -jnp.matmul(i22, jnp.matmul(l[..., h:, :h], i11))
    top = jnp.concatenate(
        [i11, jnp.zeros(batch + (h, h), l.dtype)], axis=-1)
    bot = jnp.concatenate([i21, i22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def blocked_cholesky(a: jnp.ndarray, block: int = _BLOCK):
    """Blocked right-looking Cholesky of SPD a (..., n, n) with n % block == 0.

    Returns (l, linvs) — the lower factor and the per-panel inverses of
    its diagonal blocks (reused by the blocked substitutions)."""
    n = a.shape[-1]
    nb = n // block
    mm = jnp.matmul
    cols = []       # (..., n - k*block, block) panels of L
    linvs = []      # (..., block, block) inverses of diagonal blocks
    trail = a       # trailing submatrix, shrinks by `block` each step
    for _ in range(nb):
        dkk = trail[..., :block, :block]
        lkk = _chol_unrolled(dkk)
        linv = _tri_inv(lkk)
        a21 = trail[..., block:, :block]
        # L21 = A21 · Lkk^{-T}  (pure matmul on the MXU)
        l21 = mm(a21, jnp.swapaxes(linv, -1, -2))
        cols.append(jnp.concatenate([lkk, l21], axis=-2))
        linvs.append(linv)
        # trailing update: A22 − L21·L21ᵀ (one syrk matmul, O(1) passes)
        a22 = trail[..., block:, block:]
        trail = a22 - mm(l21, jnp.swapaxes(l21, -1, -2))
    batch = a.shape[:-2]
    full = []
    for k, c in enumerate(cols):
        top = jnp.zeros(batch + (k * block, block), a.dtype)
        full.append(jnp.concatenate([top, c], axis=-2))
    l = jnp.concatenate(full, axis=-1)
    return l, (linvs, cols)


def blocked_cholesky_solve(l_or_factors, linvs, b: jnp.ndarray,
                           block: int = _BLOCK):
    """Solve L Lᵀ x = b given blocked_cholesky output. b (..., n, k).

    Accepts either the assembled lower factor or (preferably) the raw column
    panels from `blocked_cholesky` — the panel form skips materializing the
    (…, n, n) factor entirely."""
    if isinstance(linvs, tuple):
        linvs, cols = linvs
    else:
        cols = None
    mm = jnp.matmul

    if cols is not None:
        nb = len(cols)

        def lblk(r, c):
            # rows [r] of column panel c (cols[c] holds rows c*block..n)
            off = (r - c) * block
            return cols[c][..., off:off + block, :]
    else:
        nb = l_or_factors.shape[-1] // block

        def lblk(r, c):
            return l_or_factors[..., r * block:(r + 1) * block,
                                c * block:(c + 1) * block]

    # forward: y_k = Lkk^{-1} (b_k − Σ_{j<k} L[k,j] y_j)
    ys = []
    for k in range(nb):
        rhs = b[..., k * block:(k + 1) * block, :]
        for j in range(k):
            rhs = rhs - mm(lblk(k, j), ys[j])
        ys.append(mm(linvs[k], rhs))
    # backward: x_k = Lkk^{-T} (y_k − Σ_{j>k} L[j,k]ᵀ x_j)
    xs = [None] * nb
    for k in reversed(range(nb)):
        rhs = ys[k]
        for j in range(k + 1, nb):
            rhs = rhs - mm(jnp.swapaxes(lblk(j, k), -1, -2), xs[j])
        xs[k] = mm(jnp.swapaxes(linvs[k], -1, -2), rhs)
    return jnp.concatenate(xs, axis=-2)


def damped_psd_solve(a: jnp.ndarray, damp_diag: jnp.ndarray,
                     b: jnp.ndarray) -> jnp.ndarray:
    """Solve (a + diag(damp_diag)) x = b for SPD a (..., n, n).

    On the batched TPU fast path the damping folds into the factorization's
    pad copy (ops/psd_pallas.py), saving the explicit a+diag materialization
    pass (~2·n²·B·4 bytes of HBM per LM iteration at the bench shape)."""
    n = a.shape[-1]
    if (n >= _BLOCKED_MIN_N and a.ndim == 3
            and __import__("os").environ.get("MOMENTUM_TPU_PSD_PALLAS", "1")
            != "0"):
        from momentum_tpu.ops.psd_pallas import (
            psd_solve_pallas, psd_solve_pallas_available)

        if psd_solve_pallas_available(n, a.shape[0]):
            dd = jnp.broadcast_to(damp_diag, a.shape[:-1]).astype(a.dtype)
            return psd_solve_pallas(a, b, damp_diag=dd)
    eye = jnp.eye(n, dtype=a.dtype)
    return psd_solve(a + damp_diag[..., None] * eye, b)


def psd_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a x = b for SPD a. a (..., n, n); b (..., n) or (..., n, k)."""
    vec = b.ndim == a.ndim - 1
    rhs = b[..., None] if vec else b
    n = a.shape[-1]
    # Batched TPU fast path: Pallas batch-in-lanes panel factorization
    # (ops/psd_pallas.py) — measured 2× the XLA blocked path at the bench
    # shape (12.5 → 6.3 ms, B=2048 n=157 on v5e; round-5 A/B,
    # benchmarks/bench_psd_pallas.py). MOMENTUM_TPU_PSD_PALLAS=0 disables.
    if (n >= _BLOCKED_MIN_N and a.ndim == 3
            and __import__("os").environ.get("MOMENTUM_TPU_PSD_PALLAS", "1")
            != "0"):
        from momentum_tpu.ops.psd_pallas import (
            psd_solve_pallas, psd_solve_pallas_available)

        if psd_solve_pallas_available(n, a.shape[0]):
            return psd_solve_pallas(a, b)
    if n >= _BLOCKED_MIN_N and _use_blocked():
        pad = (-n) % _BLOCK
        if pad:
            # embed in a block-diagonal [[a, 0], [0, I]] — same solution
            a = jnp.concatenate(
                [jnp.concatenate(
                    [a, jnp.zeros(a.shape[:-2] + (n, pad), a.dtype)], -1),
                 jnp.concatenate(
                     [jnp.zeros(a.shape[:-2] + (pad, n), a.dtype),
                      jnp.broadcast_to(jnp.eye(pad, dtype=a.dtype),
                                       a.shape[:-2] + (pad, pad))], -1)], -2)
            rhs = jnp.concatenate(
                [rhs, jnp.zeros(rhs.shape[:-2] + (pad,) + rhs.shape[-1:],
                                rhs.dtype)], -2)
        _, factors = blocked_cholesky(a)
        x = blocked_cholesky_solve(None, factors, rhs)
        x = x[..., :n, :]
    else:
        l = jax.lax.linalg.cholesky(a)
        y = jax.lax.linalg.triangular_solve(l, rhs, left_side=True, lower=True)
        x = jax.lax.linalg.triangular_solve(l, y, left_side=True, lower=True,
                                            transpose_a=True)
    return x[..., 0] if vec else x
