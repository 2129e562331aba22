"""Pallas TPU kernel: fused batched damped Cholesky factor + solve.

The solver's inner linear solve — (JᵀJ + λD) δ = Jᵀr for a batch of ~2048
systems of size ~160 — is the second-largest block of an LM iteration. The
XLA blocked Cholesky (math/linalg.py) is already ~10× faster than
lax.linalg.cholesky at this shape, but it still runs every factorization
stage as a separate HBM-round-trip op (~8 ms/iteration at B=2048, n=160 on
v5e). This kernel keeps each batch tile VMEM-resident for the WHOLE
factor + forward + backward pipeline: one HBM read of A, one write of x.

Reference precedent: the reference solves the same damped system with
Eigen::LLT per problem (momentum/solver/gauss_newton_solver.cpp:237-250);
this is its TPU shape — batch-major tiles, unrolled right-looking rank-1
Cholesky on the VPU, substitutions fused in.

Algorithm (per batch tile of `bt` systems, all unrolled over k):
  s = a + diag(damp)                      # damping fused into the load
  for k in 0..n-1:                        # factor + forward substitution
    c_k   = s[:, k, :] · mask(col ≥ k) / sqrt(s[:, k, k])   # row == col: s
                                          # stays symmetric, so the row read
                                          # (lane-contiguous) IS column k of L
    y_k   = y[:, k] / L_kk                # forward substitution step
    y    -= c_k · y_k
    s    -= c_sub ⊗ c_k                   # rank-1 trailing update
    s[:, k, :] = c_k                      # store L row into the dead row
  for k = n-1..0:                         # backward substitution (Lᵀ x = y)
    x_k = (y_k − Σ_{j>k} L[j,k]·x_j) / L_kk   # L[j,k] = s[:, k, j] — a row
Everything is static-shape masked math; k is a Python int, so masks are
compile-time constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["chol_solve_pallas", "chol_solve_pallas_available"]

_BT = 8  # batch tile: systems factorized per grid step


def chol_solve_pallas_available(n: int) -> bool:
    return jax.default_backend() == "tpu" and n % 8 == 0


def _kernel(a_ref, damp_ref, b_ref, x_ref, s_ref, y_ref, invd_ref, *, n: int):
    f32 = jnp.float32
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(f32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n) lane index

    # damping folded into the load: (damp[:, None, :] * eye)[b, i, j] = damp_i·δij
    s_ref[:] = a_ref[:] + damp_ref[:][:, None, :] * eye[None]
    y_ref[:] = b_ref[:]
    x_ref[:] = jnp.zeros_like(x_ref)  # backward pass reads masked garbage else

    # ---- factor + forward substitution ----
    for k in range(n):
        rowk = s_ref[:, k, :]  # (bt, n) — row k == column k (symmetric trail)
        inv = jax.lax.rsqrt(jnp.maximum(rowk[:, k : k + 1], 1e-30))  # (bt, 1)
        c = rowk * (col >= k).astype(f32) * inv  # (bt, n), zero below k
        invd_ref[:, k : k + 1] = inv
        yk = y_ref[:, k : k + 1] * inv
        y_ref[:] = y_ref[:] - c * yk
        y_ref[:, k : k + 1] = yk  # the update zeroed slot k; keep y_k there
        # rank-1 trailing update; the sublane-side factor is column k of s
        # (equal to row k by symmetry), masked to rows > k so the stored L
        # rows (written into dead rows below) are not touched.
        csub = s_ref[:, :, k : k + 1] * inv[:, :, None] * (
            jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) > k
        ).astype(f32)
        s_ref[:] = s_ref[:] - csub * c[:, None, :]
        s_ref[:, k, :] = c  # store L(:, k) into the dead row k

    # ---- backward substitution: Lᵀ x = y ----
    for k in range(n - 1, -1, -1):
        lrow = s_ref[:, k, :]  # (bt, n): entry j is L[j, k]
        acc = jnp.sum(
            lrow * x_ref[:] * (col > k).astype(f32), axis=-1, keepdims=True
        )
        x_ref[:, k : k + 1] = (y_ref[:, k : k + 1] - acc) * invd_ref[:, k : k + 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_pallas(a, damp, b, interpret: bool = False):
    """Solve (a + diag(damp)) x = b for a batch of SPD systems.

    a (B, n, n) f32 SPD; damp (B, n) ≥ 0; b (B, n). B is padded to a multiple
    of the batch tile internally; n must be a multiple of 8 (pad with identity
    rows/cols at the caller — psd_solve does this already)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, n, _ = a.shape
    bt = _BT
    pad = (-bsz) % bt
    if pad:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))], 0
        )
        damp = jnp.concatenate([damp, jnp.zeros((pad, n), damp.dtype)], 0)
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)], 0)
    bp = a.shape[0]

    x = pl.pallas_call(
        functools.partial(_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((bp, n), a.dtype),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, n), lambda i: (i, 0)),
            pl.BlockSpec((bt, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bt, n), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bt, n, n), jnp.float32),  # s: damped A → L
            pltpu.VMEM((bt, n), jnp.float32),     # y: forward-substituted rhs
            pltpu.VMEM((bt, n), jnp.float32),     # invd: 1/L_kk
        ],
        interpret=interpret,
    )(a, damp, b)
    return x[:bsz]
