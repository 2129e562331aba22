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

__all__ = [
    "chol_solve_pallas",
    "chol_solve_pallas_available",
    "chol_solve_pallas_blocked",
]

_BT = 8  # batch tile: systems factorized per grid step
_BTB = 16  # batch tile for the blocked kernel (VMEM: 2·bt·n²·4B)
_PW = 32  # panel width of the blocked kernel


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


def _kernel_blocked(a_ref, damp_ref, b_ref, x_ref, s_ref, y_ref, invd_ref,
                    *, n: int, pw: int):
    """Blocked right-looking factor + substitutions, one batch tile resident
    in VMEM. The first rank-1 attempt above touches the FULL (bt, n, n)
    trailing matrix on every one of the n column steps — n·bt·n² VMEM
    traffic — and measured VMEM-bandwidth/issue bound (23.5 ms vs 13.3 ms
    for the XLA blocked path at B=2048, n=160). This variant confines the
    column steps to a 32-wide panel and applies the trailing update once
    per panel as a batched MXU contraction: VMEM traffic drops ~w-fold on
    the serial part and the bulk FLOPs ride the MXU."""
    f32 = jnp.float32
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(f32)
    s_ref[:] = a_ref[:] + damp_ref[:][:, None, :] * eye[None]

    npanels = n // pw
    for p in range(npanels):
        r0 = p * pw  # panel top row / first column
        m = n - r0  # panel height (rows r0..n)
        # ---- unblocked panel factorization (dpotf2 over all m rows) ----
        for kk in range(pw):
            k = r0 + kk
            d = s_ref[:, k, k:k + 1]  # (bt, 1)
            inv = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
            invd_ref[:, k:k + 1] = inv
            colk = s_ref[:, r0:, k:k + 1] * inv[:, :, None]  # (bt, m, 1)
            # zero above the diagonal (rows r0..k-1 hold stale A values)
            rowmask = (jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
                       >= kk).astype(f32)
            colk = colk * rowmask
            s_ref[:, r0:, k:k + 1] = colk
            if kk + 1 < pw:
                # rank-1 update confined to the remaining panel columns
                lrow = colk[:, kk + 1:pw, 0]  # (bt, pw-kk-1) = L[k+1..,k]
                s_ref[:, r0:, k + 1:r0 + pw] = (
                    s_ref[:, r0:, k + 1:r0 + pw]
                    - colk * lrow[:, None, :])
        # ---- trailing update on the MXU: T -= L21 · L21ᵀ (full square) ----
        if r0 + pw < n:
            l21 = s_ref[:, r0 + pw:, r0:r0 + pw]  # (bt, m-pw, pw)
            upd = jax.lax.dot_general(
                l21, l21,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32)
            s_ref[:, r0 + pw:, r0 + pw:] = s_ref[:, r0 + pw:, r0 + pw:] - upd

    # ---- forward substitution: y = L⁻¹ b (row reads, lane-contiguous) ----
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    y_ref[:] = b_ref[:]
    for k in range(n):
        lrow = s_ref[:, k, :]  # (bt, n); cols < k hold L[k, :k]
        acc = jnp.sum(lrow * y_ref[:] * (col < k).astype(f32),
                      axis=-1, keepdims=True)
        y_ref[:, k:k + 1] = (b_ref[:, k:k + 1] - acc) * invd_ref[:, k:k + 1]
    # ---- backward substitution: Lᵀ x = y (column k of L = s[:, k:, k]) ----
    x_ref[:] = jnp.zeros_like(x_ref)
    for k in range(n - 1, -1, -1):
        lcol = s_ref[:, :, k]  # (bt, n): rows > k hold L[j, k]
        acc = jnp.sum(lcol * x_ref[:] * (col > k).astype(f32),
                      axis=-1, keepdims=True)
        x_ref[:, k:k + 1] = (y_ref[:, k:k + 1] - acc) * invd_ref[:, k:k + 1]


@functools.partial(jax.jit, static_argnames=("interpret", "bt"))
def chol_solve_pallas_blocked(a, damp, b, interpret: bool = False,
                              bt: int = _BTB):
    """Blocked-panel variant of chol_solve_pallas: solve
    (a + diag(damp)) x = b for a batch of SPD systems, n % 32 == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, n, _ = a.shape
    pad = (-bsz) % bt
    if pad:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))], 0
        )
        damp = jnp.concatenate([damp, jnp.zeros((pad, n), damp.dtype)], 0)
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)], 0)
    bp = a.shape[0]

    x = pl.pallas_call(
        functools.partial(_kernel_blocked, n=n, pw=_PW),
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
            pltpu.VMEM((bt, n), jnp.float32),     # y
            pltpu.VMEM((bt, n), jnp.float32),     # invd
        ],
        interpret=interpret,
    )(a, damp, b)
    return x[:bsz]


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
