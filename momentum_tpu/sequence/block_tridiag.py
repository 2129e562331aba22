"""Structured linear algebra for sequence solves.

The reference factors the band-plus-arrowhead GN system with a streaming
Householder QR (math/online_householder_qr.h:369-410) whose sequential
column elimination is the wrong shape for TPU. The TPU-native equivalent
(SURVEY.md §2.9/§7.8) solves the block-banded *normal equations* directly —
the precedent is SequenceCholeskySolverT (sequence_cholesky_solver.h:20-60),
which also forms banded normal equations.

Pieces:
  * block_tridiag_solve — measured dispatch: SPIKE-partitioned solve for
    long sequences (K batched local Thomas scans + small interface system),
    the sequential scan for short ones; cyclic reduction available but
    measured slower (see docs/BENCHMARKS.md).
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

__all__ = ["block_tridiag_solve", "block_tridiag_solve_thomas",
           "block_tridiag_solve_cr", "block_tridiag_solve_partitioned",
           "banded_to_tridiag", "schur_arrowhead_solve"]

# Cyclic reduction is DISABLED by default: sync-timed on v5e it loses to the
# Thomas scan at every tested shape (F=2048/p=160: 2.08 s vs 0.80 s;
# F=10000/p=24: 1.35 s vs 0.18 s). The log2(F) levels each re-stream the
# full (F, p, p) block arrays through HBM — ~log F times the memory traffic
# of the scan, and the problem is bandwidth-bound, not latency-bound. Kept
# (correct + tested) for future hardware; opt in via the env var.
_CR_MIN_FRAMES = int(__import__("os").environ.get(
    "MOMENTUM_TPU_CR_MIN_FRAMES", str(1 << 30)))
# SPIKE partitioning: batched local Thomas scans + small interface system.
# Sync-timed v5e F=2048/p=160: 778 ms scan → 134 (K=32) → 105 (K=64) →
# 127 (K=128); F=10000/p=24: 157 → 77 ms. Knee at 32-frame chunks.
_SPIKE_MIN_FRAMES = int(__import__("os").environ.get(
    "MOMENTUM_TPU_SPIKE_MIN_FRAMES", "128"))
_SPIKE_PARTS = int(__import__("os").environ.get(
    "MOMENTUM_TPU_SPIKE_PARTS", "64"))
# minimum frames of serial work per chunk; smaller chunks = more parts =
# fuller lanes in the batched per-step factorization + a shorter scan, at
# the cost of a larger interface system (round-5 sweep on the full-body
# p=160 rig with Pallas-batched locals: chunk 16 → 1,801 frames/s LOSES to
# chunk 32 → 2,221 — the 2p interface growth wins; 32 stays the default)
_SPIKE_CHUNK = int(__import__("os").environ.get(
    "MOMENTUM_TPU_SPIKE_CHUNK", "32"))


def _chol_solve(a, b):
    return psd_solve(a, b)


def block_tridiag_solve(diag: jnp.ndarray, upper: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve a symmetric positive-definite block-tridiagonal system.

    diag:  (F, p, p)   diagonal blocks A_f
    upper: (F-1, p, p) super-diagonal blocks B_f = H[f, f+1] (so H[f+1, f] = B_fᵀ)
    rhs:   (F, p, k)
    Returns x (F, p, k).

    Dispatch (measured on v5e, see docs/BENCHMARKS.md): SPIKE partitioning
    for F ≥ 128 (5.8× the scan at F=2048/p=160), the sequential Thomas scan
    below it; cyclic reduction only if MOMENTUM_TPU_CR_MIN_FRAMES opts in.
    K is capped so each chunk keeps ≥ 64 frames of serial work.
    """
    f = diag.shape[0]
    if f >= _CR_MIN_FRAMES:
        return block_tridiag_solve_cr(diag, upper, rhs)
    if f >= _SPIKE_MIN_FRAMES:
        parts = min(_SPIKE_PARTS, max(2, f // _SPIKE_CHUNK))
        return block_tridiag_solve_partitioned(diag, upper, rhs, parts)
    return block_tridiag_solve_thomas(diag, upper, rhs)


def block_tridiag_solve_thomas(diag: jnp.ndarray, upper: jnp.ndarray,
                               rhs: jnp.ndarray) -> jnp.ndarray:
    """Block Thomas algorithm: forward Schur elimination then
    back-substitution, both as lax.scan (sequential over frames; each step
    is dense p×p work)."""
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


def _block_tridiag_solve_thomas_batched(diag, upper, rhs):
    """Batched block Thomas: diag (K, F, p, p), upper (K, F−1, p, p),
    rhs (K, F, p, k) → x (K, F, p, k).

    Same math as block_tridiag_solve_thomas with the chunk axis batched
    through every step, so each per-step factorization is a (K, p, p)
    BATCHED psd_solve. This matters on TPU: under jax.vmap the trace-level
    shapes are unbatched and psd_solve's batched Pallas fast path
    (ops/psd_pallas.py) can never dispatch — scanning with explicit batch
    dims lets the SPIKE locals ride the same kernel as the IK solver
    (round-5; see docs/BENCHMARKS.md)."""
    kb, f, p, _ = diag.shape
    if f == 1:
        return _chol_solve(diag[:, 0], rhs[:, 0])[:, None]
    d_m = jnp.moveaxis(diag, 1, 0)   # (F, K, p, p)
    u_m = jnp.moveaxis(upper, 1, 0)
    r_m = jnp.moveaxis(rhs, 1, 0)

    def fwd(carry, inp):
        s_prev, y_prev = carry
        a_f, b_prev, r_f = inp
        w = _chol_solve(s_prev, jnp.concatenate([b_prev, y_prev], axis=-1))
        btp = jnp.swapaxes(b_prev, -1, -2)
        s_f = a_f - btp @ w[..., :p]
        y_f = r_f - btp @ w[..., p:]
        return (s_f, y_f), (s_f, y_f)

    (s_last, y_last), (s_rest, y_rest) = jax.lax.scan(
        fwd, (d_m[0], r_m[0]), (d_m[1:], u_m, r_m[1:]))
    s_all = jnp.concatenate([d_m[:1], s_rest], axis=0)
    y_all = jnp.concatenate([r_m[:1], y_rest], axis=0)
    x_last = _chol_solve(s_last, y_last)

    def bwd(x_next, inp):
        s_f, y_f, b_f = inp
        x_f = _chol_solve(s_f, y_f - b_f @ x_next)
        return x_f, x_f

    _, x_rest = jax.lax.scan(
        bwd, x_last, (s_all[:-1], y_all[:-1], u_m), reverse=True)
    x = jnp.concatenate([x_rest, x_last[None]], axis=0)  # (F, K, p, k)
    return jnp.moveaxis(x, 0, 1)


def block_tridiag_solve_cr(diag: jnp.ndarray, upper: jnp.ndarray,
                           rhs: jnp.ndarray) -> jnp.ndarray:
    """Cyclic-reduction solve of the same SPD block-tridiagonal system as
    `block_tridiag_solve` — the TPU-parallel formulation.

    Block Thomas is a length-F sequential scan: F dependent p×p
    factorizations, none batched (measured: the full-body sequence solve is
    bound by it at ~320 frames/s). Cyclic reduction eliminates all ODD block
    rows simultaneously — one BATCHED psd_solve + a few batched matmuls per
    level — and recurses on the even half: log2(F) levels, each one device
    program over F/2^k frames. ~2× the FLOPs of Thomas, ~F/log F times the
    parallelism. Schur complements of an SPD matrix stay SPD, so every level
    keeps the Cholesky fast path.

    Row o (odd):  U[o-1]ᵀ x_{o-1} + D_o x_o + U[o] x_{o+1} = b_o
    eliminates into even rows e = o ± 1:
      D'_e −= U[e-1]ᵀ D_{e-1}⁻¹ U[e-1] + U[e] D_{e+1}⁻¹ U[e]ᵀ
      U'_(e→e+2) = −U[e] D_{e+1}⁻¹ U[e+1]
      b'_e −= U[e-1]ᵀ D_{e-1}⁻¹ b_{e-1} + U[e] D_{e+1}⁻¹ b_{e+1}
    """
    f = diag.shape[0]
    p = diag.shape[-1]
    if f == 1:
        return _chol_solve(diag[0], rhs[0])[None]
    if f == 2:
        h = jnp.concatenate([
            jnp.concatenate([diag[0], upper[0]], axis=-1),
            jnp.concatenate([upper[0].T, diag[1]], axis=-1)], axis=-2)
        x = _chol_solve(h, jnp.concatenate([rhs[0], rhs[1]], axis=-2))
        return jnp.stack([x[:p], x[p:]])

    if f % 2:
        eye = jnp.broadcast_to(jnp.eye(p, dtype=diag.dtype), (1, p, p))
        diag = jnp.concatenate([diag, eye], axis=0)
        upper = jnp.concatenate(
            [upper, jnp.zeros((1, p, p), diag.dtype)], axis=0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((1,) + rhs.shape[1:], rhs.dtype)], axis=0)
        return block_tridiag_solve_cr(diag, upper, rhs)[:f]

    k = rhs.shape[-1]
    d_e, d_o = diag[0::2], diag[1::2]  # (ne, p, p), (no, p, p); ne == no
    up = jnp.concatenate([upper, jnp.zeros((1, p, p), diag.dtype)], axis=0)
    a = up[0::2]  # A[m] = U[2m]   couples even m → odd m
    b = up[1::2]  # B[m] = U[2m+1] couples odd m → even m+1 (zero for last)

    at = jnp.swapaxes(a, -1, -2)
    # one batched solve against all odd diagonals: D_o⁻¹ [Aᵀ | B | b_o]
    stacked = jnp.concatenate([at, b, rhs[1::2]], axis=-1)
    s = psd_solve(d_o, stacked)
    s1 = s[..., :p]          # D⁻¹Aᵀ
    s2 = s[..., p:2 * p]     # D⁻¹B
    s3 = s[..., 2 * p:]      # D⁻¹b_o

    mm = jnp.matmul
    term1 = mm(a, s1)                      # A D⁻¹ Aᵀ  → even m
    term2 = mm(jnp.swapaxes(b, -1, -2), s2)  # Bᵀ D⁻¹ B → even m+1
    d_red = d_e - term1
    d_red = d_red.at[1:].add(-term2[:-1])
    u_red = -mm(a, s2)[:-1]                # couples even m → even m+1
    r_e = rhs[0::2] - mm(a, s3)
    r_e = r_e.at[1:].add(-mm(jnp.swapaxes(b, -1, -2), s3)[:-1])

    x_e = block_tridiag_solve_cr(d_red, u_red, r_e)

    x_e_next = jnp.concatenate(
        [x_e[1:], jnp.zeros((1, p, k), x_e.dtype)], axis=0)
    x_o = s3 - mm(s1, x_e) - mm(s2, x_e_next)

    out = jnp.zeros((f, p, k), x_e.dtype)
    out = out.at[0::2].set(x_e)
    out = out.at[1::2].set(x_o)
    return out


def _block_tridiag_solve_lu(diag, lower, upper, rhs):
    """General (nonsymmetric) block-tridiagonal LU-Thomas solve.
    diag (G, n, n); lower (G-1, n, n) = H[s, s-1]; upper (G-1, n, n) =
    H[s, s+1]; rhs (G, n, k). Small G — used for SPIKE interface systems."""
    g_count = diag.shape[0]
    if g_count == 1:
        return jnp.linalg.solve(diag[0], rhs[0])[None]

    def fwd(carry, inp):
        s_prev, y_prev = carry
        d_s, l_s, u_prev, b_s = inp
        w = jnp.linalg.solve(s_prev, jnp.concatenate([u_prev, y_prev], -1))
        n = u_prev.shape[-1]
        s_s = d_s - l_s @ w[:, :n]
        y_s = b_s - l_s @ w[:, n:]
        return (s_s, y_s), (s_s, y_s)

    (s_last, y_last), (s_rest, y_rest) = jax.lax.scan(
        fwd, (diag[0], rhs[0]), (diag[1:], lower, upper, rhs[1:]))
    s_all = jnp.concatenate([diag[:1], s_rest], axis=0)
    y_all = jnp.concatenate([rhs[:1], y_rest], axis=0)
    x_last = jnp.linalg.solve(s_last, y_last)

    def bwd(x_next, inp):
        s_s, y_s, u_s = inp
        x_s = jnp.linalg.solve(s_s, y_s - u_s @ x_next)
        return x_s, x_s

    _, x_rest = jax.lax.scan(bwd, x_last,
                             (s_all[:-1], y_all[:-1], upper), reverse=True)
    return jnp.concatenate([x_rest, x_last[None]], axis=0)


def block_tridiag_solve_partitioned(diag: jnp.ndarray, upper: jnp.ndarray,
                                    rhs: jnp.ndarray,
                                    partitions: int = 8) -> jnp.ndarray:
    """SPIKE-partitioned solve of the SPD block-tridiagonal system — the
    single-device parallel formulation (same substructuring as the
    multi-chip sharded path, sequence/sharded.py, with vmap standing in for
    the device axis).

    Splits the F frames into K chunks; each chunk runs the Thomas scan
    LOCALLY and BATCHED (vmap over chunks) against [rhs | left-spike |
    right-spike] columns, then a small nonsymmetric interface system over
    the 2K chunk-boundary unknowns couples them. Work ≈ 3× Thomas on the
    locals + O(K·(2p)³) interface, wall-clock ≈ Thomas/K: unlike cyclic
    reduction this keeps ONE pass over HBM, so it wins where CR lost.

    Chunk s, local row x = g − V·x_{s-1,last} − W·x_{s+1,first} with
      g = T_s⁻¹ b,  V = T_s⁻¹(e_0 ⊗ C_leftᵀ),  W = T_s⁻¹(e_{M-1} ⊗ C_right)
    (C_left = upper[sM−1], C_right = upper[(s+1)M−1]).
    """
    f = diag.shape[0]
    p = diag.shape[-1]
    k = rhs.shape[-1]
    kp = int(partitions)
    if kp <= 1 or f < 2 * kp:
        return block_tridiag_solve_thomas(diag, upper, rhs)
    m = -(-f // kp)  # chunk length
    pad = kp * m - f
    if pad:
        eye = jnp.broadcast_to(jnp.eye(p, dtype=diag.dtype), (pad, p, p))
        diag = jnp.concatenate([diag, eye], axis=0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((pad, p, k), rhs.dtype)], axis=0)
    up_pad = jnp.concatenate(
        [upper, jnp.zeros((pad + 1, p, p), diag.dtype)], axis=0)

    dd = diag.reshape(kp, m, p, p)
    uu_full = up_pad.reshape(kp, m, p, p)
    uu = uu_full[:, :m - 1]
    c_right = uu_full[:, m - 1]  # (K, p, p); last is zero
    c_left = jnp.concatenate(
        [jnp.zeros((1, p, p), diag.dtype), c_right[:-1]], axis=0)

    big = jnp.zeros((kp, m, p, k + 2 * p), rhs.dtype)
    big = big.at[:, :, :, :k].set(rhs.reshape(kp, m, p, k))
    big = big.at[:, 0, :, k:k + p].set(jnp.swapaxes(c_left, -1, -2))
    big = big.at[:, m - 1, :, k + p:].set(c_right)

    sol = _block_tridiag_solve_thomas_batched(dd, uu, big)
    g = sol[..., :k]            # (K, M, p, k)
    v = sol[..., k:k + p]       # left spikes
    w = sol[..., k + p:]        # right spikes

    # interface system over z_s = [x_{s,first}; x_{s,last}] (2p each)
    two_p = 2 * p
    d_int = jnp.broadcast_to(jnp.eye(two_p, dtype=diag.dtype),
                             (kp, two_p, two_p))
    lower = jnp.zeros((kp - 1, two_p, two_p), diag.dtype)
    upper_i = jnp.zeros((kp - 1, two_p, two_p), diag.dtype)
    # L_s couples z_{s-1}: columns of x_{s-1,last} (second half)
    lower = lower.at[:, :p, p:].set(v[1:, 0])
    lower = lower.at[:, p:, p:].set(v[1:, m - 1])
    # U_s couples z_{s+1}: columns of x_{s+1,first} (first half)
    upper_i = upper_i.at[:, :p, :p].set(w[:-1, 0])
    upper_i = upper_i.at[:, p:, :p].set(w[:-1, m - 1])
    rhs_int = jnp.concatenate([g[:, 0], g[:, m - 1]], axis=1)  # (K, 2p, k)

    z = _block_tridiag_solve_lu(d_int, lower, upper_i, rhs_int)  # (K, 2p, k)
    xf = z[:, :p]  # x_{s,first}
    xl = z[:, p:]  # x_{s,last}

    xl_prev = jnp.concatenate(
        [jnp.zeros((1, p, k), z.dtype), xl[:-1]], axis=0)
    xf_next = jnp.concatenate(
        [xf[1:], jnp.zeros((1, p, k), z.dtype)], axis=0)
    x = g - jnp.einsum("smpq,sqk->smpk", v, xl_prev) \
        - jnp.einsum("smpq,sqk->smpk", w, xf_next)
    return x.reshape(kp * m, p, k)[:f]


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
