"""Pallas TPU kernel for the batched damped-solve factorization.

Round-5 stage budget (benchmarks/bench_lm_stage_budget.py, v5e, B=2048,
n=160): the damped solve (math/linalg.psd_solve) costs 12.6 ms per LM
iteration where the bandwidth bound is <1 ms. The time is op-count overhead:
the unrolled 32-wide panel factorization alone is ~640 tiny XLA ops
(32 column steps × ~4 ops × 5 panels), each a separate HBM-round-trip kernel
on a (B, ≤32, 32) slab, plus the recursive triangular-inverse ops.

`_panel_cholinv_call` replaces that op-storm: per 32×32 diagonal panel, one
kernel computes Cholesky AND the triangular inverse in a **batch-in-lanes
layout** (32, 32, B) — every column/row step is a full-width (32, 128) VPU
op across 128 batch elements, so the serial column chain costs ~32 dependent
rsqrt latencies per 128 problems. This is deliberately different from the
two recorded kernel dead ends (ops/chol_pallas.py, docs/BENCHMARKS.md):
those ran batch-major (bt, n, n) tiles, where the rank-1 chain at n=160 is
VPU-flop-bound (full-square updates) and 32-wide panel math pays a 4×
lane-padding tax. Batch-in-lanes removes both: lanes are batch (no pad) and
the n³ syrk/l21 work stays OUT of the kernel, on the MXU via XLA batched
matmuls, which the budget shows are near-bound already.

Reference semantics: gauss_newton_solver.cpp:237-250 (Eigen::LLT per
problem); this is its TPU shape.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["factor_pallas", "psd_solve_pallas", "psd_solve_pallas_available"]

_PW = 32       # panel width (matches math/linalg._BLOCK)
_LANES = 128   # batch elements per panel-kernel grid step


def psd_solve_pallas_available(n: int, batch: int) -> bool:
    """TPU, panelizable n, and a batch that fills (or half-fills) the lane
    layout — 64-lane chunks still beat the XLA op-storm (the sequence
    solver's SPIKE locals run batched (parts=64, p, p) factorizations
    inside a scan)."""
    if jax.default_backend() != "tpu":
        return False
    return batch % 32 == 0 and batch >= 32 and n >= 64


# ---------------------------------------------------------------- panel kernel

def _panel_kernel(w, a_ref, inv_ref, l_scr):
    """Triangular INVERSE of the Cholesky factor of one (w, w, 128) panel
    batch — Linv is the only output the blocked solve ever reads (l21 comes
    from a21·Linvᵀ and the off-diagonal substitution blocks from l21), so L
    itself lives in scratch, keeping the kernel inside the 16 MB scoped-VMEM
    budget at w=64 (an earlier two-output variant OOM'd by 1.4 MB).

    Layout [i, j, b]: lanes are BATCH, so each of the w serial column steps
    is a (w, 128) full-width VPU op. The trailing matrix stays symmetric
    (full-square rank-1 downdate), so column j can be read as row j — no
    lane-strided access anywhere."""
    f32 = jnp.float32
    s = a_ref[...]  # (w, w, 128)
    # index masks built in-kernel (captured host constants are not allowed);
    # columns/rows are written straight into refs (value-level .at[].set
    # lowers to scatter, which Mosaic does not implement)
    ii = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    invs = []
    for j in range(w):
        col = s[:, j, :]  # (w, 128) == column j of the symmetric trailing
        inv = jax.lax.rsqrt(jnp.maximum(col[j:j + 1, :], 1e-30))  # (1, 128)
        c = col * inv * (ii >= j).astype(f32)
        invs.append(inv)
        l_scr[:, j, :] = c
        s = s - c[:, None, :] * c[None, :, :]

    # triangular inverse, rows forward: Linv[r, c] =
    #   (δ_rc − Σ_{k<r} L[r,k]·Linv[k,c]) / L[r,r].
    # the k-sum reads only the rows already built (static triangular slices
    # halve the VPU work vs a full-matrix sum).
    inv_ref[...] = jnp.zeros_like(s)
    for r in range(w):
        if r == 0:
            inv_ref[0, :, :] = (ii == 0).astype(f32) * invs[0]
            continue
        lr = l_scr[r, :r, :]  # (r, 128): L[r, k] over k < r
        acc = jnp.sum(lr[:, None, :] * inv_ref[:r, :, :], axis=0)  # (w, 128)
        inv_ref[r, :, :] = ((ii == r).astype(f32) - acc) * invs[r]


def _panel_cholinv_call(a_t: jnp.ndarray, interpret: bool = False):
    """a_t (w, w, B) → Linv_t, same layout. w ∈ {32, 64}."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w, _, b = a_t.shape
    # underfilled lanes waste VPU width but still beat the XLA op-storm —
    # the SPIKE sequence locals factor (parts=32, p, p) blocks inside a scan
    lanes = next(c for c in (_LANES, 64, 32) if b % c == 0)
    spec = pl.BlockSpec((w, w, lanes), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_panel_kernel, w),
        grid=(b // lanes,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a_t.shape, a_t.dtype),
        scratch_shapes=[pltpu.VMEM((w, w, lanes), jnp.float32)],
        interpret=interpret,
    )(a_t)


# ---------------------------------------------------------- substitution kernel

_SUB_BT = 16  # batch tile: VMEM = Σ panel blocks ≈ 4 MB at n=160


def _subst_kernel(widths, *refs):
    """Blocked L Lᵀ x = b with every factor block VMEM-resident: replaces
    ~30 HBM-round-trip XLA matvec ops with one kernel pass.

    refs = linv_0..linv_{nb-1} (bt, w_k, w_k), l21_0..l21_{nb-2}
    (bt, n − off_k − w_k, w_k) [the last panel has no sub-diagonal rows],
    b_0..b_{nb-1} (bt, w_k) [rhs pre-split per panel — avoids lane-dim
    slicing], then outputs x_0..x_{nb-1} (bt, w_k). Matvecs run as VPU
    multiply+reduce (32-64 wide; MXU setup isn't worth it at these
    shapes)."""
    nb = len(widths)
    offs = np.concatenate([[0], np.cumsum(widths)]).astype(int)
    linvs = [refs[k][...] for k in range(nb)]
    l21s = [refs[nb + k][...] for k in range(nb - 1)]
    bs = [refs[2 * nb - 1 + k][...] for k in range(nb)]
    outs = refs[3 * nb - 1:]

    def lblk(r, c):  # L block at panel-row r > panel-col c
        off = offs[r] - offs[c] - widths[c]
        return l21s[c][:, off:off + widths[r], :]

    def mv(m, v):  # (bt, a, b) @ (bt, b) -> (bt, a)
        return jnp.sum(m * v[:, None, :], axis=-1)

    def mv_t(m, v):  # mᵀ @ v contracting rows: (bt, a, b), (bt, a) -> (bt, b)
        return jnp.sum(m * v[:, :, None], axis=-2)

    ys = []
    for k in range(nb):
        rhs = bs[k]
        for j in range(k):
            rhs = rhs - mv(lblk(k, j), ys[j])
        ys.append(mv(linvs[k], rhs))
    xs = [None] * nb
    for k in reversed(range(nb)):
        rhs = ys[k]
        for j in range(k + 1, nb):
            rhs = rhs - mv_t(lblk(j, k), xs[j])
        xs[k] = mv_t(linvs[k], rhs)
    for k in range(nb):
        outs[k][...] = xs[k]


def _subst_call(linvs, l21s, widths, b, interpret: bool = False):
    """b (B, n) → x (B, n) from mixed-width panel factors."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, n = b.shape
    nb = len(widths)
    offs = np.concatenate([[0], np.cumsum(widths)]).astype(int)
    bt = _SUB_BT if batch % _SUB_BT == 0 else _LANES

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((bt,) + shape,
                            (lambda i: (i, 0, 0)) if nd == 2 else
                            (lambda i: (i, 0)),
                            memory_space=pltpu.VMEM)

    in_specs = ([bspec((int(w), int(w))) for w in widths]
                + [bspec((int(n - offs[k + 1]), int(widths[k])))
                   for k in range(nb - 1)]
                + [bspec((int(w),)) for w in widths])
    out_specs = tuple(bspec((int(w),)) for w in widths)
    b_split = [b[:, offs[k]:offs[k + 1]] for k in range(nb)]
    xs = pl.pallas_call(
        functools.partial(_subst_kernel, [int(w) for w in widths]),
        grid=(batch // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(jax.ShapeDtypeStruct((batch, int(w)), b.dtype)
                        for w in widths),
        interpret=interpret,
    )(*linvs, *l21s[:-1], *b_split)
    return jnp.concatenate(xs, axis=-1)


# ----------------------------------------------------------------- driver

def _panel_widths(n: int) -> list:
    """64-wide super-panels + a 32 remainder: wider panels quarter the
    trailing-update slices/ops and cut their HBM traffic ~5× at n=160
    (Σ m² over trailing levels: 56320·B·8 bytes at w=32 vs 10240 at w=64)."""
    w64 = int(__import__("os").environ.get("MOMENTUM_TPU_PSD_PW", 64))
    widths = []
    rem = n
    while rem >= w64:
        widths.append(w64)
        rem -= w64
    while rem >= _PW:
        widths.append(_PW)
        rem -= _PW
    if rem:  # n is a multiple of 8 (pad guarantees 32); ragged tail panel
        widths.append(rem)
    return widths


def factor_pallas(a: jnp.ndarray, interpret: bool = False):
    """Blocked right-looking Cholesky of SPD a (B, n, n), n % 32 == 0.

    Returns (linvs, l21s, widths): per panel, the INVERSE of the diagonal
    Cholesky block (B, w, w) and the sub-diagonal column panel
    (B, n − off − w, w) of L — one fused Pallas chol+inv kernel + two MXU
    matmuls in XLA per panel. (The diagonal block itself is never read by
    the blocked substitutions, so it is not materialized.)"""
    n = a.shape[-1]
    widths = _panel_widths(n)
    mm = jnp.matmul
    l21s = []
    linvs = []
    trail = a
    for w in widths:
        dkk_t = jnp.transpose(trail[..., :w, :w], (1, 2, 0))
        linv_t = _panel_cholinv_call(dkk_t, interpret=interpret)
        linv = jnp.transpose(linv_t, (2, 0, 1))
        a21 = trail[..., w:, :w]
        l21 = mm(a21, jnp.swapaxes(linv, -1, -2))
        l21s.append(l21)
        linvs.append(linv)
        a22 = trail[..., w:, w:]
        trail = a22 - mm(l21, jnp.swapaxes(l21, -1, -2))
    return linvs, l21s, widths


def _solve_panels(linvs, l21s, widths, rhs):
    """Blocked L Lᵀ x = rhs from mixed-width panel factors (the mixed-width
    generalization of math/linalg blocked_cholesky_solve)."""
    mm = jnp.matmul
    nb = len(widths)
    offs = np.concatenate([[0], np.cumsum(widths)]).astype(int)

    def lblk(r, c):  # L block at panel-row r > panel-col c
        off = offs[r] - offs[c] - widths[c]
        return l21s[c][..., off:off + widths[r], :]

    ys = []
    for k in range(nb):
        b_k = rhs[..., offs[k]:offs[k + 1], :]
        for j in range(k):
            b_k = b_k - mm(lblk(k, j), ys[j])
        ys.append(mm(linvs[k], b_k))
    xs = [None] * nb
    for k in reversed(range(nb)):
        r = ys[k]
        for j in range(k + 1, nb):
            r = r - mm(jnp.swapaxes(lblk(j, k), -1, -2), xs[j])
        xs[k] = mm(jnp.swapaxes(linvs[k], -1, -2), r)
    return jnp.concatenate(xs, axis=-2)


def psd_solve_pallas(a: jnp.ndarray, b: jnp.ndarray,
                     damp_diag: jnp.ndarray | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Drop-in psd_solve for (B, n, n) SPD `a`, rhs (B, n) or (B, n, k).

    Caller guarantees psd_solve_pallas_available(n, B). n pads to a
    32-multiple with an identity block (same embedding as math/linalg).
    damp_diag (B, n) optionally adds per-element diagonal damping — folded
    into the pad copy, so the LM damping costs no extra HBM pass."""
    import os as _os

    vec = b.ndim == a.ndim - 1
    rhs = b[..., None] if vec else b
    n = a.shape[-1]
    # no-pad mode: skip the (B, n→n32, n→n32) embedding copy entirely and
    # let the LAST panel be ragged (Mosaic masks sub-tile block shapes);
    # the damping add then fuses into the panel slices instead of the copy
    pad = 0 if _os.environ.get("MOMENTUM_TPU_PSD_NOPAD", "0") != "0" \
        else (-n) % _PW
    if damp_diag is not None:
        eye = jnp.eye(n, dtype=a.dtype)
        a = a + damp_diag[..., None] * eye  # fuses into the pad copy below
    if pad:
        bsz = a.shape[0]
        ap = jnp.zeros((bsz, n + pad, n + pad), a.dtype)
        ap = ap.at[:, :n, :n].set(a)
        idx = jnp.arange(n, n + pad)
        a = ap.at[:, idx, idx].set(1.0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((bsz, pad) + rhs.shape[-1:], rhs.dtype)], axis=-2)
    linvs, l21s, widths = factor_pallas(a, interpret=interpret)
    # vector rhs goes through the fused substitution kernel; matrix rhs
    # (rare in the solver) keeps the XLA blocked path
    use_kernel = (vec and rhs.shape[-1] == 1
                  and _os.environ.get(
                      "MOMENTUM_TPU_PSD_SUBST_PALLAS", "1") != "0")
    if use_kernel:
        x = _subst_call(linvs, l21s, widths, rhs[..., 0],
                        interpret=interpret)[..., None]
    else:
        x = _solve_panels(linvs, l21s, widths, rhs)
    x = x[..., :n, :]
    return x[..., 0] if vec else x
