"""Gauss-Newton and Levenberg-Marquardt solvers as fused jitted loops.

Reference semantics:
  * Solve loop / convergence — momentum/solver/solver.cpp:86-121: iterate
    doIteration() (which evaluates the error at the *pre-step* parameters and
    then applies the step), then stop once
    |lastError − error| / (|error| + FLT_MIN) ≤ threshold · FLT_EPSILON
    after minIterations. Note the reference applies the final step even on the
    converged iteration; we match that.
  * GN step — momentum/solver/gauss_newton_solver.cpp:224-262: JᵀJ with
    `regularization` added to the diagonal (default 0.05,
    gauss_newton_solver.h:22), Cholesky solve, params -= delta. Optional
    backtracking line search (off by default, gauss_newton_solver.h:25).
  * Parameter subsets — the reference compacts enabled columns
    (subset_gauss_newton_solver.h); here disabled parameters are masked:
    their Jacobian columns are zeroed, the diagonal regularizer keeps JᵀJ
    SPD, and their delta is exactly 0 — same optimum, static shapes.
  * LM — TPU-native equivalent of TrustRegionQRT (trust_region_qr.cpp):
    classic gain-ratio λ adaptation (accept & shrink λ on decrease, reject &
    grow λ otherwise) instead of the reference's trust-radius Newton-on-λ;
    both converge to the same stationary points.

Everything runs under `lax.while_loop` with static shapes, so a full solve is
ONE XLA computation: vmap over a batch of problems gives batched IK, and all
linear algebra is MXU work. The Jacobian comes from `jax.linearize` + a
vmapped JVP over the P-dim identity — XLA batches the tangents through FK as
dense matmuls, replacing the reference's hand-written chain-rule walk
(skeleton_derivative.cpp).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from momentum_tpu.math.linalg import damped_psd_solve, psd_solve

__all__ = ["SolverOptions", "SolveResult", "solve_gauss_newton",
           "solve_gauss_newton_cg", "solve_levenberg_marquardt",
           "solve_gradient_descent"]

_FLT_EPS = float(jnp.finfo(jnp.float32).eps)
_FLT_MIN = float(jnp.finfo(jnp.float32).tiny)


def _jtj_precision():
    """Matmul precision for the JᵀJ/Jᵀr contractions only (residuals and
    Jacobian assembly keep the package-wide `highest`). The normal matrix
    feeds a λ-damped factorization, so 3-pass bf16 ("high") noise is
    absorbed by the damping — A/B'd on the driver bench before defaulting
    (docs/BENCHMARKS.md round 5). MOMENTUM_TPU_JTJ_PRECISION ∈
    {highest, high, default}."""
    import os

    name = os.environ.get("MOMENTUM_TPU_JTJ_PRECISION", "highest")
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[name]


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    """Static solver configuration (solver.h:19-34 + gauss_newton_solver.h:17-30)."""

    min_iterations: int = 1
    max_iterations: int = 50
    threshold: float = 1.0
    # per-iteration error logging via jax.debug.print (solver.h:30 verbose)
    verbose: bool = False
    regularization: float = 0.05
    do_line_search: bool = False
    line_search_steps: int = 10
    # LM only:
    lambda_init: float = 0.01
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    lambda_min: float = 1e-10
    lambda_max: float = 1e8
    # Use Σ rows² (the GN surrogate, exact for L2 losses) as the energy for
    # convergence/acceptance instead of calling error_fn — saves one full
    # FK+residual evaluation per iteration. The reference always evaluates
    # the true robust energy; enable only when losses are L2.
    energy_from_residual: bool = False
    # Capture per-iteration (error, params) into SolveResult.history
    # (solver.h:72-77 setStoreHistory). Costs a (maxIter, P) buffer.
    store_history: bool = False
    # LM only: carry (rows, J) across iterations so each iteration does one
    # fused residual+Jacobian eval instead of jac + residual. Only pays off
    # when J is small; measured slower for the full-body rig (see LM note).
    carry_jacobian: bool = False
    # "cholesky": normal equations + blocked Cholesky (fastest on TPU).
    # "qr": damped least-squares via QR of [J; sqrt(λ)·I] — the reference's
    # GaussNewtonSolverQRT/TrustRegionQRT factorization (gauss_newton_solver_
    # qr.h, online_householder_qr.h): half the condition number exposure of
    # the normal equations, for ill-conditioned rigs.
    # "cg": matrix-free conjugate gradients on (JᵀJ + damp·I) — the
    # high-dimensional analog of SparseGaussNewtonSolverT
    # (gauss_newton_solver_sparse.h:50-90, sparse JᵀJ + SimplicialLLT): at
    # P ≳ 500 (big blendshape rigs; kMaxModelParams=2048, math/types.h:425)
    # the dense P×P factorization is O(P³) and HBM-heavy, while CG needs only
    # JVP/VJP sweeps of the residual graph — never materializing J or JᵀJ.
    linear_solver: str = "cholesky"
    # CG path only: inner-iteration cap and relative-residual stop.
    cg_iterations: int = 64
    cg_tol: float = 1e-6
    # Sequence solver only: accumulate the block normal equations in float64
    # and solve in float32 — the reference's long-sequence conditioning
    # guardrail (sequence_cholesky_solver.h:31-33
    # useDoublePrecisionNormalEquations). Requires jax x64 to be enabled
    # (jax.enable_x64() or the jax_enable_x64 flag); silently
    # equivalent to f32 otherwise.
    f64_normal_equations: bool = False
    # Sequence solver only: override the equilibrated-band diagonal jitter
    # (None → sequence.solver._EQUILIBRATED_JITTER, 1e-7 — the PD-roundoff
    # default). Smoothing-dominated whole-sequence objectives (refine) carry
    # genuinely near-null directions at ~1e-7 relative curvature (measured:
    # the block-Thomas recursion pivots on the real-clip refine system have
    # min-eig 1.05e-7 at frame 0, drifting to −7e-8 by frame 83 → f32
    # Cholesky NaN); such solves should pass ~1e-5 as LM-style damping.
    equilibrated_jitter: Optional[float] = None


class SolveResult(NamedTuple):
    params: jnp.ndarray
    error: jnp.ndarray  # final energy (at the pre-step params of the last iteration)
    iterations: jnp.ndarray
    converged: jnp.ndarray
    # (maxIter,[...]) error / (maxIter, ..., P) parameter trajectories when
    # SolverOptions.store_history (solver.h:90-92); None otherwise
    error_history: Optional[jnp.ndarray] = None
    param_history: Optional[jnp.ndarray] = None
    # LM only: per-element damping state at exit, so a follow-up solve can
    # resume exactly where this one stopped (pass as `lambda0`) — used by
    # the compacted tail-refinement path (solver/compaction.py)
    lambda_final: Optional[jnp.ndarray] = None


def _jacobian(residual_fn: Callable, x: jnp.ndarray, jacobian_fn=None):
    """(rows, Jᵀ) with Jᵀ (..., P, R). Uses an analytic (rows, J) provider
    when given, else one linearize + vmapped JVP over the parameter basis;
    both support leading batch dims (the batch-native path)."""
    if jacobian_fn is not None:
        rows, j = jacobian_fn(x)
        return rows, jnp.swapaxes(j, -1, -2)
    rows, jvp = jax.linearize(residual_fn, x)
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)
    if x.ndim > 1:
        # batched primal: tangent e_p broadcast across the batch; the JVP is
        # linear, so the broadcast tangent yields every element's column p
        jt = jax.vmap(lambda e: jvp(jnp.broadcast_to(e, x.shape)))(eye)
        return rows, jnp.moveaxis(jt, 0, -2)  # (..., P, R)
    jt = jax.vmap(jvp)(eye)  # row p = J @ e_p = column p of J
    return rows, jt


def _converged(last_err, err, threshold):
    return jnp.abs(last_err - err) / (jnp.abs(err) + _FLT_MIN) <= threshold * _FLT_EPS


def _line_search(error_fn, x, delta, err0, steps):
    """Backtracking halving search: largest alpha in {1, .5, .25, ...} that
    decreases the energy; falls back to full step if none does (matching the
    reference's simple decrease criterion, gauss_newton_solver.cpp line-search
    path). Batch-native: err0/alpha carry the leading batch dims of x — each
    element picks its own step length via masked selects, the TPU equivalent
    of the reference's per-problem scalar loop."""
    scale = (lambda a: a[..., None] * delta) if x.ndim > err0.ndim else \
        (lambda a: a * delta)

    def body(carry, _):
        alpha, best_alpha, found = carry
        e = error_fn(x - scale(alpha))
        good = (e < err0) & (~found)
        best_alpha = jnp.where(good, alpha, best_alpha)
        found = found | good
        return (alpha * 0.5, best_alpha, found), None

    (_, best_alpha, found), _ = jax.lax.scan(
        body, (jnp.ones_like(err0), jnp.ones_like(err0), jnp.zeros_like(err0, bool)),
        None, length=steps,
    )
    return jnp.where(found, best_alpha, 1.0)


def _qr_step(jt, rows, damp_diag, mask):
    """δ = argmin ‖J δ − r‖² + ‖√damp·δ‖² via QR of the damped stack.

    jt (..., P, R); rows (..., R); damp_diag (..., P) per-parameter damping.
    Equivalent step to the Cholesky path but factorizes J itself (condition
    number √κ(JᵀJ)), matching the reference's Householder-QR solvers."""
    j = jnp.swapaxes(jt, -1, -2)  # (..., R, P)
    p = j.shape[-1]
    eye = jnp.eye(p, dtype=j.dtype)
    damp_rows = jnp.sqrt(damp_diag)[..., None] * eye
    aug = jnp.concatenate([j, damp_rows], axis=-2)  # (..., R+P, P)
    rhs = jnp.concatenate(
        [rows, jnp.zeros(rows.shape[:-1] + (p,), rows.dtype)], axis=-1)
    q, r = jnp.linalg.qr(aug)  # reduced: q (..., R+P, P), r (..., P, P)
    qtr = jnp.einsum("...rp,...r->...p", q, rhs)
    delta = jax.lax.linalg.triangular_solve(
        r, qtr[..., None], left_side=True, lower=False)[..., 0]
    return delta * mask


def _cg(matvec: Callable, b: jnp.ndarray, iters: int, tol: float) -> jnp.ndarray:
    """Batched conjugate gradients for SPD `matvec`, x0 = 0.

    b (..., P); all inner products reduce over the last axis only, so every
    batch element runs its own CG with a masked early stop (converged
    elements take zero-length steps — the static-shape equivalent of exiting
    the loop)."""
    x = jnp.zeros_like(b)
    r = b
    pvec = r
    rs = jnp.sum(r * r, axis=-1)
    rs0 = rs

    def body(_, carry):
        x, r, pvec, rs = carry
        ap = matvec(pvec)
        pap = jnp.sum(pvec * ap, axis=-1)
        active = rs > (tol * tol) * rs0
        alpha = jnp.where(active, rs / jnp.maximum(pap, _FLT_MIN), 0.0)
        x = x + alpha[..., None] * pvec
        r = r - alpha[..., None] * ap
        rs_new = jnp.sum(r * r, axis=-1)
        beta = jnp.where(active, rs_new / jnp.maximum(rs, _FLT_MIN), 0.0)
        pvec = r + beta[..., None] * pvec
        return x, r, pvec, jnp.where(active, rs_new, rs)

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, pvec, rs))
    return x


def solve_gauss_newton_cg(
    residual_fn: Callable,
    error_fn: Callable,
    x0: jnp.ndarray,
    enabled_mask: Optional[jnp.ndarray] = None,
    options: SolverOptions = SolverOptions(),
) -> SolveResult:
    """Matrix-free Gauss-Newton: each step solves (JᵀJ + damp·I) δ = Jᵀr by
    conjugate gradients where the operator is a JVP-then-VJP sweep of the
    residual graph — J and JᵀJ are never materialized.

    This is the TPU-native high-dimensional fallback the reference covers
    with SparseGaussNewtonSolverT (gauss_newton_solver_sparse.h:50-90:
    sparse JᵀJ + Eigen SimplicialLLT). Sparse factorization is the wrong
    shape for the MXU; Krylov iterations are dense batched matvecs. Memory
    is O(P) per element instead of O(P²), so the kMaxModelParams=2048
    envelope (math/types.h:425) with dense blendshape rigs stays tractable.

    Convergence/masking semantics match solve_gauss_newton exactly
    (solver.cpp:86-121 criterion; disabled parameters frozen via masks).
    """
    p = x0.shape[-1]
    mask = (jnp.ones(p, x0.dtype) if enabled_mask is None
            else enabled_mask.astype(x0.dtype))
    opts = options
    big = jnp.asarray(jnp.finfo(jnp.float32).max, x0.dtype)
    batched = x0.ndim > 1
    damp = opts.regularization + (1.0 - mask)

    def body(state):
        x, last_err, it, done, hist = state
        rows, jvp_fn = jax.linearize(residual_fn, x)
        vjp_fn = jax.linear_transpose(jvp_fn, x)

        def matvec(v):
            jtjv, = vjp_fn(jvp_fn(v * mask))
            return jtjv * mask + damp * v

        jtr, = vjp_fn(rows)
        delta = _cg(matvec, jtr * mask, opts.cg_iterations, opts.cg_tol)
        delta = delta * mask
        err = (jnp.sum(rows * rows, axis=-1)
               if opts.energy_from_residual else error_fn(x))
        if opts.verbose:
            jax.debug.print("GN-CG iter {i}: error {e}", i=it, e=jnp.mean(err))
        if opts.do_line_search:
            alpha = _line_search(error_fn, x, delta, err, opts.line_search_steps)
            delta = (alpha[..., None] if batched else alpha) * delta
        x_new = x - delta
        conv = _converged(last_err, err, opts.threshold)
        newly_done = (it + 1 >= opts.min_iterations) & conv
        x = jnp.where(done[..., None], x, x_new) if batched else jnp.where(done, x, x_new)
        err_out = jnp.where(done, last_err, err)
        if opts.store_history:
            hist = (hist[0].at[it].set(err), hist[1].at[it].set(x))
        return x, err_out, it + 1, done | newly_done, hist

    def cond(state):
        return (state[2] < opts.max_iterations) & (~jnp.all(state[3]))

    err_shape = x0.shape[:-1]
    hist0 = (jnp.zeros((opts.max_iterations,) + err_shape, x0.dtype),
             jnp.zeros((opts.max_iterations,) + x0.shape, x0.dtype)) \
        if opts.store_history else ()
    init = (x0, jnp.broadcast_to(big, err_shape), jnp.asarray(0, jnp.int32),
            jnp.zeros(err_shape, bool), hist0)
    x, err, it, done, hist = jax.lax.while_loop(cond, body, init)
    return SolveResult(params=x, error=err, iterations=it, converged=done,
                       error_history=hist[0] if opts.store_history else None,
                       param_history=hist[1] if opts.store_history else None)


def solve_gauss_newton(
    residual_fn: Callable,
    error_fn: Callable,
    x0: jnp.ndarray,
    enabled_mask: Optional[jnp.ndarray] = None,
    options: SolverOptions = SolverOptions(),
    jacobian_fn: Optional[Callable] = None,
    normal_fn: Optional[Callable] = None,
) -> SolveResult:
    """Minimize ‖r(x)‖² (r = weighted residual rows) by damped Gauss-Newton.

    residual_fn: (P,) -> (R,); error_fn: (P,) -> scalar exact energy.
    enabled_mask: optional (P,) 0/1 — disabled parameters are frozen.
    jacobian_fn: optional analytic (P,) -> (rows, J (R, P)) fast path.
    normal_fn: optional (P,) -> (JᵀJ, Jᵀr, Σrows²) direct provider; see
    solve_levenberg_marquardt.
    """
    if options.linear_solver == "cg":
        return solve_gauss_newton_cg(residual_fn, error_fn, x0,
                                     enabled_mask, options)
    p = x0.shape[-1]
    mask = jnp.ones(p, x0.dtype) if enabled_mask is None else enabled_mask.astype(x0.dtype)
    opts = options
    big = jnp.asarray(jnp.finfo(jnp.float32).max, x0.dtype)

    batched = x0.ndim > 1

    def body(state):
        x, last_err, it, done, hist = state
        if normal_fn is not None:
            jtj, jtr, sq = normal_fn(x)
            if enabled_mask is not None:
                jtj = jtj * (mask[:, None] * mask[None, :])
                jtr = jtr * mask
            delta = damped_psd_solve(
                jtj, opts.regularization + (1.0 - mask), jtr) * mask
            err = sq if opts.energy_from_residual else error_fn(x)
        else:
            rows, jt = _jacobian(residual_fn, x, jacobian_fn)
            jt = jt * mask[:, None]
            if opts.linear_solver == "qr":
                damp = jnp.broadcast_to(opts.regularization + (1.0 - mask), x.shape)
                delta = _qr_step(jt, rows, damp, mask)
            else:
                jtj = jnp.einsum("...pr,...qr->...pq", jt, jt,
                                  precision=_jtj_precision())
                jtr = jnp.einsum("...pr,...r->...p", jt, rows)
                delta = damped_psd_solve(
                    jtj, opts.regularization + (1.0 - mask), jtr)
                delta = delta * mask
            err = jnp.sum(rows * rows, axis=-1) if opts.energy_from_residual else error_fn(x)
        if opts.verbose:
            jax.debug.print("GN iter {i}: error {e}", i=it, e=jnp.mean(err))
        if opts.do_line_search:
            alpha = _line_search(error_fn, x, delta, err, opts.line_search_steps)
            delta = (alpha[..., None] if batched else alpha) * delta
        x_new = x - delta
        conv = _converged(last_err, err, opts.threshold)
        newly_done = (it + 1 >= opts.min_iterations) & conv
        x = jnp.where(done[..., None], x, x_new) if batched else jnp.where(done, x, x_new)
        err_out = jnp.where(done, last_err, err)
        if opts.store_history:
            hist = (hist[0].at[it].set(err), hist[1].at[it].set(x))
        return x, err_out, it + 1, done | newly_done, hist

    def cond(state):
        return (state[2] < opts.max_iterations) & (~jnp.all(state[3]))

    err_shape = x0.shape[:-1]
    hist0 = (jnp.zeros((opts.max_iterations,) + err_shape, x0.dtype),
             jnp.zeros((opts.max_iterations,) + x0.shape, x0.dtype)) \
        if opts.store_history else ()
    init = (x0, jnp.broadcast_to(big, err_shape), jnp.asarray(0, jnp.int32),
            jnp.zeros(err_shape, bool), hist0)
    x, err, it, done, hist = jax.lax.while_loop(cond, body, init)
    return SolveResult(params=x, error=err, iterations=it, converged=done,
                       error_history=hist[0] if opts.store_history else None,
                       param_history=hist[1] if opts.store_history else None)


def solve_gradient_descent(
    residual_fn: Callable,
    error_fn: Callable,
    x0: jnp.ndarray,
    enabled_mask: Optional[jnp.ndarray] = None,
    options: SolverOptions = SolverOptions(),
    learning_rate: float = 0.01,
    jacobian_fn: Optional[Callable] = None,
    normal_fn: Optional[Callable] = None,
) -> SolveResult:
    """Plain first-order descent (gradient_descent_solver.h): per iteration
    x -= lr·∇E with ∇E = 2·Jᵀr, same convergence test as the GN solvers."""
    p = x0.shape[-1]
    mask = jnp.ones(p, x0.dtype) if enabled_mask is None else enabled_mask.astype(x0.dtype)
    opts = options
    big = jnp.asarray(jnp.finfo(jnp.float32).max, x0.dtype)
    batched = x0.ndim > 1

    def body(state):
        x, last_err, it, done = state
        if normal_fn is not None:
            _, jtr, sq = normal_fn(x)
            grad = 2.0 * jtr * mask
            err = sq if opts.energy_from_residual else error_fn(x)
        else:
            rows, jt = _jacobian(residual_fn, x, jacobian_fn)
            grad = 2.0 * jnp.einsum("...pr,...r->...p", jt * mask[:, None], rows)
            err = jnp.sum(rows * rows, axis=-1) if opts.energy_from_residual else error_fn(x)
        x_new = x - learning_rate * grad
        conv = _converged(last_err, err, opts.threshold)
        newly_done = (it + 1 >= opts.min_iterations) & conv
        x = jnp.where(done[..., None], x, x_new) if batched else jnp.where(done, x, x_new)
        err_out = jnp.where(done, last_err, err)
        return x, err_out, it + 1, done | newly_done

    def cond(state):
        _, _, it, done = state
        return (it < opts.max_iterations) & (~jnp.all(done))

    err_shape = x0.shape[:-1]
    init = (x0, jnp.broadcast_to(big, err_shape), jnp.asarray(0, jnp.int32),
            jnp.zeros(err_shape, bool))
    x, err, it, done = jax.lax.while_loop(cond, body, init)
    return SolveResult(params=x, error=err, iterations=it, converged=done)


def solve_levenberg_marquardt(
    residual_fn: Callable,
    error_fn: Callable,
    x0: jnp.ndarray,
    enabled_mask: Optional[jnp.ndarray] = None,
    options: SolverOptions = SolverOptions(),
    jacobian_fn: Optional[Callable] = None,
    normal_fn: Optional[Callable] = None,
    lambda0: Optional[jnp.ndarray] = None,
) -> SolveResult:
    """LM with multiplicative damping: each iteration solves
    (JᵀJ + λ·diag(JᵀJ) + reg·I) δ = Jᵀr and accepts only if the energy drops,
    adapting λ — the TrustRegionQRT equivalent (trust_region_qr.cpp:82-230).

    normal_fn: optional (P,) -> (JᵀJ, Jᵀr, Σrows²) direct normal-equation
    provider (SkeletonSolverFunction.normal_equations) — structured residual
    modules contribute JᵀJ without materializing rows. When given, the solver
    never forms the dense Jacobian; with energy_from_residual the caller must
    pass a Σrows² evaluator as error_fn (residual_sq).

    lambda0: optional per-element initial damping (overrides
    options.lambda_init) — pass a previous solve's `lambda_final` to resume
    its LM state exactly (the compacted-refinement path)."""
    p = x0.shape[-1]
    mask = jnp.ones(p, x0.dtype) if enabled_mask is None else enabled_mask.astype(x0.dtype)
    opts = options

    batched = x0.ndim > 1

    def _solve_normal(jtj, jtr, lam):
        if enabled_mask is not None:
            jtj = jtj * (mask[:, None] * mask[None, :])
            jtr = jtr * mask
        diag = jnp.diagonal(jtj, axis1=-2, axis2=-1)
        damp = lam[..., None] if batched else lam
        damp_diag = damp * jnp.maximum(diag, 1e-12) \
            + opts.regularization + (1.0 - mask)
        return damped_psd_solve(jtj, damp_diag, jtr) * mask

    def _step(x, rows, jt, lam):
        """One damped step from the factorization at x."""
        jt = jt * mask[:, None]
        diag = jnp.sum(jt * jt, axis=-1)
        damp = lam[..., None] if batched else lam
        damp_diag = damp * jnp.maximum(diag, 1e-12) \
            + opts.regularization + (1.0 - mask)
        if opts.linear_solver == "qr":
            delta = _qr_step(jt, rows, damp_diag, mask)
        else:
            jtj = jnp.einsum("...pr,...qr->...pq", jt, jt,
                              precision=_jtj_precision())
            jtr = jnp.einsum("...pr,...r->...p", jt, rows)
            delta = damped_psd_solve(jtj, damp_diag, jtr) * mask
        return x - delta

    # Note: a variant that carries (rows, Jᵀ) in the loop so the trial
    # evaluation doubles as the next factorization was measured SLOWER on
    # v5e at full-body scale (12.4k vs 13.4k solves/s): hauling the (B, R, P)
    # Jacobian through the while_loop carry (where-select + copy ≈ 0.9 GB/it)
    # costs more than the residual-only FK it saves. Kept for problems where
    # the Jacobian is small relative to the residual evaluation.
    def body_fused(state):
        x, rows, jt, err, lam, it, done, hist = state
        x_trial = _step(x, rows, jt, lam)
        rows_t, jt_t = _jacobian(residual_fn, x_trial, jacobian_fn)
        err_trial = jnp.sum(rows_t * rows_t, axis=-1)
        accept = err_trial < err
        acc = accept[..., None] if batched else accept
        x_new = jnp.where(acc, x_trial, x)
        rows_new = jnp.where(accept[..., None], rows_t, rows)
        jt_new = jnp.where(accept[..., None, None], jt_t, jt)
        err_new = jnp.where(accept, err_trial, err)
        lam_new = jnp.clip(
            jnp.where(accept, lam * opts.lambda_down, lam * opts.lambda_up),
            opts.lambda_min, opts.lambda_max,
        )
        conv = accept & _converged(err, err_trial, opts.threshold)
        newly_done = (it + 1 >= opts.min_iterations) & conv
        keep = done[..., None] if batched else done
        x_out = jnp.where(keep, x, x_new)
        err_out = jnp.where(done, err, err_new)
        lam_out = jnp.where(done, lam, lam_new)
        if opts.store_history:
            hist = (hist[0].at[it].set(err_out), hist[1].at[it].set(x_out))
        return (x_out, rows_new, jt_new, err_out, lam_out, it + 1,
                done | newly_done, hist)

    def cond_fused(state):
        return (state[5] < opts.max_iterations) & (~jnp.all(state[6]))

    def body(state):
        x, err, lam, it, done, hist = state
        if normal_fn is not None:
            jtj, jtr, _ = normal_fn(x)
            x_trial = x - _solve_normal(jtj, jtr, lam)
            err_trial = error_fn(x_trial)
        else:
            rows, jt = _jacobian(residual_fn, x, jacobian_fn)
            x_trial = _step(x, rows, jt, lam)
            if opts.energy_from_residual:
                r_trial = residual_fn(x_trial)
                err_trial = jnp.sum(r_trial * r_trial, axis=-1)
            else:
                err_trial = error_fn(x_trial)
        accept = err_trial < err
        acc = accept[..., None] if batched else accept
        x_new = jnp.where(acc, x_trial, x)
        err_new = jnp.where(accept, err_trial, err)
        lam_new = jnp.clip(
            jnp.where(accept, lam * opts.lambda_down, lam * opts.lambda_up),
            opts.lambda_min, opts.lambda_max,
        )
        if opts.verbose:
            jax.debug.print("LM iter {i}: error {e} (accepted {a})",
                            i=it, e=jnp.mean(err_new), a=jnp.mean(
                                accept.astype(jnp.float32)))
        conv = accept & _converged(err, err_trial, opts.threshold)
        newly_done = (it + 1 >= opts.min_iterations) & conv
        x = jnp.where(done[..., None], x, x_new) if batched else jnp.where(done, x, x_new)
        err_out = jnp.where(done, err, err_new)
        lam_out = jnp.where(done, lam, lam_new)
        if opts.store_history:
            hist = (hist[0].at[it].set(err_out), hist[1].at[it].set(x))
        return x, err_out, lam_out, it + 1, done | newly_done, hist

    def cond(state):
        return (state[3] < opts.max_iterations) & (~jnp.all(state[4]))

    err_shape = x0.shape[:-1]
    hist0 = (jnp.zeros((opts.max_iterations,) + err_shape, x0.dtype),
             jnp.zeros((opts.max_iterations,) + x0.shape, x0.dtype)) \
        if opts.store_history else ()
    lam0 = jnp.broadcast_to(
        jnp.asarray(opts.lambda_init, x0.dtype) if lambda0 is None
        else jnp.asarray(lambda0, x0.dtype), err_shape)
    if opts.energy_from_residual and opts.carry_jacobian and normal_fn is None:
        rows0, jt0 = _jacobian(residual_fn, x0, jacobian_fn)
        err0 = jnp.sum(rows0 * rows0, axis=-1)
        init = (x0, rows0, jt0, jnp.broadcast_to(err0, err_shape), lam0,
                jnp.asarray(0, jnp.int32), jnp.zeros(err_shape, bool), hist0)
        x, _, _, err, lam, it, done, hist = jax.lax.while_loop(
            cond_fused, body_fused, init)
    else:
        if opts.energy_from_residual and normal_fn is None:
            r0 = residual_fn(x0)
            err0 = jnp.sum(r0 * r0, axis=-1)
        else:
            err0 = error_fn(x0)
        init = (x0, jnp.broadcast_to(err0, err_shape), lam0,
                jnp.asarray(0, jnp.int32), jnp.zeros(err_shape, bool), hist0)
        x, err, lam, it, done, hist = jax.lax.while_loop(cond, body, init)
    return SolveResult(params=x, error=err, iterations=it, converged=done,
                       error_history=hist[0] if opts.store_history else None,
                       param_history=hist[1] if opts.store_history else None,
                       lambda_final=lam)
