"""Sequence-solver tests (reference analogs: sequence IK tests in
pymomentum/test/test_sequence_ik.py and multipose/sequence solver C++ tests)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.sequence import (
    AccelerationSequenceErrorFunction,
    ModelParametersSequenceErrorFunction,
    SequenceSolverFunction,
    StateSequenceErrorFunction,
    solve_sequence,
    stack_frames,
)
from momentum_tpu.solver import SolverOptions
from momentum_tpu.testing.fixtures import create_test_character


@pytest.fixture(scope="module")
def char():
    return create_test_character(4)


def _rng():
    return np.random.default_rng(12345)


def _gt_motion(char, f, rng, scale_amp=0.4):
    """Smooth ground-truth motion: sinusoidal per-parameter trajectories."""
    p = char.num_model_parameters
    t = np.linspace(0, 1, f)[:, None]
    phase = rng.uniform(0, 2 * np.pi, p)
    amp = rng.uniform(0.1, scale_amp, p)
    return jnp.asarray(amp * np.sin(2 * np.pi * t + phase), jnp.float32)


def _per_frame_position_efs(char, thetas):
    states = jax.vmap(char.skeleton_states)(thetas)
    targets = jax.vmap(char.locators.world_positions)(states)
    f = thetas.shape[0]
    efs = []
    for i in range(f):
        efs.append(PositionErrorFunction.create(
            np.asarray(char.locators.parent), np.asarray(char.locators.offset),
            np.asarray(targets[i])))
    return stack_frames(efs)


class TestSequenceSolve:
    def test_per_frame_tracking_converges(self, char):
        rng = _rng()
        f = 6
        thetas_gt = _gt_motion(char, f, rng)
        ef = _per_frame_position_efs(char, thetas_gt)
        smooth = ModelParametersSequenceErrorFunction.create(
            char.num_model_parameters, weight=1e-4)
        fn = SequenceSolverFunction.create(
            char, f, per_frame_errors=(ef,), sequence_errors=(smooth,))
        pf0 = jnp.zeros((f, fn.num_per_frame))
        u0 = jnp.zeros((fn.num_universal,))
        res = jax.jit(lambda a, b: solve_sequence(
            fn, a, b, SolverOptions(max_iterations=30, regularization=1e-5)))(pf0, u0)
        assert float(res.error) < 1e-4

    def test_universal_scale_calibration(self, char):
        """Shared scale param recovered across frames (MultiposeSolver pattern,
        multipose_solver.h:18-60)."""
        rng = _rng()
        f = 5
        thetas_gt = _gt_motion(char, f, rng)
        scale_idx = char.parameter_transform.parameter_index("scale_global")
        true_scale = 0.3
        thetas_gt = thetas_gt.at[:, scale_idx].set(true_scale)
        ef = _per_frame_position_efs(char, thetas_gt)

        universal = np.zeros(char.num_model_parameters, bool)
        universal[scale_idx] = True
        fn = SequenceSolverFunction.create(
            char, f, universal=universal, per_frame_errors=(ef,))
        pf0 = jnp.zeros((f, fn.num_per_frame))
        u0 = jnp.zeros((fn.num_universal,))
        res = solve_sequence(fn, pf0, u0,
                             SolverOptions(max_iterations=40, regularization=1e-6))
        assert float(res.error) < 1e-5
        np.testing.assert_allclose(float(res.universal[0]), true_scale, atol=1e-3)

    def test_matches_dense_joined_solve(self, char):
        """The structured banded/arrowhead step equals a dense GN on the joined
        parameter vector (small F)."""
        rng = _rng()
        f = 3
        thetas_gt = _gt_motion(char, f, rng)
        ef = _per_frame_position_efs(char, thetas_gt)
        smooth = ModelParametersSequenceErrorFunction.create(
            char.num_model_parameters, weight=1e-2)
        scale_idx = char.parameter_transform.parameter_index("scale_global")
        universal = np.zeros(char.num_model_parameters, bool)
        universal[scale_idx] = True
        fn = SequenceSolverFunction.create(
            char, f, universal=universal, per_frame_errors=(ef,),
            sequence_errors=(smooth,))

        pf = jnp.asarray(rng.uniform(-0.1, 0.1, (f, fn.num_per_frame)), jnp.float32)
        u = jnp.asarray(rng.uniform(-0.1, 0.1, fn.num_universal), jnp.float32)

        # structured single GN step
        res = solve_sequence(fn, pf, u, SolverOptions(
            max_iterations=1, min_iterations=1, regularization=1e-3))

        # dense joined step via autodiff of the stacked residual
        def joined_residual(x):
            pf_ = x[: f * fn.num_per_frame].reshape(f, fn.num_per_frame)
            u_ = x[f * fn.num_per_frame:]
            thetas = fn.join(pf_, u_)
            rows = [jax.vmap(fn.frame_residual)(thetas, fn.per_frame_errors).reshape(-1)]
            ctxs = fn.frame_contexts(thetas)
            for sef in fn.sequence_errors:
                ctx_w = fn._window_contexts(ctxs, sef.window)
                rows.append(jax.vmap(
                    lambda c: sef.residual(fn.character, c))(ctx_w).reshape(-1))
            return jnp.concatenate(rows)

        x0 = jnp.concatenate([pf.reshape(-1), u])
        j = jax.jacfwd(joined_residual)(x0)
        r = joined_residual(x0)
        n = x0.shape[0]
        h = j.T @ j + 1e-3 * jnp.eye(n)
        # solve_sequence applies, on the equilibrated system, a roundoff
        # jitter (multiplicative on the max-over-frames diagonal for
        # per-frame DoFs, on its own diagonal for universal) plus a
        # per-frame pivot floor on the scaled band diagonal — the f32
        # guards for mm-scale data; mirror both here in unscaled
        # coordinates so the pin stays exact
        from momentum_tpu.sequence.solver import (_EQUILIBRATED_DIAG_FLOOR,
                                                  _EQUILIBRATED_JITTER,
                                                  _EQUILIBRATED_JITTER_U)

        hd = jnp.diagonal(h)
        npf = f * fn.num_per_frame
        hd_pf = hd[:npf].reshape(f, fn.num_per_frame)
        dmax = jnp.max(hd_pf, axis=0)
        lift = (jnp.maximum(_EQUILIBRATED_DIAG_FLOOR - hd_pf / dmax, 0.0)
                + _EQUILIBRATED_JITTER)
        add = jnp.concatenate([(lift * dmax).reshape(-1),
                               _EQUILIBRATED_JITTER_U * hd[npf:]])
        h = h + jnp.diag(add)
        delta = jnp.linalg.solve(h, j.T @ r)
        x1 = x0 - delta

        pf_dense = np.asarray(x1[: f * fn.num_per_frame]).reshape(f, fn.num_per_frame)
        u_dense = np.asarray(x1[f * fn.num_per_frame:])
        np.testing.assert_allclose(np.asarray(res.per_frame), pf_dense, rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(res.universal), u_dense, rtol=1e-3, atol=2e-4)

    def test_acceleration_window3_path(self, char):
        """Window-3 stencil exercises the superblock aggregation (q=2)."""
        rng = _rng()
        f = 7
        thetas_gt = _gt_motion(char, f, rng)
        ef = _per_frame_position_efs(char, thetas_gt)
        accel = AccelerationSequenceErrorFunction.create(char.num_joints, weight=1e-3)
        fn = SequenceSolverFunction.create(
            char, f, per_frame_errors=(ef,), sequence_errors=(accel,))
        pf0 = jnp.zeros((f, fn.num_per_frame))
        u0 = jnp.zeros((fn.num_universal,))
        res = solve_sequence(fn, pf0, u0,
                             SolverOptions(max_iterations=25, regularization=1e-5))
        assert float(res.error) < 2e-2

    def test_state_sequence_smoothness(self, char):
        rng = _rng()
        f = 4
        thetas_gt = _gt_motion(char, f, rng)
        ef = _per_frame_position_efs(char, thetas_gt)
        smooth = StateSequenceErrorFunction.create(char.num_joints, weight=1e-3)
        fn = SequenceSolverFunction.create(
            char, f, per_frame_errors=(ef,), sequence_errors=(smooth,))
        pf0 = jnp.zeros((f, fn.num_per_frame))
        u0 = jnp.zeros((fn.num_universal,))
        res = solve_sequence(fn, pf0, u0,
                             SolverOptions(max_iterations=25, regularization=1e-5))
        assert float(res.error) < 1e-2


def test_analytic_sequence_jacobians_match_ad():
    """The size-gated analytic per-frame Jacobian path must produce the same
    normal equations as jacfwd."""
    import os

    import dataclasses as dc

    from momentum_tpu.sequence.solver import _normal_equations
    from momentum_tpu.sequence.solver_function import SequenceSolverFunction
    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(5)
    f, p = 3, char.num_model_parameters
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(-0.2, 0.2, (f, p)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    stacked = jax.vmap(lambda t: dc.replace(ef0, target=t))(targets)
    universal = np.zeros(p, bool)
    universal[1] = True
    fn = SequenceSolverFunction.create(char, f, universal=universal,
                                       per_frame_errors=(stacked,))
    pf = jnp.asarray(rng.normal(0, 0.1, (f, fn.num_per_frame)), jnp.float32)
    u = jnp.asarray(rng.normal(0, 0.1, (fn.num_universal,)), jnp.float32)

    outs = {}
    for mode in ("1", "0"):
        os.environ["MOMENTUM_TPU_SEQ_ANALYTIC"] = mode
        try:
            outs[mode] = _normal_equations(fn, pf, u)
        finally:
            del os.environ["MOMENTUM_TPU_SEQ_ANALYTIC"]
    for a, b in zip(outs["1"][:6], outs["0"][:6]):
        if isinstance(a, list):
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           atol=2e-4)
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


def test_sequence_line_search_improves_hard_start():
    """Armijo backtracking (sequence_solver.cpp line-search option) keeps the
    solve monotone from a poor initialization."""
    import dataclasses as dc
    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.sequence.solver import solve_sequence
    from momentum_tpu.sequence.solver_function import SequenceSolverFunction
    from momentum_tpu.solver.gauss_newton import SolverOptions
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(5)
    f, p = 4, char.num_model_parameters
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(-0.4, 0.4, (f, p)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    stacked = jax.vmap(lambda t: dc.replace(ef0, target=t))(targets)
    fn = SequenceSolverFunction.create(char, f, per_frame_errors=(stacked,))
    pf0, u0 = fn.split(jnp.full((f, p), 1.5))  # far start
    res_ls = solve_sequence(fn, pf0, u0, SolverOptions(
        max_iterations=15, do_line_search=True))
    res_plain = solve_sequence(fn, pf0, u0, SolverOptions(max_iterations=15))
    e0 = float(fn.error(pf0, u0))
    assert float(res_ls.error) < e0
    assert np.isfinite(float(res_ls.error))
    # line search never ends worse than the plain step at equal budget
    assert float(res_ls.error) <= float(res_plain.error) * 1.5 + 1e-6


class TestF64NormalEquations:
    """SolverOptions.f64_normal_equations — the reference's
    useDoublePrecisionNormalEquations (sequence_cholesky_solver.h:31-33):
    accumulate JᵀJ/Jᵀr in float64, factor in float32."""

    def test_f64_accumulation_recovers_lost_bits(self, char):
        """With residual rows spanning ~4 orders of magnitude the f32 row
        contraction loses the small rows' JᵀJ contribution; the f64
        accumulation matches a numpy float64 reference much more closely."""
        pass
        from momentum_tpu.sequence.solver import _normal_equations

        rng = _rng()
        f = 4
        thetas_gt = _gt_motion(char, f, rng)
        states = jax.vmap(char.skeleton_states)(thetas_gt)
        targets = jax.vmap(char.locators.world_positions)(states)
        n_loc = char.locators.num_locators
        # one huge-weight constraint + tiny-weight rest
        cw = np.full(n_loc, 1e-6, np.float32)
        cw[0] = 1e4
        efs = stack_frames([
            PositionErrorFunction.create(
                np.asarray(char.locators.parent),
                np.asarray(char.locators.offset),
                np.asarray(targets[i]), cweight=cw)
            for i in range(f)])
        smooth = ModelParametersSequenceErrorFunction.create(
            char.num_model_parameters, weight=0.1)
        fn = SequenceSolverFunction.create(
            char, f, universal=np.zeros(char.num_model_parameters, bool),
            per_frame_errors=(efs,), sequence_errors=(smooth,))
        pf0, u0 = fn.split(thetas_gt + 0.01)

        diag32, *_ = _normal_equations(fn, pf0, u0, f64=False)
        with jax.enable_x64():
            diag64, *_ = _normal_equations(fn, pf0, u0, f64=True)
            assert diag64.dtype == jnp.float64
        # numpy f64 reference from the f32 Jacobian pieces is implicitly what
        # the f64 path computes; check the two disagree (f32 lost bits) and
        # that f64 keeps the small-row contributions in the trailing params
        d32 = np.asarray(diag32, np.float64)
        d64 = np.asarray(diag64)
        rel = np.abs(d32 - d64) / (np.abs(d64) + 1e-12)
        assert rel.max() > 1e-6  # f32 accumulation actually lost precision
        # ... but not catastrophically relative to the dominant scale
        assert np.abs(d32 - d64).max() < 1e-3 * np.abs(d64).max()

    def test_f64_solve_matches_f32_on_well_conditioned(self, char):
        pass

        rng = _rng()
        f = 5
        thetas_gt = _gt_motion(char, f, rng)
        ef = _per_frame_position_efs(char, thetas_gt)
        smooth = ModelParametersSequenceErrorFunction.create(
            char.num_model_parameters, weight=0.1)
        fn = SequenceSolverFunction.create(
            char, f, universal=np.zeros(char.num_model_parameters, bool),
            per_frame_errors=(ef,), sequence_errors=(smooth,))
        pf0, u0 = fn.split(jnp.zeros_like(thetas_gt))
        r32 = solve_sequence(fn, pf0, u0, SolverOptions(max_iterations=10))
        with jax.enable_x64():
            r64 = solve_sequence(
                fn, pf0, u0,
                SolverOptions(max_iterations=10, f64_normal_equations=True))
        np.testing.assert_allclose(np.asarray(r64.per_frame),
                                   np.asarray(r32.per_frame), atol=2e-4)
        assert float(r64.error) <= float(r32.error) * 1.05 + 1e-8
