"""Solver + error-function tests, mirroring the reference's test strategy
(SURVEY.md §4): FD-vs-analytic derivative checks at random poses
(test/character_solver/error_function_helpers.cpp TEST_GRADIENT_AND_JACOBIAN),
end-to-end IK convergence (inverse_kinematics_test.cpp), and subset/enabled
parameter behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.errors import (
    LimitErrorFunction,
    ModelParametersErrorFunction,
    OrientationErrorFunction,
    PositionErrorFunction,
)
from momentum_tpu.math import quaternion as quat
from momentum_tpu.math.generalized_loss import GeneralizedLoss
from momentum_tpu.solver import (
    SkeletonSolverFunction,
    SolverOptions,
    solve_gauss_newton,
    solve_ik,
    solve_levenberg_marquardt,
)
from momentum_tpu.testing.fixtures import create_test_character


def _random_pose(char, rng, scale=0.25):
    return jnp.asarray(rng.uniform(-scale, scale, char.num_model_parameters), jnp.float32)


def _position_ef(char, rng, n=6, **kw):
    parents = rng.integers(0, char.num_joints, n)
    offsets = rng.uniform(-0.5, 0.5, (n, 3))
    targets = rng.uniform(-1.5, 1.5, (n, 3))
    weights = rng.uniform(0.5, 2.0, n)
    return PositionErrorFunction.create(parents, offsets, targets, weights, **kw)


def _orientation_ef(char, rng, n=3):
    parents = rng.integers(0, char.num_joints, n)
    targets = np.stack([
        np.asarray(quat.from_axis_angle(jnp.asarray(rng.uniform(-1, 1, 3), jnp.float32)))
        for _ in range(n)
    ])
    return OrientationErrorFunction.create(parents, targets, weight=2.0)


def _fd_gradient(f, x, eps=1e-3):
    g = np.zeros(x.shape[-1])
    x = np.asarray(x, np.float64)
    for i in range(x.shape[-1]):
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        g[i] = (float(f(jnp.asarray(xp, jnp.float32))) - float(f(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
    return g


@pytest.fixture(scope="module")
def char():
    return create_test_character(5)


class TestDerivatives:
    def test_gradient_matches_fd_position(self, char, rng):
        fn = SkeletonSolverFunction(char, (_position_ef(char, rng),))
        x = _random_pose(char, rng)
        g = np.asarray(fn.gradient(x))
        g_fd = _fd_gradient(fn.error, x)
        np.testing.assert_allclose(g, g_fd, rtol=5e-2, atol=8e-3)

    def test_gradient_matches_fd_mixed(self, char, rng):
        efs = (
            _position_ef(char, rng),
            _orientation_ef(char, rng),
            ModelParametersErrorFunction.create(
                np.zeros(char.num_model_parameters), weight=0.5
            ),
            LimitErrorFunction.create(weight=1.0),
        )
        fn = SkeletonSolverFunction(char, efs)
        x = _random_pose(char, rng, scale=0.5)
        g = np.asarray(fn.gradient(x))
        g_fd = _fd_gradient(fn.error, x)
        np.testing.assert_allclose(g, g_fd, rtol=5e-2, atol=1e-2)

    def test_gradient_matches_fd_robust_loss(self, char, rng):
        # Cauchy loss: exact energy gradient must still match FD
        ef = _position_ef(char, rng, loss=GeneralizedLoss(alpha=0.0, c=0.7))
        fn = SkeletonSolverFunction(char, (ef,))
        x = _random_pose(char, rng)
        g = np.asarray(fn.gradient(x))
        g_fd = _fd_gradient(fn.error, x)
        np.testing.assert_allclose(g, g_fd, rtol=5e-2, atol=8e-3)

    def test_residual_sq_equals_error_l2(self, char, rng):
        efs = (_position_ef(char, rng), _orientation_ef(char, rng))
        fn = SkeletonSolverFunction(char, efs)
        x = _random_pose(char, rng)
        r = fn.residual(x)
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(fn.error(x)), rtol=1e-5)

    def test_residual_jacobian_vs_gn_gradient(self, char, rng):
        # 2·Jᵀr must equal the energy gradient for L2 losses
        fn = SkeletonSolverFunction(char, (_position_ef(char, rng),))
        x = _random_pose(char, rng)
        r = fn.residual(x)
        j = jax.jacfwd(fn.residual)(x)
        np.testing.assert_allclose(
            np.asarray(2.0 * j.T @ r), np.asarray(fn.gradient(x)), rtol=1e-4, atol=1e-5
        )


class TestConvergence:
    def _target_problem(self, char, rng):
        """Locator targets generated from a known pose θ*."""
        theta_star = _random_pose(char, rng, scale=0.4)
        states = char.skeleton_states(theta_star)
        targets = char.locators.world_positions(states)
        ef = PositionErrorFunction.create(
            np.asarray(char.locators.parent),
            np.asarray(char.locators.offset),
            np.asarray(targets),
        )
        return theta_star, SkeletonSolverFunction(char, (ef,))

    def test_gauss_newton_converges(self, char, rng):
        theta_star, fn = self._target_problem(char, rng)
        x0 = jnp.zeros(char.num_model_parameters)
        opts = SolverOptions(max_iterations=50, regularization=1e-5)
        res = jax.jit(
            lambda x: solve_gauss_newton(fn.residual, fn.error, x, options=opts)
        )(x0)
        assert float(fn.error(res.params)) < 1e-7

    def test_levenberg_marquardt_converges(self, char, rng):
        theta_star, fn = self._target_problem(char, rng)
        x0 = jnp.zeros(char.num_model_parameters)
        opts = SolverOptions(max_iterations=100, regularization=1e-6)
        res = jax.jit(
            lambda x: solve_levenberg_marquardt(fn.residual, fn.error, x, options=opts)
        )(x0)
        assert float(fn.error(res.params)) < 1e-7

    def test_solve_ik_entrypoint(self, char, rng):
        _, fn = self._target_problem(char, rng)
        res = solve_ik(fn, jnp.zeros(char.num_model_parameters),
                       options=SolverOptions(max_iterations=50, regularization=1e-5))
        assert float(res.error) < 1e-5

    def test_enabled_mask_freezes_parameters(self, char, rng):
        _, fn = self._target_problem(char, rng)
        p = char.num_model_parameters
        mask = np.ones(p, np.float32)
        mask[6:] = 0.0  # only root rigid params enabled
        x0 = jnp.asarray(rng.uniform(-0.1, 0.1, p), jnp.float32)
        res = solve_gauss_newton(
            fn.residual, fn.error, x0, enabled_mask=jnp.asarray(mask),
            options=SolverOptions(max_iterations=10),
        )
        np.testing.assert_array_equal(np.asarray(res.params)[6:], np.asarray(x0)[6:])
        assert not np.allclose(np.asarray(res.params)[:6], np.asarray(x0)[:6])

    def test_batched_vmap_solve(self, char, rng):
        b = 4
        thetas = jnp.asarray(rng.uniform(-0.3, 0.3, (b, char.num_model_parameters)), jnp.float32)
        states = jax.vmap(char.skeleton_states)(thetas)
        targets = jax.vmap(char.locators.world_positions)(states)

        import dataclasses
        ef0 = PositionErrorFunction.create(
            np.asarray(char.locators.parent), np.asarray(char.locators.offset),
            np.zeros((char.locators.num_locators, 3)),
        )

        def solve_one(target):
            ef = dataclasses.replace(ef0, target=target)
            fn = SkeletonSolverFunction(char, (ef,))
            return solve_gauss_newton(
                fn.residual, fn.error, jnp.zeros(char.num_model_parameters),
                options=SolverOptions(max_iterations=40, regularization=1e-5),
            )

        res = jax.jit(jax.vmap(solve_one))(targets)
        # every batch element reaches its own targets
        for i in range(b):
            ef = PositionErrorFunction.create(
                np.asarray(char.locators.parent), np.asarray(char.locators.offset),
                np.asarray(targets[i]),
            )
            fn = SkeletonSolverFunction(char, (ef,))
            assert float(fn.error(res.params[i])) < 1e-6

    def test_line_search_reduces_error(self, char, rng):
        _, fn = self._target_problem(char, rng)
        x0 = jnp.zeros(char.num_model_parameters)
        opts = SolverOptions(max_iterations=20, regularization=1e-5, do_line_search=True)
        res = solve_gauss_newton(fn.residual, fn.error, x0, options=opts)
        assert float(fn.error(res.params)) < 1e-6

    def test_batched_line_search_matches_vmapped(self, char, rng):
        """Batch-native do_line_search == vmapping the scalar solver
        (the masked per-element alpha is bit-equivalent to the per-problem
        backtracking loop, gauss_newton_solver.cpp line-search path)."""
        import dataclasses
        b = 3
        p = char.num_model_parameters
        thetas = jnp.asarray(rng.uniform(-0.3, 0.3, (b, p)), jnp.float32)
        states = jax.vmap(char.skeleton_states)(thetas)
        targets = jax.vmap(char.locators.world_positions)(states)
        ef0 = PositionErrorFunction.create(
            np.asarray(char.locators.parent), np.asarray(char.locators.offset),
            np.zeros((char.locators.num_locators, 3)))
        opts = SolverOptions(max_iterations=8, regularization=1e-5,
                             do_line_search=True)

        ef_b = dataclasses.replace(ef0, target=targets)
        fn_b = SkeletonSolverFunction(char, (ef_b,))
        res_b = solve_gauss_newton(
            fn_b.residual, fn_b.error, jnp.zeros((b, p)), options=opts,
            jacobian_fn=fn_b.residual_and_jacobian)

        def solve_one(target):
            ef = dataclasses.replace(ef0, target=target)
            fn = SkeletonSolverFunction(char, (ef,))
            return solve_gauss_newton(fn.residual, fn.error, jnp.zeros(p),
                                      options=opts)

        res_v = jax.jit(jax.vmap(solve_one))(targets)
        np.testing.assert_allclose(np.asarray(res_b.params),
                                   np.asarray(res_v.params), atol=2e-4)


class TestLimits:
    def test_minmax_penalty_active_outside(self, char, rng):
        fn = SkeletonSolverFunction(char, (LimitErrorFunction.create(),))
        x_in = jnp.zeros(char.num_model_parameters)
        assert float(fn.error(x_in)) == 0.0
        x_out = x_in.at[0].set(0.5)  # limit on param 0 is [-0.1, 0.1]
        # error = kLimitWeight * w * (0.4)^2
        np.testing.assert_allclose(float(fn.error(x_out)), 10.0 * 0.4**2, rtol=1e-5)


def test_qr_linear_solver_matches_cholesky():
    """The QR path computes the same damped step as the normal equations."""
    import dataclasses as dc
    from momentum_tpu.solver.gauss_newton import (
        SolverOptions, solve_gauss_newton, solve_levenberg_marquardt)

    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(0, 1, (10, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 1, (10,)), jnp.float32)

    def residual(x):
        return A @ x - b

    def energy(x):
        r = residual(x)
        return jnp.sum(r * r)

    x0 = jnp.zeros(4)
    for solver in (solve_gauss_newton, solve_levenberg_marquardt):
        res_c = solver(residual, energy, x0,
                       options=SolverOptions(max_iterations=8))
        res_q = solver(residual, energy, x0,
                       options=SolverOptions(max_iterations=8,
                                             linear_solver="qr"))
        np.testing.assert_allclose(np.asarray(res_c.params),
                                   np.asarray(res_q.params), atol=2e-4)
    # least-squares optimum reached
    xstar = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res_q.params), xstar, atol=1e-3)


def test_qr_solver_classes_use_qr():
    from momentum_tpu.solver.solvers import GaussNewtonSolverQR, TrustRegionQR
    from momentum_tpu.testing.fixtures import create_test_character
    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction

    char = create_test_character(4)
    ef = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    fn = SkeletonSolverFunction(char, (ef,))
    for cls in (GaussNewtonSolverQR, TrustRegionQR):
        sol = cls(fn)
        assert sol.options.linear_solver == "qr"
        out = sol.solve(jnp.zeros(char.num_model_parameters))
        assert np.all(np.isfinite(np.asarray(out)))


def test_normal_equations_match_dense_jacobian():
    """SkeletonSolverFunction.normal_equations (structured pose-prior/limit
    contributions via accumulate_normal) == explicit JᵀJ/Jᵀr from the dense
    row Jacobian, and the LM solve through either path lands on the same
    optimum (the rank-update specialization of gauss_newton_solver.cpp:113-221)."""
    import dataclasses as dc
    import jax
    from momentum_tpu.errors import (
        LimitErrorFunction, OrientationErrorFunction, PosePriorErrorFunction,
        PositionErrorFunction)
    from momentum_tpu.errors.pose_prior import Mppca
    from momentum_tpu.math import skel_state as ss
    from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
    from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt
    from momentum_tpu.solver.ik import solve_ik
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character()
    p = char.num_model_parameters
    rng = np.random.default_rng(3)
    b = 3
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (b, p)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    _, q, _ = ss.split(states)
    pos0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    ori0 = OrientationErrorFunction.create(
        np.arange(char.skeleton.num_joints, dtype=np.int32),
        np.tile(np.asarray([0, 0, 0, 1], np.float32),
                (char.skeleton.num_joints, 1)))
    pos = dc.replace(pos0, target=targets)
    ori = dc.replace(ori0, target=q)
    lim = LimitErrorFunction.create()
    mu = np.zeros((2, p), np.float32)
    w = [np.full((p, 4), 0.01, np.float32)] * 2
    prior = Mppca.from_components(
        pi=np.asarray([0.6, 0.4]), mu=mu, w_list=w,
        sigma2=np.asarray([1.0, 2.0]), names=char.parameter_transform.names)
    pp = PosePriorErrorFunction.create(prior, char.parameter_transform.names)
    fn = SkeletonSolverFunction(char, (pos, ori, lim, pp), prefer_fused=True)
    assert fn.has_structured_modules
    assert lim.supports_normal_contrib(char)

    # push one element outside the limits so the limit term is actually active
    x = gt + 0.1 * jnp.asarray(rng.normal(0, 1, (b, p)), jnp.float32)
    x = x.at[0, 8].set(1.5)
    rows, j = fn.residual_and_jacobian(x)
    jtj_d = jnp.einsum("...rp,...rq->...pq", j, j)
    jtr_d = jnp.einsum("...rp,...r->...p", j, rows)
    sq_d = jnp.sum(rows * rows, axis=-1)
    jtj_n, jtr_n, sq_n = fn.normal_equations(x)
    scale = float(jnp.abs(jtj_d).max())
    np.testing.assert_allclose(np.asarray(jtj_n), np.asarray(jtj_d),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(jtr_n), np.asarray(jtr_d),
                               atol=1e-5 * float(jnp.abs(jtr_d).max()))
    np.testing.assert_allclose(np.asarray(sq_n), np.asarray(sq_d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fn.residual_sq(x)),
                               np.asarray(sq_d), rtol=1e-5)

    opts = SolverOptions(max_iterations=8, regularization=1e-5,
                         energy_from_residual=True)
    r_normal = solve_ik(fn, x, None, opts, method="levenberg_marquardt")
    r_dense = solve_levenberg_marquardt(
        fn.residual, fn.residual_sq, x, options=opts,
        jacobian_fn=fn.residual_and_jacobian)
    np.testing.assert_allclose(np.asarray(r_normal.params),
                               np.asarray(r_dense.params), atol=5e-4)


def test_qr_survives_ill_conditioning_where_cholesky_fails():
    """GaussNewtonSolverQR's reason to exist (gauss_newton_solver_qr.h):
    at condition number ~1e5 the f32 normal equations (squared condition
    ~1e10) produce a non-PD JtJ and the Cholesky step NaNs out, while the
    damped-stack QR still reaches machine-level energy."""
    from momentum_tpu.solver.gauss_newton import (
        SolverOptions, solve_gauss_newton)

    rng = np.random.default_rng(5)
    m, n = 60, 30
    U, _ = np.linalg.qr(rng.normal(0, 1, (m, m)))
    V, _ = np.linalg.qr(rng.normal(0, 1, (n, n)))
    s = np.logspace(0, -5, n)  # condition number 1e5
    A = jnp.asarray((U[:, :n] * s) @ V.T, jnp.float32)
    xstar = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    b = A @ xstar

    def residual(x):
        return A @ x - b

    def energy(x):
        r = residual(x)
        return jnp.sum(r * r)

    x0 = jnp.zeros(n)
    opts = lambda ls: SolverOptions(max_iterations=20, regularization=0.0,
                                    linear_solver=ls)
    res_c = solve_gauss_newton(residual, energy, x0, options=opts("cholesky"))
    res_q = solve_gauss_newton(residual, energy, x0, options=opts("qr"))
    assert float(res_q.error) < 1e-10
    # the normal-equation path degrades: NaN energy, or orders of magnitude
    # worse than QR
    e_c = float(res_c.error)
    assert np.isnan(e_c) or e_c > 1e4 * float(res_q.error)


def test_normal_equations_bf16_mode():
    """ne_bf16: the MXU-precision NE (bf16 inputs, f32 accumulation) stays
    within bf16 tolerance of the f32 normal equations, and an LM solve
    through it still reaches the optimum on a well-conditioned problem."""
    import dataclasses as dc
    import jax
    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
    from momentum_tpu.solver.ik import solve_ik
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character()
    p = char.num_model_parameters
    rng = np.random.default_rng(7)
    b = 2
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (b, p)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    pos = dc.replace(
        PositionErrorFunction.create(
            np.asarray(char.locators.parent), np.asarray(char.locators.offset),
            np.zeros((char.locators.num_locators, 3))),
        target=targets)
    fn32 = SkeletonSolverFunction(char, (pos,))
    fn16 = SkeletonSolverFunction(char, (pos,), ne_bf16=True)
    x = gt + 0.05 * jnp.asarray(rng.normal(0, 1, (b, p)), jnp.float32)
    jtj32, jtr32, sq32 = fn32.normal_equations(x)
    jtj16, jtr16, sq16 = fn16.normal_equations(x)
    # bf16 has ~8 mantissa bits → relative tolerance ~1e-2 on the contraction
    scale = float(jnp.abs(jtj32).max())
    np.testing.assert_allclose(np.asarray(jtj16), np.asarray(jtj32),
                               atol=2e-2 * scale)
    np.testing.assert_allclose(np.asarray(sq16), np.asarray(sq32), rtol=1e-5)

    opts = SolverOptions(max_iterations=20, regularization=1e-6,
                         energy_from_residual=True)
    res = solve_ik(fn16, x, None, opts, method="levenberg_marquardt")
    # the bf16 NE perturbs steps, not the residual/energy: the solve must
    # still reach the marker bar on this noise level
    assert float(jnp.median(res.error)) < 1e-5


def test_cg_linear_solver_matches_cholesky():
    """The matrix-free CG path (SparseGaussNewtonSolver analog,
    gauss_newton_solver_sparse.h:50-90) computes the same damped GN step as
    the dense normal equations when CG runs to convergence."""
    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.normal(0, 1, (12, 5)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 1, (12,)), jnp.float32)

    def residual(x):
        return A @ x - b

    def energy(x):
        r = residual(x)
        return jnp.sum(r * r)

    x0 = jnp.zeros(5)
    res_c = solve_gauss_newton(residual, energy, x0,
                               options=SolverOptions(max_iterations=8))
    res_cg = solve_gauss_newton(residual, energy, x0,
                                options=SolverOptions(max_iterations=8,
                                                      linear_solver="cg",
                                                      cg_iterations=32,
                                                      cg_tol=1e-9))
    np.testing.assert_allclose(np.asarray(res_c.params),
                               np.asarray(res_cg.params), atol=2e-4)
    # enabled-mask semantics: frozen parameters stay at x0 exactly
    mask = jnp.asarray([1, 1, 0, 1, 0], jnp.float32)
    res_m = solve_gauss_newton(residual, energy, x0, enabled_mask=mask,
                               options=SolverOptions(max_iterations=8,
                                                     linear_solver="cg"))
    assert float(res_m.params[2]) == 0.0 and float(res_m.params[4]) == 0.0

    # batched: each element runs its own CG (per-element inner products)
    x0b = jnp.asarray(rng.normal(0, 0.1, (4, 5)), jnp.float32)

    def residual_b(x):
        return jnp.einsum("rp,...p->...r", A, x) - b

    def energy_b(x):
        r = residual_b(x)
        return jnp.sum(r * r, axis=-1)

    res_b = solve_gauss_newton(residual_b, energy_b, x0b,
                               options=SolverOptions(max_iterations=8,
                                                     linear_solver="cg"))
    for i in range(4):
        np.testing.assert_allclose(np.asarray(res_b.params[i]),
                                   np.asarray(res_c.params), atol=5e-4)


def test_sparse_gn_high_dim_blendshape():
    """P≈1000 synthetic blendshape rig solved matrix-free — the workload the
    reference routes to SparseGaussNewtonSolverT (sparse JᵀJ + SimplicialLLT;
    gauss_newton_solver_sparse.h:50-90). CG fits ~990 blendshape coefficients
    + pose through the vertex-position residual without ever materializing a
    P×P system, and matches the dense-Cholesky optimum of the identical
    damped problem."""
    from momentum_tpu.character.blend_shape import BlendShape
    from momentum_tpu.errors.vertex import VertexPositionErrorFunction
    from momentum_tpu.solver.solvers import SparseGaussNewtonSolver

    char0 = create_test_character(4)
    rng = np.random.default_rng(11)
    v = char0.mesh.vertices.shape[0]
    k = 1000 - char0.num_model_parameters  # → P = 1000 exactly
    basis = rng.normal(0, 0.02, (k, v, 3)).astype(np.float32)
    bs = BlendShape(base_shape=char0.mesh.vertices,
                    shape_vectors=jnp.asarray(basis))
    char = char0.with_blend_shape(bs)
    p = char.num_model_parameters
    assert p == 1000

    gt = np.zeros(p, np.float32)
    gt[char0.num_model_parameters:] = rng.normal(0, 0.3, k)
    gt = jnp.asarray(gt)

    ef0 = VertexPositionErrorFunction.create(np.arange(v), np.zeros((v, 3)))
    reg = ModelParametersErrorFunction.create(np.zeros(p), weight=1e-4)
    fn_t = SkeletonSolverFunction(char, (ef0,))
    target = fn_t.context(gt).mesh_vertices

    ef = VertexPositionErrorFunction.create(np.arange(v), np.asarray(target))
    fn = SkeletonSolverFunction(char, (ef, reg))
    opts = SolverOptions(max_iterations=10, regularization=1e-5,
                         energy_from_residual=True, cg_iterations=200,
                         cg_tol=1e-8)

    sol = SparseGaussNewtonSolver(fn, opts)
    assert sol.options.linear_solver == "cg"
    x = sol.solve(jnp.zeros(p))
    # judge the vertex FIT alone — the total energy floor is the (wanted)
    # tradeoff against the L2 regularizer on the underdetermined basis
    fn_v = SkeletonSolverFunction(char, (ef,))
    e_cg = float(fn_v.error(jnp.asarray(x)))
    e0 = float(fn_v.error(jnp.zeros(p)))
    assert e_cg < 1e-5 * e0  # the fit actually lands

    # the damped problem is identical → dense Cholesky lands on the same
    # vertex fit (params may differ along the basis null space; compare
    # through the forward model)
    res_d = solve_ik(fn, jnp.zeros(p), None,
                     dataclasses.replace(opts, linear_solver="cholesky"))
    v_cg = fn.context(jnp.asarray(x)).mesh_vertices
    v_d = fn.context(res_d.params).mesh_vertices
    np.testing.assert_allclose(np.asarray(v_cg), np.asarray(v_d), atol=1e-3)
