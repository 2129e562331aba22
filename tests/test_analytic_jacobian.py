"""Analytic-vs-AD Jacobian equivalence (the reference's VALIDATE_IDENTICAL
pattern for SIMD-vs-scalar error functions, error_function_helpers.h:80-93)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import momentum_tpu.errors as E
from momentum_tpu.math.generalized_loss import GeneralizedLoss
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions, solve_ik
from momentum_tpu.testing.fixtures import create_test_character


@pytest.fixture(scope="module")
def char():
    return create_test_character(5)


def _rng():
    return np.random.default_rng(12345)


def _efs(char, rng):
    n = 6
    parents = rng.integers(0, char.num_joints, n)
    offsets = rng.uniform(-0.5, 0.5, (n, 3))
    targets = rng.uniform(-1.5, 1.5, (n, 3))
    weights = rng.uniform(0.5, 2.0, n)
    pos = E.PositionErrorFunction.create(parents, offsets, targets, weights)
    ori = E.OrientationErrorFunction.create(
        rng.integers(0, char.num_joints, 3),
        np.stack([_rand_quat(rng) for _ in range(3)]), weight=2.0)
    reg = E.ModelParametersErrorFunction.create(
        rng.normal(0, 0.1, char.num_model_parameters).astype(np.float32), weight=0.5)
    lim = E.LimitErrorFunction.create(weight=1.5)
    d = char.num_model_parameters
    prior = E.Mppca.from_components(
        np.ones(2) / 2, rng.uniform(-0.2, 0.2, (2, d)),
        [rng.normal(size=(d, 2)) * 0.3 for _ in range(2)],
        rng.uniform(0.05, 0.2, 2), names=tuple(char.parameter_transform.names))
    pp = E.PosePriorErrorFunction.create(prior, char.parameter_transform.names, weight=2.0)
    return (pos, ori, reg, lim, pp)


def _rand_quat(rng):
    v = rng.normal(size=4)
    return (v / np.linalg.norm(v)).astype(np.float32)


def test_analytic_matches_ad(char):
    rng = _rng()
    fn = SkeletonSolverFunction(char, _efs(char, rng))
    assert fn.fully_analytic
    x = jnp.asarray(rng.uniform(-0.4, 0.4, char.num_model_parameters), jnp.float32)

    rows_a, j_a = fn.residual_and_jacobian(x)
    rows_ad = fn.residual(x)
    j_ad = jax.jacfwd(fn.residual)(x)

    np.testing.assert_allclose(np.asarray(rows_a), np.asarray(rows_ad), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_a), np.asarray(j_ad), atol=2e-4)


def test_analytic_matches_ad_robust_loss(char):
    rng = _rng()
    n = 5
    ef = E.PositionErrorFunction.create(
        rng.integers(0, char.num_joints, n), rng.uniform(-0.5, 0.5, (n, 3)),
        rng.uniform(-1, 1, (n, 3)), loss=GeneralizedLoss(alpha=0.0, c=0.7))
    fn = SkeletonSolverFunction(char, (ef,))
    x = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
    rows_a, j_a = fn.residual_and_jacobian(x)
    np.testing.assert_allclose(np.asarray(rows_a), np.asarray(fn.residual(x)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_a), np.asarray(jax.jacfwd(fn.residual)(x)),
                               atol=2e-4)


def test_mixed_analytic_and_ad(char):
    """Modules without an analytic path fall back to AD within one assembly."""
    rng = _rng()
    pos = E.PositionErrorFunction.create(
        rng.integers(0, char.num_joints, 4), rng.uniform(-0.5, 0.5, (4, 3)),
        rng.uniform(-1, 1, (4, 3)))
    # logmap state error has no analytic path (falls back to AD)
    theta_t = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
    state_ef = E.StateErrorFunction.create(
        char.skeleton_states(theta_t), rotation_error_type="logmap")
    fn = SkeletonSolverFunction(char, (pos, state_ef))
    assert not fn.fully_analytic
    x = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
    rows, j = fn.residual_and_jacobian(x)
    # same row content in (possibly reordered) concatenation: compare JᵀJ/Jᵀr
    j_ad = jax.jacfwd(fn.residual)(x)
    r_ad = fn.residual(x)
    np.testing.assert_allclose(np.asarray(j.T @ rows), np.asarray(j_ad.T @ r_ad), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j.T @ j), np.asarray(j_ad.T @ j_ad), atol=2e-4)


def _unit(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_solve_ik_uses_analytic_and_converges(char):
    rng = _rng()
    theta_star = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
    targets = char.locators.world_positions(char.skeleton_states(theta_star))
    ef = E.PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(targets))
    fn = SkeletonSolverFunction(char, (ef,))
    assert fn.fully_analytic
    res = solve_ik(fn, jnp.zeros(char.num_model_parameters),
                   options=SolverOptions(max_iterations=40, regularization=1e-5))
    assert float(res.error) < 1e-6


def test_batched_native_solve_matches_vmapped(char):
    """Batch-native LM (no vmap: batched analytic Jacobians + batched linalg,
    the Pallas-FK-compatible path) must match the vmapped solve."""
    import dataclasses
    from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt

    rng = _rng()
    b = 3
    thetas = jnp.asarray(rng.uniform(-0.3, 0.3, (b, char.num_model_parameters)),
                         jnp.float32)
    states = jax.vmap(char.skeleton_states)(thetas)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef0 = E.PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    opts = SolverOptions(max_iterations=10, regularization=1e-4,
                         energy_from_residual=True)
    x0 = jnp.zeros(char.num_model_parameters)

    # vmapped reference
    def one(t):
        ef = dataclasses.replace(ef0, target=t)
        fn = SkeletonSolverFunction(char, (ef,))
        return solve_levenberg_marquardt(
            fn.residual, fn.error, x0, options=opts,
            jacobian_fn=fn.residual_and_jacobian)

    ref = jax.vmap(one)(targets)

    # batch-native
    ef_b = dataclasses.replace(ef0, target=targets)
    fn_b = SkeletonSolverFunction(char, (ef_b,))
    res = solve_levenberg_marquardt(
        fn_b.residual, fn_b.error, jnp.broadcast_to(x0, (b,) + x0.shape),
        options=opts, jacobian_fn=fn_b.residual_and_jacobian)

    np.testing.assert_allclose(np.asarray(res.params), np.asarray(ref.params),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.error), np.asarray(ref.error),
                               rtol=1e-3, atol=1e-9)


def test_fused_model_jacobian_matches_blockwise():
    """prefer_fused reassociates the chain rule into MXU matmuls; it must
    produce the same (rows, J) as the blockwise path."""
    import dataclasses as dc

    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character()
    rng = np.random.default_rng(0)
    b, p = 3, char.num_model_parameters
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (b, p)), jnp.float32)
    targets = jax.vmap(char.locators.world_positions)(
        jax.vmap(char.skeleton_states)(gt))
    ef = dc.replace(
        PositionErrorFunction.create(
            np.asarray(char.locators.parent),
            np.asarray(char.locators.offset),
            np.zeros((char.locators.num_locators, 3))),
        target=targets)
    x = gt + 0.05 * jnp.asarray(rng.normal(0, 1, (b, p)), jnp.float32)
    fn_b = SkeletonSolverFunction(char, (ef,), prefer_fused=False)
    fn_f = SkeletonSolverFunction(char, (ef,), prefer_fused=True)
    rb, jb = fn_b.residual_and_jacobian(x)
    rf, jf = fn_f.residual_and_jacobian(x)
    np.testing.assert_allclose(np.asarray(rb), np.asarray(rf), atol=1e-6)
    scale = np.abs(np.asarray(jb)).max()
    np.testing.assert_allclose(np.asarray(jf) / scale, np.asarray(jb) / scale,
                               atol=2e-6)


def test_batched_blockwise_jacobians_orientation_state_geometric():
    """Batch-native residual_and_jacobian must match per-element AD for the
    orientation/state/joint-pair/geometric blockwise jacobians (regression:
    these collapsed the batch axis into rows)."""
    import dataclasses as dc

    from momentum_tpu.errors import (
        AimDirErrorFunction, JointToJointPositionErrorFunction,
        OrientationErrorFunction, StateErrorFunction,
    )
    from momentum_tpu.math import skel_state as ss
    from momentum_tpu.solver import SkeletonSolverFunction
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(5)
    rng = np.random.default_rng(0)
    p = char.num_model_parameters
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (3, p)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    _, q, _ = ss.split(states)

    ori0 = OrientationErrorFunction.create(
        np.arange(5, dtype=np.int32), np.asarray(q[0]))
    st0 = StateErrorFunction.create(np.asarray(states[0]))
    j2j0 = JointToJointPositionErrorFunction.create(
        source=[4], reference=[1], source_offset=np.zeros((1, 3)),
        reference_offset=np.zeros((1, 3)), target=np.zeros((1, 3)))
    aim0 = AimDirErrorFunction.create(
        parent=[3], local_point=np.zeros((1, 3)),
        local_dir=np.asarray([[1.0, 0, 0]]),
        target=np.asarray([[0.0, 1.0, 0.0]]))
    def bcast(x):
        return jnp.broadcast_to(x, (3,) + x.shape)

    # only the float targets batch; constraint topology stays shared
    batched = (
        dc.replace(ori0, target=q),
        dc.replace(st0, target_state=states),
        dc.replace(j2j0, target=bcast(j2j0.target)),
        dc.replace(aim0, target=bcast(aim0.target)),
    )
    single = (ori0, st0, j2j0, aim0)
    fn = SkeletonSolverFunction(char, batched)
    x = gt + 0.1 * jnp.asarray(rng.normal(0, 1, (3, p)), jnp.float32)
    rb, jb = fn.residual_and_jacobian(x)
    assert rb.shape[0] == 3 and jb.shape[0] == 3
    for i in range(3):
        efs_i = (dc.replace(ori0, target=q[i]),
                 dc.replace(st0, target_state=states[i]), j2j0, aim0)
        fi = SkeletonSolverFunction(char, efs_i)
        ri = fi.residual(x[i])
        _, jvp = jax.linearize(fi.residual, x[i])
        ji = jax.vmap(jvp)(jnp.eye(p)).T
        np.testing.assert_allclose(np.asarray(rb[i]), np.asarray(ri),
                                   atol=1e-5)
        m = max(np.abs(np.asarray(ji)).max(), 1e-9)
        np.testing.assert_allclose(np.asarray(jb[i]) / m,
                                   np.asarray(ji) / m, atol=1e-4)


def test_vertex_position_analytic_jacobian():
    """LBS skinning-walk vertex Jacobian == AD, including blendshape and
    face-expression columns (skeleton_derivative vertex paths)."""
    import dataclasses as dc

    from momentum_tpu.character.blend_shape import BlendShape
    from momentum_tpu.character.utility import (
        add_blend_shape_parameters, add_face_expression_parameters,
    )
    from momentum_tpu.errors import VertexPositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(5)
    v = char.mesh.num_vertices
    rng = np.random.default_rng(0)
    body = BlendShape(base_shape=char.mesh.vertices,
                      shape_vectors=jnp.asarray(
                          rng.normal(0, 0.05, (3, v, 3)).astype(np.float32)))
    face = BlendShape(base_shape=jnp.zeros((v, 3)),
                      shape_vectors=jnp.asarray(
                          rng.normal(0, 0.05, (2, v, 3)).astype(np.float32)))
    char = add_face_expression_parameters(
        add_blend_shape_parameters(char, body), face)
    p = char.num_model_parameters
    vid = np.arange(0, v, 3, dtype=np.int32)
    ef = VertexPositionErrorFunction.create(
        vid, rng.normal(0, 1, (len(vid), 3)).astype(np.float32))
    fn = SkeletonSolverFunction(char, (ef,))
    assert fn.fully_analytic
    x = jnp.asarray(rng.normal(0, 0.2, p), jnp.float32)
    rows, J = fn.residual_and_jacobian(x)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(fn.residual(x)),
                               atol=1e-6)
    _, jvp = jax.linearize(fn.residual, x)
    J_ad = jax.vmap(jvp)(jnp.eye(p)).T
    m = np.abs(np.asarray(J_ad)).max()
    np.testing.assert_allclose(np.asarray(J) / m, np.asarray(J_ad) / m,
                               atol=2e-5)
    # batch-native shape
    xb = jnp.asarray(rng.normal(0, 0.2, (2, p)), jnp.float32)
    rb, jb = fn.residual_and_jacobian(xb)
    assert rb.shape[0] == 2 and jb.shape[0] == 2


def test_vertex_plane_analytic_jacobian():
    from momentum_tpu.errors import VertexPlaneErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(5)
    v = char.mesh.num_vertices
    rng = np.random.default_rng(1)
    vid = np.arange(0, v, 4, dtype=np.int32)
    nrm = rng.normal(0, 1, (len(vid), 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    for above in (False, True):
        ef = VertexPlaneErrorFunction.create(
            vid, rng.normal(0, 0.5, (len(vid), 3)).astype(np.float32),
            nrm.astype(np.float32), above=above)
        fn = SkeletonSolverFunction(char, (ef,))
        assert fn.fully_analytic
        x = jnp.asarray(rng.normal(0, 0.2, char.num_model_parameters),
                        jnp.float32)
        rows, J = fn.residual_and_jacobian(x)
        np.testing.assert_allclose(np.asarray(rows),
                                   np.asarray(fn.residual(x)), atol=1e-6)
        _, jvp = jax.linearize(fn.residual, x)
        J_ad = jax.vmap(jvp)(jnp.eye(char.num_model_parameters)).T
        m = max(np.abs(np.asarray(J_ad)).max(), 1e-9)
        np.testing.assert_allclose(np.asarray(J) / m, np.asarray(J_ad) / m,
                                   atol=3e-5)


def _vertex_char(rng):
    char = create_test_character(5)
    return char, char.mesh.num_vertices


def test_vertex_projection_analytic_jacobian():
    """Exact pinhole chain rule over the LBS walk == AD."""
    from momentum_tpu.errors import VertexProjectionErrorFunction

    char, v = _vertex_char(np.random.default_rng(0))
    rng = np.random.default_rng(0)
    p = char.num_model_parameters
    vid = np.arange(0, v, 4, dtype=np.int32)
    # cameras looking at the mesh from +z at distance ~5
    proj = np.zeros((len(vid), 3, 4), np.float32)
    proj[:, 0, 0] = proj[:, 1, 1] = 500.0
    proj[:, 2, 2] = 1.0
    proj[:, 2, 3] = 6.0  # keep z > near_clip
    tgt = rng.normal(0, 50, (len(vid), 2)).astype(np.float32)
    ef = VertexProjectionErrorFunction.create(vid, proj, tgt)
    fn = SkeletonSolverFunction(char, (ef,))
    assert fn.fully_analytic
    x = jnp.asarray(rng.normal(0, 0.2, p), jnp.float32)
    rows, J = fn.residual_and_jacobian(x)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(fn.residual(x)),
                               atol=1e-5)
    _, jvp = jax.linearize(fn.residual, x)
    J_ad = jax.vmap(jvp)(jnp.eye(p)).T
    m = np.abs(np.asarray(J_ad)).max()
    np.testing.assert_allclose(np.asarray(J) / m, np.asarray(J_ad) / m,
                               atol=2e-5)


def test_vertex_normal_analytic_jacobian():
    """Frozen-normal point-to-plane rows: exact vs AD when the source-normal
    weight is 0 (the normal is then θ-independent); with a blended normal the
    analytic path is the GN frozen-normal approximation — verify it still
    DRIVES THE SOLVE to the AD path's optimum."""
    import dataclasses as dc

    from momentum_tpu.errors import VertexNormalErrorFunction

    char, v = _vertex_char(np.random.default_rng(0))
    rng = np.random.default_rng(1)
    p = char.num_model_parameters
    vid = np.arange(0, v, 4, dtype=np.int32)
    nrm = rng.normal(0, 1, (len(vid), 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    tgt = rng.normal(0, 0.5, (len(vid), 3)).astype(np.float32)
    ef = VertexNormalErrorFunction.create(
        vid, tgt, nrm, source_normal_weight=0.0, target_normal_weight=1.0)
    fn = SkeletonSolverFunction(char, (ef,))
    assert fn.fully_analytic
    x = jnp.asarray(rng.normal(0, 0.2, p), jnp.float32)
    rows, J = fn.residual_and_jacobian(x)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(fn.residual(x)),
                               atol=1e-6)
    _, jvp = jax.linearize(fn.residual, x)
    J_ad = jax.vmap(jvp)(jnp.eye(p)).T
    m = max(np.abs(np.asarray(J_ad)).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(J) / m, np.asarray(J_ad) / m,
                               atol=2e-5)

    # blended normal: analytic (frozen-normal) solve reaches the same energy
    ef_mix = VertexNormalErrorFunction.create(
        vid, tgt, nrm, source_normal_weight=0.5, target_normal_weight=0.5)
    fn_mix = SkeletonSolverFunction(char, (ef_mix,))
    opts = SolverOptions(max_iterations=30, regularization=1e-5)
    res = solve_ik(fn_mix, jnp.zeros(p), None, opts,
                   method="levenberg_marquardt")
    # AD path (force it by dropping the analytic flag through the base class)
    from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt
    res_ad = solve_levenberg_marquardt(fn_mix.residual, fn_mix.error,
                                       jnp.zeros(p), options=opts)
    assert float(fn_mix.error(res.params)) <= \
        float(fn_mix.error(res_ad.params)) * 1.2 + 1e-8


def test_collision_analytic_jacobian():
    """Frozen-(s,t) capsule-pair rows == AD for uniform radii (envelope
    theorem at the closest-point minimizer). A folding two-bone arm
    guarantees an ACTIVE overlap (the fixture's chain rarely collides)."""
    import dataclasses as dc

    from momentum_tpu.character import CollisionGeometry
    from momentum_tpu.errors import CollisionErrorFunction
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(4)
    nj = char.num_joints
    # capsules along +Y on joints 1 and 3 (same local frame as the fixture)
    cap_tf = np.zeros((2, 8), np.float32)
    cap_tf[:, 5] = np.sin(np.pi / 4)
    cap_tf[:, 6] = np.cos(np.pi / 4)
    cap_tf[:, 7] = 1.0
    collision = CollisionGeometry(
        parent=jnp.asarray([1, 3], jnp.int32),
        transform=jnp.asarray(cap_tf),
        radius=jnp.full((2, 2), 0.3, jnp.float32),  # uniform radii
        length=jnp.full((2,), 0.8, jnp.float32))
    char = dc.replace(char, collision=collision)
    ef = CollisionErrorFunction.create(char)
    assert ef.pair_a.shape[0] >= 1
    fn = SkeletonSolverFunction(char, (ef,))
    assert fn.fully_analytic
    rng = np.random.default_rng(2)
    p = char.num_model_parameters
    # fold the chain back on itself until the two capsules overlap
    x = None
    for _ in range(200):
        cand = jnp.asarray(rng.normal(0, 1.2, p), jnp.float32)
        if float(fn.error(cand)) > 1e-10:
            x = cand
            break
    assert x is not None, "no overlapping pose found"
    rows, J = fn.residual_and_jacobian(x)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(fn.residual(x)),
                               atol=1e-6)
    _, jvp = jax.linearize(fn.residual, x)
    J_ad = jax.vmap(jvp)(jnp.eye(p)).T
    m = max(np.abs(np.asarray(J_ad)).max(), 1e-9)
    np.testing.assert_allclose(np.asarray(J) / m, np.asarray(J_ad) / m,
                               atol=5e-4)


def test_sdf_analytic_jacobians():
    """∇φ-chained SDF rows == AD (trilinear gradient is exactly AD's)."""
    from momentum_tpu.axel.sdf import SignedDistanceField
    from momentum_tpu.errors import SdfCollisionErrorFunction, VertexSdfErrorFunction

    char, v = _vertex_char(np.random.default_rng(0))
    rng = np.random.default_rng(3)
    p = char.num_model_parameters
    grid = rng.normal(0, 1, (8, 8, 8)).astype(np.float32)
    sdf = SignedDistanceField(
        origin=jnp.asarray([-3.0, -3.0, -3.0]),
        spacing=jnp.asarray([1.0, 1.0, 1.0]),
        values=jnp.asarray(grid))
    vid = np.arange(0, v, 5, dtype=np.int32)
    for cls, kw in ((VertexSdfErrorFunction,
                     dict(target_distance=rng.normal(0, 0.3, len(vid)))),
                    (SdfCollisionErrorFunction, dict())):
        ef = cls.create(sdf, vid, **kw)
        fn = SkeletonSolverFunction(char, (ef,))
        assert fn.fully_analytic, cls.__name__
        x = jnp.asarray(rng.normal(0, 0.15, p), jnp.float32)
        rows, J = fn.residual_and_jacobian(x)
        np.testing.assert_allclose(np.asarray(rows),
                                   np.asarray(fn.residual(x)), atol=1e-6)
        _, jvp = jax.linearize(fn.residual, x)
        J_ad = jax.vmap(jvp)(jnp.eye(p)).T
        m = max(np.abs(np.asarray(J_ad)).max(), 1e-9)
        np.testing.assert_allclose(np.asarray(J) / m, np.asarray(J_ad) / m,
                                   atol=2e-5, err_msg=cls.__name__)
