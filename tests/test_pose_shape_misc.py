"""PoseShape + utils tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.character.pose_shape import PoseShape
from momentum_tpu.testing.fixtures import create_test_character


def _rng():
    return np.random.default_rng(12345)


class TestPoseShape:
    def test_neutral_at_base(self):
        char = create_test_character(4)
        rng = _rng()
        v = 10
        # choose baseRot so that at the rest pose rel quats are identity?
        # simpler: zero shape vectors except a known column
        base_shape = rng.normal(size=(v, 3)).astype(np.float32)
        sv = np.zeros((v, 3, 2 * 4), np.float32)
        ps = PoseShape(
            base_rot=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
            base_shape=jnp.asarray(base_shape),
            shape_vectors=jnp.asarray(sv),
            base_joint=0,
            joint_map=(1, 2),
        )
        states = char.skeleton_states(jnp.zeros(char.num_model_parameters))
        out = ps.compute(states)
        np.testing.assert_allclose(np.asarray(out), base_shape, atol=1e-6)

    def test_deformation_follows_rotation(self):
        char = create_test_character(4)
        rng = _rng()
        v = 6
        base_shape = np.zeros((v, 3), np.float32)
        sv = rng.normal(size=(v, 3, 4)).astype(np.float32)
        ps = PoseShape(
            base_rot=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
            base_shape=jnp.asarray(base_shape),
            shape_vectors=jnp.asarray(sv),
            base_joint=0,
            joint_map=(1,),
        )
        theta0 = jnp.zeros(char.num_model_parameters)
        theta1 = theta0.at[7].set(0.8)  # joint1_rx
        out0 = np.asarray(ps.compute(char.skeleton_states(theta0)))
        out1 = np.asarray(ps.compute(char.skeleton_states(theta1)))
        assert np.abs(out1 - out0).max() > 1e-3  # rotation drives the shape


class TestUtils:
    def test_logging_levels(self):
        from momentum_tpu.utils import get_logger, set_log_level
        lg = get_logger("momentum_tpu.test")
        set_log_level("debug")
        lg.debug("debug message")
        set_log_level("info")

    def test_profile_scope(self):
        from momentum_tpu.utils import profile_scope
        with profile_scope("test"):
            x = jnp.ones(3) + 1
        assert float(x[0]) == 2.0


class TestMeshOps:
    def test_self_intersection_detects(self):
        from momentum_tpu.math.mesh_ops import intersect_mesh_brute_force
        # two separate triangles that cross each other
        verts = np.asarray([
            [0, 0, 0], [2, 0, 0], [0, 2, 0],        # tri A in z=0 plane
            [0.5, 0.5, -1], [0.5, 0.5, 1], [1.5, 0.5, 0.5],  # tri B crossing it
            [10, 10, 10], [11, 10, 10], [10, 11, 10],        # far-away tri C
        ], np.float32)
        faces = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
        pairs = intersect_mesh_brute_force(verts, faces)
        assert (pairs == [0, 1]).all(axis=1).any()
        assert not (pairs[:, 1] == 2).any()

    def test_support_polygon_square(self):
        from momentum_tpu.math.mesh_ops import support_polygon
        rng = np.random.default_rng(0)
        base = np.asarray([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float32)
        high = rng.uniform(0, 1, (10, 3)).astype(np.float32)
        high[:, 1] += 1.0  # above the tolerance
        hull = support_polygon(np.concatenate([base, high]), up_axis=1)
        assert hull.shape == (4, 2)


class TestPallasFK:
    def test_matches_xla_fk(self):
        import jax
        from momentum_tpu.character import fk
        from momentum_tpu.ops.fk_pallas import fk_pallas
        char = create_test_character(8)
        skel = char.skeleton
        rng = _rng()
        jp_arr = jnp.asarray(rng.uniform(-0.5, 0.5, (4, skel.num_joints * 7)),
                             jnp.float32)
        local = jax.vmap(lambda x: fk.local_skel_states(skel, x))(jp_arr)
        ref = jax.vmap(lambda x: fk.global_skel_states(skel, x))(jp_arr)
        out = fk_pallas(skel, local)  # interpreter mode on CPU
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestCompat:
    def test_pymomentum_style_surface(self, tmp_path):
        import jax
        from momentum_tpu import compat
        char = create_test_character(4)
        rng = _rng()
        theta = jnp.asarray(rng.uniform(-0.2, 0.2, char.num_model_parameters), jnp.float32)
        jp_arr = compat.apply_parameter_transform(char, theta)
        assert jp_arr.shape == (char.num_joints * 7,)
        states = compat.model_parameters_to_skeleton_state(char, theta)
        jp2 = compat.skeleton_state_to_joint_parameters(char, states)
        states2 = compat.joint_parameters_to_skeleton_state(char, jp2)
        m = compat.compare_skeleton_states(states, states2)
        assert float(m["max_position_error"]) < 1e-3
        pos = compat.model_parameters_to_positions(char, theta)
        assert pos.shape == (char.locators.num_locators, 3)
        verts = compat.skin_points_from_model_parameters(char, theta)
        assert verts.shape == (char.mesh.num_vertices, 3)
        u = jnp.asarray(rng.uniform(0, 1, char.num_model_parameters), jnp.float32)
        sample = compat.uniform_random_to_model_parameters(char, u)
        assert float(sample[0]) <= 0.1 + 1e-6  # respects the MinMax limit

    def test_obj_export(self, tmp_path):
        from momentum_tpu.io.obj import export_motion_objs, save_obj
        char = create_test_character(4)
        motion = jnp.zeros((2, char.num_model_parameters))
        paths = export_motion_objs(str(tmp_path / "frame"), char, motion)
        assert len(paths) == 2
        text = open(paths[0]).read()
        assert text.count("\nf ") + text.startswith("f ") == char.mesh.faces.shape[0]


class TestCovariance:
    def test_woodbury_matches_dense(self):
        from momentum_tpu.math.covariance import LowRankCovarianceMatrix
        rng = _rng()
        k, n = 3, 12
        a = rng.normal(size=(k, n)).astype(np.float32)
        cov = LowRankCovarianceMatrix.create(0.7, a)
        c = 0.49 * np.eye(n) + a.T @ a
        x = rng.normal(size=n).astype(np.float32)
        np.testing.assert_allclose(np.asarray(cov.times_vec(jnp.asarray(x))),
                                   c @ x, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(cov.inverse_times_vec(jnp.asarray(x))),
                                   np.linalg.solve(c, x), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(float(cov.log_determinant()),
                                   np.linalg.slogdet(c)[1], rtol=1e-4)


class TestTorchInterop:
    def test_fk_forward_and_autograd(self):
        import torch
        import jax
        from momentum_tpu.torch_interop import LinearBlendSkinning, Skeleton
        char = create_test_character(4)
        skel = Skeleton(char)
        rng = _rng()
        x = torch.tensor(rng.uniform(-0.3, 0.3, char.num_model_parameters),
                         dtype=torch.float32, requires_grad=True)
        states = skel(x)
        assert states.shape == (4, 8)
        ((states[..., :3] ** 2).sum()).backward()
        gj = jax.grad(lambda m: (char.skeleton_states(m)[..., :3] ** 2).sum())(
            jnp.asarray(x.detach().numpy()))
        np.testing.assert_allclose(x.grad.numpy(), np.asarray(gj), atol=1e-4)
        v = LinearBlendSkinning(char)(torch.zeros(char.num_model_parameters))
        assert v.shape == (char.mesh.num_vertices, 3)


def test_face_expression_parameters():
    """Separate face-expression basis applied additively on the rest mesh
    (parameter_transform.h:212-215 + character.h faceExpressionBlendShape)."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from momentum_tpu.character.blend_shape import BlendShape
    from momentum_tpu.character.utility import (
        add_blend_shape_parameters, add_face_expression_parameters,
    )
    from momentum_tpu.errors import VertexPositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(4)
    v = char.mesh.num_vertices
    rng = np.random.default_rng(0)
    body = BlendShape(base_shape=char.mesh.vertices,
                      shape_vectors=jnp.asarray(
                          rng.normal(0, 0.1, (2, v, 3)).astype(np.float32)))
    face = BlendShape(base_shape=jnp.zeros((v, 3)),
                      shape_vectors=jnp.asarray(
                          rng.normal(0, 0.1, (3, v, 3)).astype(np.float32)))
    char = add_blend_shape_parameters(char, body)
    char = add_face_expression_parameters(char, face)
    p = char.num_model_parameters
    assert len(char.face_expression_param_index) == 3
    ef = VertexPositionErrorFunction.create(
        np.arange(4), np.zeros((4, 3), np.float32))
    fn = SkeletonSolverFunction(char, (ef,))
    theta = jnp.zeros(p)
    ctx0 = fn.context(theta)
    # driving a face parameter deforms the rest vertices by its basis column
    i = char.face_expression_param_index[1]
    ctx1 = fn.context(theta.at[i].set(0.7))
    delta = np.asarray(ctx1.rest_vertices - ctx0.rest_vertices)
    np.testing.assert_allclose(delta, 0.7 * np.asarray(face.shape_vectors[1]),
                               atol=1e-5)
    # body blend and face expression compose additively
    j = char.blend_shape_param_index[0]
    ctx2 = fn.context(theta.at[i].set(0.7).at[j].set(0.5))
    expect = (0.5 * np.asarray(body.shape_vectors[0])
              + 0.7 * np.asarray(face.shape_vectors[1]))
    np.testing.assert_allclose(
        np.asarray(ctx2.rest_vertices - ctx0.rest_vertices), expect, atol=1e-5)
