"""pymomentum.geometry class-member parity added in round 2's sweep:
ParameterTransform properties/methods (parameter_transform_pybind.cpp:
176-244), InverseParameterTransform, SkinWeights dense round trips
(skin_weights_pybind.cpp), ParameterLimit.create_* constructors
(limit_pybind.cpp:165-336), GltfBuilder add_mesh/to_bytes."""

import numpy as np
import pytest

import jax.numpy as jnp

from momentum_tpu.character.limits import (
    concat_limits,
    create_ellipsoid,
    create_halfplane,
    create_linear,
    create_linear_joint,
    create_minmax,
    create_minmax_joint,
)
from momentum_tpu.character.parameter_transform import (
    InverseParameterTransform,
    ParameterTransform,
)
from momentum_tpu.character.skinning import SkinWeights
from momentum_tpu.testing.fixtures import create_test_character


@pytest.fixture
def pt():
    tf = np.zeros((2 * 7, 5), np.float32)
    tf[0, 0] = 1.0   # root_tx ← p0
    tf[3, 1] = 1.0   # joint0 rx ← p1
    tf[7 + 6, 2] = 1.0  # joint1 scale ← p2
    tf[7 + 3, 3] = 0.5  # joint1 rx ← p3
    return ParameterTransform(
        transform=jnp.asarray(tf), offsets=jnp.zeros(14),
        names=("root_tx", "hips_rx", "scale_leg", "arm_rx", "blend_0"))


class TestParameterTransformSurface:
    def test_all_no_size(self, pt):
        assert pt.size == 5
        assert pt.all_parameters.all() and not pt.no_parameters.any()

    def test_name_convention_masks(self, pt):
        np.testing.assert_array_equal(
            pt.scaling_parameters, [False, False, True, False, False])
        np.testing.assert_array_equal(
            pt.rigid_parameters, [True, True, False, False, False])
        np.testing.assert_array_equal(
            pt.blend_shape_parameters, [False, False, False, False, True])
        # pose = all minus scaling/blendshape/face
        np.testing.assert_array_equal(
            pt.pose_parameters, [True, True, False, True, False])

    def test_find_parameters(self, pt):
        m = pt.find_parameters(["arm_rx", "root_tx"])
        np.testing.assert_array_equal(m, [True, False, False, True, False])
        with pytest.raises(ValueError):
            pt.find_parameters(["nope"])
        assert not pt.find_parameters(["nope"], allow_missing=True).any()

    def test_parameters_for_joints(self, pt):
        np.testing.assert_array_equal(
            pt.parameters_for_joints([0]), [True, True, False, False, False])
        np.testing.assert_array_equal(
            pt.parameters_for_joints([1]), [False, False, True, True, False])

    def test_parameter_sets(self, pt):
        pt2 = pt.add_parameter_set("arm", np.asarray([0, 0, 0, 1, 0], bool))
        np.testing.assert_array_equal(
            pt2.parameter_set("arm"), [False, False, False, True, False])
        # original untouched (frozen pytree semantics)
        assert "arm" not in pt.parameter_sets

    def test_inverse_round_trip(self, pt):
        inv = pt.inverse()
        assert isinstance(inv, InverseParameterTransform)
        theta = jnp.asarray([0.3, -0.2, 0.5, 0.1, 0.0])
        jp = pt.apply(theta)
        theta2 = inv.apply(jp)
        # p4 (blend_0) drives no joints → unrecoverable, stays 0
        np.testing.assert_allclose(np.asarray(theta2)[:4],
                                   np.asarray(theta)[:4], atol=1e-5)


class TestSkinWeightsSurface:
    def test_dense_round_trip(self):
        d = np.zeros((3, 5), np.float32)
        d[0, 1], d[0, 3] = 0.7, 0.3
        d[1, 0] = 1.0
        d[2, 2], d[2, 4] = 0.5, 0.5
        sw = SkinWeights.from_dense(d)
        np.testing.assert_allclose(sw.to_dense(5), d, atol=1e-6)
        assert sw.num_joints == 5
        assert sw.max_influences_per_vertex == 8

    def test_from_dense_threshold_and_cap(self):
        d = np.zeros((1, 12), np.float32)
        d[0] = np.linspace(0.01, 0.12, 12)
        sw = SkinWeights.from_dense(d, weight_threshold=0.05,
                                    max_influences=4)
        w = np.asarray(sw.weight)[0]
        assert (w[:4] > 0).all() and (w[4:] == 0).all()
        # kept weights renormalized to 1, sorted descending
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
        assert (np.diff(w[:4]) <= 1e-7).all()

    def test_normalize_weights(self):
        sw = SkinWeights(index=jnp.zeros((2, 8), jnp.int32),
                         weight=jnp.asarray(np.concatenate(
                             [np.full((1, 8), 0.25, np.float32),
                              np.zeros((1, 8), np.float32)])))
        n = sw.normalize_weights()
        np.testing.assert_allclose(float(jnp.sum(n.weight[0])), 1.0, atol=1e-6)
        assert float(jnp.sum(n.weight[1])) == 0.0

    def test_to_dense_validation(self):
        sw = SkinWeights.from_dense(np.eye(3, dtype=np.float32))
        with pytest.raises(ValueError):
            sw.to_dense(0)
        with pytest.raises(ValueError):
            sw.to_dense(2)


class TestLimitConstructors:
    def test_each_type_one_record(self):
        lims = [
            create_minmax(2, -1.0, 1.0, 2.0),
            create_minmax_joint(1, 3, -0.5, 0.5, passive=True),
            create_linear(0, 1, 2.0, 0.1, range_min=-1.0, range_max=1.0),
            create_linear_joint(0, 3, 1, 3, 1.0, 0.0),
            create_halfplane(0, 1, (1.0, 0.0), 0.5),
            create_ellipsoid(2, 1, [0.0, 0.0, 0.0], np.eye(4)),
        ]
        total = lims[0]
        for l in lims[1:]:
            total = concat_limits(total, l)
        assert all(v == 1 for v in total.counts.values())

    def test_minmax_values(self):
        l = create_minmax(2, -1.0, 1.0, 2.0)
        assert int(np.asarray(l.minmax_index)[0]) == 2
        np.testing.assert_allclose(np.asarray(l.minmax_bounds)[0], [-1.0, 1.0])
        assert float(np.asarray(l.minmax_weight)[0]) == 2.0

    def test_linear_default_range_is_unbounded(self):
        l = create_linear(0, 1, 2.0, 0.1)
        r = np.asarray(l.linear_range)[0]
        assert r[0] < -1e38 and r[1] > 1e38

    def test_linear_joint_flat_indices(self):
        l = create_linear_joint(2, 4, 3, 5, 1.0, 0.0)
        assert int(np.asarray(l.linear_joint_ref)[0]) == 2 * 7 + 4
        assert int(np.asarray(l.linear_joint_tgt)[0]) == 3 * 7 + 5


class TestGltfBuilderExtras:
    def test_add_mesh_and_to_bytes(self, tmp_path):
        from momentum_tpu.io import GltfBuilder, load_all_characters_glb

        b = GltfBuilder()
        b.add_character(create_test_character(3), name="hero")
        b.add_mesh(np.random.default_rng(0).normal(size=(9, 3)),
                   [[0, 1, 2], [3, 4, 5]], name="prop")
        data = b.to_bytes()
        assert data[:4] == b"glTF"
        p = tmp_path / "multi.glb"
        p.write_bytes(data)
        entries = load_all_characters_glb(p)
        names = [e[0] for e in entries]
        assert names == ["hero", "prop"]
        prop_char = entries[1][1]
        assert prop_char.mesh is not None
        assert prop_char.mesh.n_vertices == 9


class TestMppcaSurface:
    """Mppca.get_mixture / save / to_bytes / load / from_bytes
    (geometry_pybind.cpp:440-460, momentum_geometry.cpp:526-583)."""

    def _model(self):
        from momentum_tpu.errors.pose_prior import Mppca

        rng = np.random.default_rng(0)
        d, k, q = 6, 2, 3
        pi = np.asarray([0.3, 0.7])
        mu = rng.normal(size=(k, d))
        w_list = [rng.normal(size=(d, q)) * 0.5 for _ in range(k)]
        sigma2 = np.asarray([0.5, 1.5])
        return (Mppca.from_components(
            pi=pi, mu=mu, w_list=w_list, sigma2=sigma2,
            names=tuple(f"p{i}" for i in range(d))), pi, mu, w_list, sigma2)

    def test_get_mixture_recovers_components(self):
        m, pi, mu, w_list, sigma2 = self._model()
        for i in range(2):
            pi_r, mu_r, w_r, s2_r = m.get_mixture(i)
            assert abs(pi_r - pi[i]) < 1e-3
            np.testing.assert_allclose(mu_r, mu[i], atol=1e-5)
            assert abs(s2_r - sigma2[i]) < 1e-3
            # W is recovered up to an orthogonal rotation: compare W·Wᵀ
            np.testing.assert_allclose(w_r @ w_r.T,
                                       w_list[i] @ w_list[i].T, atol=1e-2)

    def test_get_mixture_bounds(self):
        m, *_ = self._model()
        with pytest.raises(IndexError):
            m.get_mixture(5)

    def test_bytes_round_trip(self):
        from momentum_tpu.errors.pose_prior import Mppca

        m, *_ = self._model()
        m2 = Mppca.from_bytes(m.to_bytes())
        np.testing.assert_allclose(np.asarray(m2.mu), np.asarray(m.mu),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2.cinv), np.asarray(m.cinv),
                                   atol=1e-4)


class TestBlendShapeSurface:
    def test_from_tensors_bytes_round_trip(self):
        from momentum_tpu.character.blend_shape import BlendShape

        rng = np.random.default_rng(0)
        bs = BlendShape.from_tensors(rng.normal(size=(10, 3)),
                                     rng.normal(size=(4, 10, 3)))
        bs2 = BlendShape.from_bytes(bs.to_bytes())
        np.testing.assert_allclose(np.asarray(bs2.base_shape),
                                   np.asarray(bs.base_shape), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bs2.shape_vectors),
                                   np.asarray(bs.shape_vectors), atol=1e-6)

    def test_trim_on_load(self, tmp_path):
        from momentum_tpu.character.blend_shape import BlendShape

        rng = np.random.default_rng(1)
        bs = BlendShape.from_tensors(rng.normal(size=(8, 3)),
                                     rng.normal(size=(5, 8, 3)))
        p = tmp_path / "b.bin"
        bs.save(p)
        bs2 = BlendShape.load(p, num_expected_shapes=2)
        assert bs2.num_shapes == 2
