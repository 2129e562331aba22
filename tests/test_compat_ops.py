"""pymomentum-parity array-op tests (reference surface:
pymomentum/geometry/geometry_pybind.cpp:1003-1530)."""

import dataclasses as dc

import jax.numpy as jnp
import numpy as np

import momentum_tpu.compat as C
from momentum_tpu.testing.fixtures import create_test_character


def _rng():
    return np.random.default_rng(12345)


def test_find_closest_points_plain_and_maxdist():
    rng = _rng()
    src = rng.normal(0, 1, (8, 3)).astype(np.float32)
    tgt = rng.normal(0, 1, (20, 3)).astype(np.float32)
    pts, idx, valid = C.find_closest_points(src, tgt)
    brute = np.linalg.norm(src[:, None] - tgt[None], axis=-1).argmin(1)
    np.testing.assert_array_equal(np.asarray(idx), brute)
    assert bool(jnp.all(valid))
    # max_dist excludes
    pts, idx, valid = C.find_closest_points(src + 100.0, tgt, max_dist=1.0)
    assert (np.asarray(idx) == -1).all()
    assert not bool(jnp.any(valid))
    np.testing.assert_allclose(np.asarray(pts), 0.0)


def test_find_closest_points_normal_filter():
    """Front/back disambiguation: with opposed normals the nearer but
    normal-incompatible target is rejected (geometry_pybind.cpp:1461-1481)."""
    src = np.asarray([[0.0, 0.0, 0.0]], np.float32)
    ns = np.asarray([[0.0, 0.0, 1.0]], np.float32)
    tgt = np.asarray([[0.1, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
    nt = np.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]], np.float32)
    _, idx, valid = C.find_closest_points(src, tgt, normals_source=ns,
                                          normals_target=nt)
    assert int(idx[0]) == 1  # nearer target 0 rejected by its normal
    # without normals the nearer one wins
    _, idx, _ = C.find_closest_points(src, tgt)
    assert int(idx[0]) == 0


def test_find_closest_points_on_mesh():
    char = create_test_character(4)
    src = np.asarray([[0.0, 0.5, 0.4]], np.float32)
    valid, pts, fi, bary = C.find_closest_points_on_mesh(
        src, char.mesh.vertices, char.mesh.faces)
    assert bool(valid[0]) and int(fi[0]) >= 0
    np.testing.assert_allclose(float(jnp.sum(bary[0])), 1.0, atol=1e-4)
    # the mesh lies in the z=0 plane: closest point has z == 0
    np.testing.assert_allclose(float(pts[0, 2]), 0.0, atol=1e-5)


def test_compute_vertex_normals_flat_mesh():
    char = create_test_character(4)
    n = np.asarray(C.compute_vertex_normals(char.mesh.vertices,
                                            char.mesh.faces))
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-5)


def test_replace_rest_mesh():
    char = create_test_character(4)
    v2 = np.asarray(char.mesh.vertices) + 0.5
    c2 = C.replace_rest_mesh(char, v2)
    np.testing.assert_allclose(np.asarray(c2.mesh.vertices), v2, atol=1e-6)
    try:
        C.replace_rest_mesh(char, v2[:-1])
        raise AssertionError("topology change must raise")
    except ValueError:
        pass


def test_map_model_parameters_by_name():
    char = create_test_character(4)
    rng = _rng()
    x = rng.normal(0, 1, (3, char.num_model_parameters)).astype(np.float32)
    # target: same params reversed + one unknown
    pt = char.parameter_transform
    rev = dc.replace(pt, names=tuple(reversed(pt.names)))
    tgt_char = dc.replace(char, parameter_transform=rev)
    mapped = np.asarray(C.map_model_parameters(x, char, tgt_char))
    np.testing.assert_allclose(mapped, x[:, ::-1], atol=1e-6)


def test_map_joint_parameters_by_name():
    char = create_test_character(4)
    rng = _rng()
    jp = rng.normal(0, 1, (char.skeleton.num_joints * 7)).astype(np.float32)
    mapped = np.asarray(C.map_joint_parameters(jp, char, char))
    np.testing.assert_allclose(mapped, jp, atol=1e-6)


def test_local_skeleton_state_round_trip():
    char = create_test_character(4)
    rng = _rng()
    x = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters),
                    jnp.float32)
    ls = C.model_parameters_to_local_skeleton_state(char, x)
    jp = C.local_skeleton_state_to_joint_parameters(char, ls)
    np.testing.assert_allclose(np.asarray(jp),
                               np.asarray(C.apply_parameter_transform(char, x)),
                               atol=1e-5)


def test_strip_lower_body_vertices():
    """Branching rig: spine0's ancestors + descendants survive, the hip/leg
    branches are stripped (momentum_geometry.cpp:480-524)."""
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character()
    stripped = C.strip_lower_body_vertices(char)  # finds "spine0" by name
    assert 0 < stripped.mesh.num_vertices < char.mesh.num_vertices
    # the kept vertex set is exactly the one dominated by upper-body joints
    names = char.skeleton.joint_names
    parent = np.asarray(char.skeleton.joint_parent)
    root = names.index("spine0")
    keep = np.zeros(len(names), bool)
    cur = root
    while cur >= 0:
        keep[cur] = True
        cur = parent[cur]
    for j in range(len(names)):
        cur = j
        while cur >= 0 and cur != root:
            cur = parent[cur]
        if cur == root:
            keep[j] = True
    kept = C.bones_to_vertices(char, np.nonzero(keep)[0])
    assert stripped.mesh.num_vertices == int(kept.sum())
