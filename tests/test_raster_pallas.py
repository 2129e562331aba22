"""Pallas plane-rasterizer tests (ops/raster_pallas.py).

Reference capability: momentum/rasterizer/rasterizer.h z-buffer semantics.
The kernel runs in interpreter mode on CPU (identical code path to the TPU
compile), compared against the dense `rasterize` formulation which is itself
pinned by tests/test_rasterizer.py. Shapes are kept tiny: interpreter mode
executes the grid serially in Python.
"""

import jax.numpy as jnp
import numpy as np

from momentum_tpu.ops.raster_pallas import rasterize_planes
from momentum_tpu.rasterizer import rasterize


def _random_scene(seed, V=40, F=24, W=128, H=8):
    rng = np.random.default_rng(seed)
    verts = np.zeros((V, 3), np.float32)
    verts[:, 0] = rng.uniform(-10, W + 10, V)
    verts[:, 1] = rng.uniform(-5, H + 5, V)
    verts[:, 2] = rng.uniform(0.5, 5.0, V)
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    return jnp.asarray(verts), jnp.asarray(faces), W, H


def test_planes_matches_dense_rasterize():
    verts, faces, W, H = _random_scene(0)
    ref = rasterize(verts, faces, W, H)
    out = rasterize_planes(verts, faces, W, H, interpret=True)
    rf, of = np.asarray(ref["face"]), np.asarray(out["face"])
    np.testing.assert_array_equal(rf, of)
    both = rf >= 0
    np.testing.assert_allclose(np.asarray(ref["depth"])[both],
                               np.asarray(out["depth"])[both], atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref["bary"])[both],
                               np.asarray(out["bary"])[both], atol=1e-5)


def test_planes_fused_attributes():
    verts, faces, W, H = _random_scene(1)
    rng = np.random.default_rng(2)
    vattr = jnp.asarray(rng.normal(size=(verts.shape[0], 2)), jnp.float32)
    fattr = jnp.asarray(rng.normal(size=(faces.shape[0], 3)), jnp.float32)
    out = rasterize_planes(verts, faces, W, H, vertex_attrs=vattr,
                           face_attrs=fattr, interpret=True)
    face = np.asarray(out["face"])
    bary = np.asarray(out["bary"])
    attrs = np.asarray(out["attrs"])
    hit = face >= 0
    # vertex-attr channels == manual barycentric interpolation
    tri = np.asarray(vattr)[np.asarray(faces)]  # (F, 3, 2)
    want = np.einsum("pk,pkc->pc", bary[hit], tri[face[hit]])
    np.testing.assert_allclose(attrs[hit][:, :2], want, atol=1e-4)
    # face-const channels == the per-face value of the winning face
    np.testing.assert_allclose(attrs[hit][:, 2:],
                               np.asarray(fattr)[face[hit]], atol=1e-4)
    # empty pixels zeroed
    assert np.all(attrs[~hit] == 0.0)


def test_planes_culled_matches_uncull():
    # enough faces for several chunks; tiny chunk to exercise the skip mask
    verts, faces, W, H = _random_scene(7, V=80, F=70, W=256, H=40)
    rng = np.random.default_rng(8)
    vattr = jnp.asarray(rng.normal(size=(verts.shape[0], 2)), jnp.float32)
    fattr = jnp.asarray(rng.normal(size=(faces.shape[0], 1)), jnp.float32)
    a = rasterize_planes(verts, faces, W, H, vertex_attrs=vattr,
                         face_attrs=fattr, cull=False, interpret=True)
    # bin_capacity=8 forces overflow tiles (full-scan fallback) as well as
    # binned tiles; chunk=16 exercises the chunked overflow loop
    b = rasterize_planes(verts, faces, W, H, vertex_attrs=vattr,
                         face_attrs=fattr, cull=True, chunk=16, th=8,
                         bin_capacity=8, interpret=True)
    fa, fb = np.asarray(a["face"]), np.asarray(b["face"])
    # tie-breaking at exactly equal depth may differ; everywhere else the
    # winning face must agree
    da, db = np.asarray(a["depth"]), np.asarray(b["depth"])
    hit = fa >= 0
    np.testing.assert_array_equal(hit, fb >= 0)
    np.testing.assert_allclose(da[hit], db[hit], atol=1e-5)
    same = fa == fb
    ties = hit & ~same
    assert np.all(np.abs(da[ties] - db[ties]) <= 1e-5)
    np.testing.assert_allclose(np.asarray(a["bary"])[same & hit],
                               np.asarray(b["bary"])[same & hit], atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["attrs"])[same & hit],
                               np.asarray(b["attrs"])[same & hit], atol=1e-4)


def test_planes_nonaligned_image_and_empty_scene():
    verts, faces, W, H = _random_scene(3, W=100, H=6)
    out = rasterize_planes(verts, faces, W, H, interpret=True)
    assert out["face"].shape == (H, W)
    # all faces behind the camera → empty buffers
    behind = verts.at[:, 2].set(-1.0)
    out2 = rasterize_planes(behind, faces, W, H, interpret=True)
    assert np.all(np.asarray(out2["face"]) == -1)
    assert np.all(np.isinf(np.asarray(out2["depth"])))


def test_render_mesh_planes_path_matches_windowed():
    from momentum_tpu.camera import Camera, PinholeIntrinsics
    from momentum_tpu.math import skel_state as ss
    from momentum_tpu.rasterizer import render_mesh
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(4)
    cam = Camera.create(
        PinholeIntrinsics.create(60.0, 60.0, 32.0, 32.0),
        ss.join(jnp.asarray([0.0, -1.5, 6.0]), jnp.asarray([0.0, 0, 0, 1.0]),
                jnp.ones(1)))
    extra = char.mesh.vertices  # world positions, the shadowed-path fusion
    a = render_mesh(cam, char.mesh.vertices, char.mesh.faces, 64, 64,
                    method="windowed", extra_vertex_attrs=extra)
    b = render_mesh(cam, char.mesh.vertices, char.mesh.faces, 64, 64,
                    method="planes", extra_vertex_attrs=extra)
    ma, mb = np.asarray(a["mask"]), np.asarray(b["mask"])
    # coverage: allow a handful of silhouette-pixel tie differences
    assert np.sum(ma != mb) <= max(3, int(0.01 * ma.sum()))
    both = ma & mb & (np.asarray(a["face"]) == np.asarray(b["face"]))
    np.testing.assert_allclose(np.asarray(a["color"])[both],
                               np.asarray(b["color"])[both], atol=1e-3)
    np.testing.assert_allclose(np.asarray(a["extra"])[both],
                               np.asarray(b["extra"])[both], atol=1e-3)


def test_nonfinite_screen_vertices_do_not_poison_attrs():
    """Grazing projections (z→0) yield inf/NaN screen coords; their faces
    must neither poison the one-hot attribute matmul with NaN·0 nor flood
    the bin capacity with all-tile bboxes (round-5 TPU config-7 regression:
    covered pixels rendered NaN → black frames)."""
    rng = np.random.default_rng(7)
    v = rng.uniform(4, 60, (300, 3)).astype(np.float32)
    faces = rng.integers(0, 300, (200, 3)).astype(np.int32)
    # corrupt a handful of vertices the way a z≈0 projection does
    v[5] = [np.inf, np.inf, 3.0]
    v[17] = [np.nan, 1e4, 2.0]
    v[42] = [1e12, -1e12, 5.0]
    attrs = rng.normal(0, 1, (300, 3)).astype(np.float32)
    out = rasterize_planes(jnp.asarray(v), jnp.asarray(faces), 128, 64,
                           vertex_attrs=jnp.asarray(attrs), interpret=True)
    face = np.asarray(out["face"])
    cov = face >= 0
    assert cov.any()  # the clean faces still draw
    a = np.asarray(out["attrs"])
    assert np.isfinite(a[cov]).all(), "NaN leaked into covered pixels"
    # no face incident to a corrupted vertex may win a pixel
    bad_faces = np.unique(np.where(np.isin(faces, [5, 17, 42]).any(1))[0])
    assert not np.isin(face[cov], bad_faces).any()
