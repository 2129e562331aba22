"""TRS transform tuple API (reference: pymomentum/trs.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from momentum_tpu.math import skel_state as ss
from momentum_tpu.math import trs
from momentum_tpu.math import quaternion as quat


def _random_trs(rng, batch=()):
    q = rng.randn(*batch, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.randn(*batch, 3).astype(np.float32)
    r = np.asarray(quat.to_rotation_matrix(jnp.asarray(q, jnp.float32)))
    s = rng.uniform(0.5, 2.0, batch + (1,)).astype(np.float32)
    return jnp.asarray(t), jnp.asarray(r), jnp.asarray(s)


def test_constructors_and_identity():
    t, r, s = trs.identity((4,))
    assert t.shape == (4, 3) and r.shape == (4, 3, 3) and s.shape == (4, 1)
    ft = trs.from_translation(jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(trs.transform_points(
        ft, jnp.zeros(3))), [1.0, 2.0, 3.0], atol=0)
    fs = trs.from_scale(jnp.asarray([2.0]))
    np.testing.assert_allclose(np.asarray(trs.transform_points(
        fs, jnp.asarray([1.0, 1.0, 1.0]))), [2.0, 2.0, 2.0], atol=0)


def test_multiply_matches_matrix_product():
    rng = np.random.RandomState(0)
    a = _random_trs(rng, (8,))
    b = _random_trs(rng, (8,))
    m = np.asarray(trs.to_matrix(trs.multiply(a, b)))
    mm = np.asarray(trs.to_matrix(a)) @ np.asarray(trs.to_matrix(b))
    np.testing.assert_allclose(m, mm, atol=1e-5)


def test_inverse_and_transform_points():
    rng = np.random.RandomState(1)
    a = _random_trs(rng, (8,))
    pts = jnp.asarray(rng.randn(8, 3), jnp.float32)
    out = trs.transform_points(a, pts)
    back = trs.transform_points(trs.inverse(a), out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)
    # identity composition
    ident = trs.multiply(a, trs.inverse(a))
    np.testing.assert_allclose(np.asarray(ident[0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident[1]),
                               np.broadcast_to(np.eye(3), (8, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident[2]), 1.0, atol=1e-5)


def test_matrix_round_trip():
    rng = np.random.RandomState(2)
    a = _random_trs(rng, (8,))
    m = trs.to_matrix(a)
    t2, r2, s2 = trs.from_matrix(m)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(a[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(a[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(a[2]), atol=1e-4)
    with pytest.raises(ValueError):
        trs.from_matrix(jnp.zeros((3, 3)))


def test_skeleton_state_round_trip():
    rng = np.random.RandomState(3)
    a = _random_trs(rng, (8,))
    state = trs.to_skeleton_state(a)
    assert state.shape == (8, 8)
    b = trs.from_skeleton_state(state)
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b[1]), np.asarray(a[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b[2]), np.asarray(a[2]), atol=1e-6)
    # transform_points agrees with the skel_state algebra
    pts = jnp.asarray(rng.randn(8, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(trs.transform_points(a, pts)),
        np.asarray(ss.transform_points(state, pts)), atol=1e-4)


def test_slerp_endpoints_and_midpoint():
    rng = np.random.RandomState(4)
    a = _random_trs(rng, (4,))
    b = _random_trs(rng, (4,))
    lo = trs.slerp(a, b, jnp.zeros(4))
    hi = trs.slerp(a, b, jnp.ones(4))
    for got, want in ((lo, a), (hi, b)):
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=1e-4)
    mid = trs.slerp(a, b, jnp.full(4, 0.5))
    np.testing.assert_allclose(np.asarray(mid[0]),
                               0.5 * (np.asarray(a[0]) + np.asarray(b[0])),
                               atol=1e-5)
    # midpoint rotation is a valid rotation equidistant from both ends
    r = np.asarray(mid[1])
    np.testing.assert_allclose(r @ r.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), r.shape), atol=1e-5)


def test_blend():
    rng = np.random.RandomState(5)
    a = _random_trs(rng, (4,))
    b = _random_trs(rng, (4,))
    with pytest.raises(ValueError):
        trs.blend([])
    only = trs.blend([a])
    assert only is a
    # full weight on one input returns it
    w = jnp.asarray([1.0, 0.0])
    out = trs.blend([a, b], w)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(a[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(a[1]),
                               atol=1e-4)
    # equal weights of the same transform return it
    same = trs.blend([a, a])
    np.testing.assert_allclose(np.asarray(same[1]), np.asarray(a[1]),
                               atol=1e-4)


def test_rotmat_helpers():
    rng = np.random.RandomState(6)
    _, r, _ = _random_trs(rng, (5,))
    np.testing.assert_allclose(
        np.asarray(trs.rotmat_multiply(r, trs.rotmat_inverse(r))),
        np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)
    v = jnp.asarray(rng.randn(5, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(trs.rotmat_rotate_vector(r, v)),
        np.einsum("bij,bj->bi", np.asarray(r), np.asarray(v)), atol=1e-5)
    # rotmat_from_euler_xyz: X applied first, then Y, then Z (= Rz·Ry·Rx)
    e = jnp.asarray([[0.3, -0.2, 0.5]], jnp.float32)
    got = np.asarray(trs.rotmat_from_euler_xyz(e))[0]
    rx = np.asarray(trs.rotmat_from_euler_xyz(
        jnp.asarray([[0.3, 0.0, 0.0]], jnp.float32)))[0]
    ry = np.asarray(trs.rotmat_from_euler_xyz(
        jnp.asarray([[0.0, -0.2, 0.0]], jnp.float32)))[0]
    rz = np.asarray(trs.rotmat_from_euler_xyz(
        jnp.asarray([[0.0, 0.0, 0.5]], jnp.float32)))[0]
    np.testing.assert_allclose(got, rz @ ry @ rx, atol=1e-6)


def test_index_select_and_where():
    rng = np.random.RandomState(7)
    a = _random_trs(rng, (6,))
    sel = trs.index_select(a, 0, jnp.asarray([4, 1]))
    np.testing.assert_allclose(np.asarray(sel[0]),
                               np.asarray(a[0])[[4, 1]], atol=0)
    np.testing.assert_allclose(np.asarray(sel[1]),
                               np.asarray(a[1])[[4, 1]], atol=0)
    b = _random_trs(rng, (6,))
    cond = jnp.asarray([True, False, True, False, True, False])
    out = trs.where(cond, a, b)
    np.testing.assert_allclose(np.asarray(out[0])[0], np.asarray(a[0])[0],
                               atol=0)
    np.testing.assert_allclose(np.asarray(out[0])[1], np.asarray(b[0])[1],
                               atol=0)
    np.testing.assert_allclose(np.asarray(out[1])[3], np.asarray(b[1])[3],
                               atol=0)
