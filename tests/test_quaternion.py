"""Quaternion algebra tests against scipy-free numpy references."""

import numpy as np
import jax.numpy as jnp

from momentum_tpu.math import euler, quaternion as quat


def random_unit_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def np_quat_to_matrix(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))


def test_multiply_matches_matrix_product(rng):
    q1 = random_unit_quats(rng, 64)
    q2 = random_unit_quats(rng, 64)
    q12 = np.asarray(quat.multiply(jnp.asarray(q1), jnp.asarray(q2)))
    m = np_quat_to_matrix(q1) @ np_quat_to_matrix(q2)
    np.testing.assert_allclose(np_quat_to_matrix(q12), m, atol=1e-5)


def test_rotate_vector_matches_matrix(rng):
    q = random_unit_quats(rng, 64)
    v = rng.normal(size=(64, 3))
    rv = np.asarray(quat.rotate_vector(jnp.asarray(q), jnp.asarray(v)))
    mv = np.einsum("nij,nj->ni", np_quat_to_matrix(q), v)
    np.testing.assert_allclose(rv, mv, atol=1e-5)


def test_inverse_conjugate(rng):
    q = random_unit_quats(rng, 32)
    qi = np.asarray(quat.inverse(jnp.asarray(q)))
    prod = np.asarray(quat.multiply(jnp.asarray(q), jnp.asarray(qi)))
    np.testing.assert_allclose(prod, np.tile([0, 0, 0, 1.0], (32, 1)), atol=1e-5)


def test_matrix_roundtrip(rng):
    q = random_unit_quats(rng, 256)
    m = quat.to_rotation_matrix(jnp.asarray(q, jnp.float32))
    q2 = np.asarray(quat.from_rotation_matrix(m))
    # q and -q are the same rotation
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_axis_angle_roundtrip(rng):
    aa = rng.normal(size=(64, 3))
    # keep angle < pi for unique roundtrip
    aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, size=(64, 1))
    q = quat.from_axis_angle(jnp.asarray(aa, jnp.float32))
    aa2 = np.asarray(quat.to_axis_angle(q))
    np.testing.assert_allclose(aa2, aa, atol=1e-4)


def test_euler_to_quaternion_zyx(rng):
    ang = rng.uniform(-1.5, 1.5, size=(32, 3))
    q = quat.euler_to_quaternion(jnp.asarray(ang, jnp.float32), order="ZYX")
    m_q = np.asarray(quat.to_rotation_matrix(q))
    m_e = np.asarray(euler.euler_zyx_to_matrix(jnp.asarray(ang, jnp.float32)))
    np.testing.assert_allclose(m_q, m_e, atol=1e-5)


def test_euler_zyx_extraction_roundtrip(rng):
    ang = rng.uniform(-1.4, 1.4, size=(128, 3))
    m = euler.euler_zyx_to_matrix(jnp.asarray(ang, jnp.float32))
    back = np.asarray(euler.rotation_matrix_to_euler_zyx(m))  # (z, y, x)
    np.testing.assert_allclose(back[:, 2], ang[:, 0], atol=1e-4)  # rx
    np.testing.assert_allclose(back[:, 1], ang[:, 1], atol=1e-4)  # ry
    np.testing.assert_allclose(back[:, 0], ang[:, 2], atol=1e-4)  # rz


def test_euler_xyz_extraction_roundtrip(rng):
    ang = rng.uniform(-1.4, 1.4, size=(128, 3))
    m = euler.euler_xyz_to_matrix(jnp.asarray(ang, jnp.float32))
    back = np.asarray(euler.rotation_matrix_to_euler_xyz(m))
    np.testing.assert_allclose(back, ang, atol=1e-4)


def test_gimbal_lock_zyx():
    # sin(y) == 1 lock: reconstruction must still reproduce the matrix
    ang = np.array([[0.3, np.pi / 2, 0.7]], dtype=np.float32)
    m = euler.euler_zyx_to_matrix(jnp.asarray(ang))
    back = np.asarray(euler.rotation_matrix_to_euler_zyx(m))  # (z,y,x)
    m2 = euler.euler_zyx_to_matrix(jnp.asarray(back[..., ::-1]))
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-4)


def test_slerp_endpoints(rng):
    q0 = jnp.asarray(random_unit_quats(rng, 8), jnp.float32)
    q1 = jnp.asarray(random_unit_quats(rng, 8), jnp.float32)
    s0 = np.asarray(quat.slerp(q0, q1, jnp.zeros((8,))))
    s1 = np.asarray(quat.slerp(q0, q1, jnp.ones((8,))))
    np.testing.assert_allclose(np.abs(np.sum(s0 * np.asarray(q0), axis=-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(s1 * np.asarray(q1), axis=-1)), 1.0, atol=1e-5)


def test_from_two_vectors(rng):
    a = rng.normal(size=(32, 3)).astype(np.float32)
    b = rng.normal(size=(32, 3)).astype(np.float32)
    q = quat.from_two_vectors(jnp.asarray(a), jnp.asarray(b))
    ra = np.asarray(quat.rotate_vector(q, jnp.asarray(a / np.linalg.norm(a, axis=-1, keepdims=True))))
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(ra, bn, atol=1e-4)


def test_blend_matches_eigen_average(rng):
    """blend == the Markley eigen average (pymomentum/quaternion_np.py:516-536)
    on SPREAD-OUT quaternions, where normalized-lerp visibly diverges."""
    q = random_unit_quats(rng, 5)
    w = rng.uniform(0.1, 1.0, 5)
    # reference formula, straight numpy
    wn = w / w.sum()
    m = np.einsum("ki,kj,k->ij", q, q, wn)
    _, vecs = np.linalg.eigh(m)
    expected = vecs[:, 3]
    got = np.asarray(quat.blend(jnp.asarray(q, jnp.float32),
                                jnp.asarray(w, jnp.float32)))
    # sign-invariant comparison
    assert min(np.abs(got - expected).max(),
               np.abs(got + expected).max()) < 1e-4


def test_blend_identity_weight(rng):
    """All weight on one quaternion reproduces it (up to sign)."""
    q = random_unit_quats(rng, 4)
    w = np.asarray([0.0, 0.0, 1.0, 0.0])
    got = np.asarray(quat.blend(jnp.asarray(q, jnp.float32),
                                jnp.asarray(w, jnp.float32)))
    assert min(np.abs(got - q[2]).max(), np.abs(got + q[2]).max()) < 1e-4


def test_blend_nlerp_close_quats_agrees_with_blend(rng):
    """For clustered quaternions nlerp ~= the eigen average."""
    base = random_unit_quats(rng, 1)[0]
    perturbed = base[None, :] + 0.02 * rng.normal(size=(6, 4))
    perturbed /= np.linalg.norm(perturbed, axis=-1, keepdims=True)
    qj = jnp.asarray(perturbed, jnp.float32)
    a = np.asarray(quat.blend(qj))
    b = np.asarray(quat.blend_nlerp(qj))
    assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-3


def test_euler_quaternion_parity_aliases():
    """pymomentum euler↔quaternion conversions match the reference numpy
    formulas bit-for-bit (quaternion_np.py:332-390)."""
    rng = np.random.RandomState(5)
    e = jnp.asarray(rng.uniform(-1.2, 1.2, (16, 3)), jnp.float32)
    roll, pitch, yaw = np.asarray(e).T
    cy, sy = np.cos(yaw * .5), np.sin(yaw * .5)
    cp, sp = np.cos(pitch * .5), np.sin(pitch * .5)
    cr, sr = np.cos(roll * .5), np.sin(roll * .5)
    ref_xyz = np.stack([sr * cp * cy - cr * sp * sy,
                        cr * sp * cy + sr * cp * sy,
                        cr * cp * sy - sr * sp * cy,
                        cr * cp * cy + sr * sp * sy], -1)
    np.testing.assert_allclose(
        np.asarray(quat.euler_xyz_to_quaternion(e)), ref_xyz, atol=1e-6)

    yaw, pitch, roll = np.asarray(e).T
    cy, sy = np.cos(yaw * .5), np.sin(yaw * .5)
    cp, sp = np.cos(pitch * .5), np.sin(pitch * .5)
    cr, sr = np.cos(roll * .5), np.sin(roll * .5)
    ref_zyx = np.stack([sr * cp * cy + cr * sp * sy,
                        cr * sp * cy - sr * cp * sy,
                        cr * cp * sy + sr * sp * cy,
                        cr * cp * cy - sr * sp * sy], -1)
    np.testing.assert_allclose(
        np.asarray(quat.euler_zyx_to_quaternion(e)), ref_zyx, atol=1e-6)

    # xyz extraction inverts the xyz composition (up to recomposition)
    q = quat.euler_xyz_to_quaternion(e)
    q2 = quat.euler_xyz_to_quaternion(quat.quaternion_to_xyz_euler(q))
    flip = np.minimum(np.abs(np.asarray(q - q2)), np.abs(np.asarray(q + q2)))
    assert flip.max() < 1e-5

    # assume_normalized aliases are the same (never-normalizing) functions
    assert quat.multiply_assume_normalized is quat.multiply
    assert quat.rotate_vector_assume_normalized is quat.rotate_vector
    assert quat.to_rotation_matrix_assume_normalized is quat.to_rotation_matrix


def test_check_and_normalize_weights_uniform_default():
    import jax.numpy as jnp

    from momentum_tpu.math import quaternion as q

    w = q.check_and_normalize_weights(jnp.zeros((5, 3, 4)))
    assert w.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-6)


def test_check_and_normalize_weights_normalizes():
    import jax.numpy as jnp

    from momentum_tpu.math import quaternion as q

    w = q.check_and_normalize_weights(
        jnp.zeros((3, 4)), jnp.asarray([2.0, 2.0, 4.0]))
    np.testing.assert_allclose(np.asarray(w), [0.25, 0.25, 0.5], atol=1e-6)
    import pytest

    with pytest.raises(ValueError):
        q.check_and_normalize_weights(jnp.zeros((3, 4)), jnp.ones(2))


def test_skel_state_assume_normalized_aliases():
    import jax.numpy as jnp

    from momentum_tpu.math import skel_state as ss

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(ss.multiply_assume_normalized(a, b)),
                               np.asarray(ss.multiply(a, b)))
    np.testing.assert_allclose(
        np.asarray(ss.transform_points_assume_normalized(a, p)),
        np.asarray(ss.transform_points(a, p)))
