"""Catalog sweep for SEQUENCE error functions: every exported
SequenceErrorFunction subclass gets an entry with an FD gradient check of
the total sequence energy plus an active-residual check, so new sequence
errors cannot ship untested (mirror of tests/test_error_catalog.py for the
per-frame catalog; reference pattern: test/character_sequence_solver/)."""

import inspect

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import momentum_tpu.sequence as S
from momentum_tpu.sequence.errors import SequenceErrorFunction
from momentum_tpu.sequence.solver_function import SequenceSolverFunction
from momentum_tpu.testing.fixtures import create_test_character

F = 6


def _rng():
    return np.random.default_rng(12345)


def _char():
    return create_test_character(4)


def _sdf():
    from momentum_tpu.axel.sdf import SignedDistanceField

    rng = _rng()
    return SignedDistanceField(
        origin=jnp.asarray([-3.0, -3.0, -3.0]),
        spacing=jnp.asarray([1.0, 1.0, 1.0]),
        values=jnp.asarray(rng.normal(0, 1, (8, 8, 8)).astype(np.float32)))


def _catalog():
    char = _char()
    rng = _rng()
    nj = char.num_joints
    p = char.num_model_parameters
    nv = char.mesh.num_vertices
    vid = np.arange(0, nv, 6, dtype=np.int32)
    return {
        "ModelParametersSequenceErrorFunction":
            S.ModelParametersSequenceErrorFunction.create(p),
        "StateSequenceErrorFunction":
            S.StateSequenceErrorFunction.create(nj),
        "FiniteDifferenceSequenceErrorFunction":
            S.FiniteDifferenceSequenceErrorFunction.create(
                (1.0, -2.0, 1.0), nj),
        "AccelerationSequenceErrorFunction":
            S.AccelerationSequenceErrorFunction.create(nj),
        "JerkSequenceErrorFunction":
            S.JerkSequenceErrorFunction.create(nj),
        "VelocityMagnitudeSequenceErrorFunction":
            S.VelocityMagnitudeSequenceErrorFunction.create(
                nj, target_magnitude=0.05),
        "JointToJointSequenceErrorFunction":
            S.JointToJointSequenceErrorFunction.create(
                [nj - 1], [0],
                rng.uniform(-0.3, 0.3, (1, 3)).astype(np.float32),
                rng.uniform(-0.3, 0.3, (1, 3)).astype(np.float32)),
        "VertexSequenceErrorFunction":
            S.VertexSequenceErrorFunction.create(vid),
        "SdfCollisionSequenceErrorFunction":
            S.SdfCollisionSequenceErrorFunction.create(_sdf(), vid),
    }


def _exported():
    out = {}
    for name, obj in vars(S).items():
        if (inspect.isclass(obj) and issubclass(obj, SequenceErrorFunction)
                and obj.__name__ != "SequenceErrorFunction"):
            out[obj.__name__] = obj
    return out


def test_sequence_catalog_is_complete():
    missing = set(_exported()) - set(_catalog())
    assert not missing, f"sequence errors with no catalog entry: {missing}"


@pytest.mark.parametrize("name", sorted(_catalog()))
def test_sequence_catalog_gradient(name):
    char = _char()
    sef = _catalog()[name]
    fn = SequenceSolverFunction.create(char, F, per_frame_errors=(),
                                       sequence_errors=(sef,))
    rng = _rng()
    p = char.num_model_parameters
    thetas = jnp.asarray(rng.uniform(-0.25, 0.25, (F, p)), jnp.float32)
    pf, u = fn.split(thetas)

    def energy(pf_flat):
        return fn.error(pf_flat.reshape(pf.shape), u)

    x = pf.reshape(-1)
    e0 = float(energy(x))
    assert np.isfinite(e0)
    assert e0 > 0, f"{name}: residual inactive at a random motion"
    g = np.asarray(jax.grad(lambda v: energy(v))(x))
    # FD over a random subset of coordinates (full FD over F·P is slow)
    eps = 1e-3
    idx = rng.choice(x.shape[0], size=24, replace=False)
    x64 = np.asarray(x, np.float64)
    scale = max(1.0, np.abs(g).max())
    for i in idx:
        xp, xm = x64.copy(), x64.copy()
        xp[i] += eps
        xm[i] -= eps
        fd = (float(energy(jnp.asarray(xp, jnp.float32)))
              - float(energy(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
        np.testing.assert_allclose(g[i] / scale, fd / scale, atol=8e-3,
                                   err_msg=f"{name} coord {i}")
