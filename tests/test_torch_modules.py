"""Torch-module parity layer: BlendShape, ParameterLimits, SdfCollider
(reference: pymomentum/torch/{character.py, parameter_limits.py,
sdf_collision.py})."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from momentum_tpu.character.blend_shape import BlendShape
from momentum_tpu.character.limits import make_limits
from momentum_tpu.testing.fixtures import create_test_character
from momentum_tpu.torch_interop import (
    BlendShapeModule,
    ParameterLimitsModule,
    SdfColliderModule,
)


def test_blend_shape_module_forward_and_grad():
    rng = np.random.RandomState(0)
    base = rng.randn(20, 3).astype(np.float32)
    vecs = rng.randn(4, 20, 3).astype(np.float32)
    bs = BlendShape(base_shape=jnp.asarray(base),
                    shape_vectors=jnp.asarray(vecs))
    mod = BlendShapeModule(bs)
    c = torch.tensor([0.5, -1.0, 0.25, 0.0], requires_grad=True)
    out = mod(c)
    expected = base + np.einsum("k,kvi->vi", c.detach().numpy(), vecs)
    np.testing.assert_allclose(out.detach().numpy(), expected, atol=1e-5)
    # gradient of sum(out) wrt coefficients = sum of each shape vector
    out.sum().backward()
    np.testing.assert_allclose(c.grad.numpy(), vecs.sum(axis=(1, 2)),
                               rtol=1e-4)


def _char_with_limits():
    char = create_test_character(4)
    limits = make_limits(
        minmax=[(0, -0.5, 0.5, 1.0), (2, -0.3, 0.3, 2.0)],
        linear=[(0, 1, 2.0, 0.0, -np.finfo(np.float32).max,
                 np.finfo(np.float32).max, 1.0)],
        halfplane=[(0, 1, 0.6, 0.8, -0.1, 1.0)],
    )
    return dataclasses.replace(char, limits=limits)


def test_parameter_limits_module_total_and_by_type():
    char = _char_with_limits()
    mod = ParameterLimitsModule(char)
    p = char.num_model_parameters
    x = torch.zeros(p, requires_grad=True)
    with torch.no_grad():
        x[0] = 1.0  # violates minmax (>0.5), linear, halfplane
    total = mod(x)
    assert float(total) > 0.0
    by_type = mod.evaluate_by_type(x)
    assert set(by_type) == {"minmax", "linear", "halfplane"}
    assert float(by_type["halfplane"]) == pytest.approx(0.0, abs=1e-10)
    assert float(by_type["minmax"]) > 0.0 and float(by_type["linear"]) > 0.0
    np.testing.assert_allclose(
        float(total),
        sum(float(v) for v in by_type.values()), rtol=1e-5)
    # inside all limits → zero error
    zero = mod(torch.zeros(p))
    assert float(zero) == pytest.approx(0.0, abs=1e-10)
    # autograd pushes the violating parameter back toward the bound
    total.backward()
    assert x.grad[0] > 0.0


def test_sdf_collider_module():
    from momentum_tpu.axel.sdf import SignedDistanceField

    # analytic SDF of a sphere of radius 1 at origin, sampled on a grid
    # (odd n so the query points land exactly on grid nodes)
    n = 25
    axis = np.linspace(-2.0, 2.0, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    vals = np.sqrt(gx**2 + gy**2 + gz**2) - 1.0
    sdf = SignedDistanceField(
        origin=jnp.asarray([-2.0, -2.0, -2.0]),
        spacing=jnp.full(3, axis[1] - axis[0]),
        values=jnp.asarray(vals))

    char = create_test_character(3)
    states = char.skeleton_states(jnp.zeros(char.num_model_parameters))
    mod = SdfColliderModule(sdf, parent=0)

    pts = torch.tensor([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]],
                       requires_grad=True)
    st = torch.tensor(np.asarray(states))
    d = mod.evaluate(st, pts)
    np.testing.assert_allclose(d.detach().numpy(), [-1.0, 0.5], atol=0.02)
    # gradient of the outside point's distance is the outward unit normal
    # (trilinear sampling at a node takes one-sided differences in y/z,
    # giving O(h) components there)
    d[1].backward()
    np.testing.assert_allclose(pts.grad.numpy()[1], [1.0, 0.0, 0.0],
                               atol=0.06)


def test_sdf_collider_follows_joint():
    """Moving the parent joint moves the collider with it."""
    from momentum_tpu.axel.sdf import SignedDistanceField

    n = 25
    axis = np.linspace(-2.0, 2.0, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    vals = np.sqrt(gx**2 + gy**2 + gz**2) - 1.0
    sdf = SignedDistanceField(
        origin=jnp.asarray([-2.0, -2.0, -2.0]),
        spacing=jnp.full(3, axis[1] - axis[0]),
        values=jnp.asarray(vals))

    char = create_test_character(3)
    x = jnp.zeros(char.num_model_parameters).at[0].set(0.8)  # root_tx
    states = char.skeleton_states(x)
    mod = SdfColliderModule(sdf, parent=0)
    st = torch.tensor(np.asarray(states))
    d = mod.evaluate(st, torch.tensor([[0.8, 0.0, 0.0]]))
    np.testing.assert_allclose(d.detach().numpy(), [-1.0], atol=0.02)
