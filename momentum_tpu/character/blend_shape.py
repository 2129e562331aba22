"""Blend shapes: shape = base + Σ w_i · shapeVector_i.

Reference: momentum/character/blend_shape_base.h:15-61, blend_shape.h:19-63.
The basis is stored as (K, V, 3); applying it is one matmul. `estimate_
coefficients` is the least-squares fit the reference exposes (blend_shape.h).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["BlendShape"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlendShape:
    base_shape: jnp.ndarray  # (V, 3)
    shape_vectors: jnp.ndarray  # (K, V, 3)

    @property
    def num_shapes(self) -> int:
        return self.shape_vectors.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.base_shape.shape[0]

    def apply(self, coefficients: jnp.ndarray) -> jnp.ndarray:
        """(..., K) → (..., V, 3): base + coeffs · basis (blend_shape_base.h computeShape)."""
        return self.base_shape + jnp.einsum("...k,kvi->...vi", coefficients, self.shape_vectors)

    def compute_deltas(self, coefficients: jnp.ndarray) -> jnp.ndarray:
        """Offsets only (no base), used when composing with face expressions."""
        return jnp.einsum("...k,kvi->...vi", coefficients, self.shape_vectors)

    def estimate_coefficients(
        self, vertices: jnp.ndarray, regularization: float = 1.0
    ) -> jnp.ndarray:
        """Ridge LSQ fit of coefficients to target vertices
        (blend_shape.h:19-63 estimateCoefficients)."""
        k = self.num_shapes
        basis = self.shape_vectors.reshape(k, -1)  # (K, 3V)
        target = (vertices - self.base_shape).reshape(vertices.shape[:-2] + (-1,))
        ata = basis @ basis.T + regularization * jnp.eye(k, dtype=basis.dtype)
        atb = jnp.einsum("kd,...d->...k", basis, target)
        return jnp.linalg.solve(ata, atb[..., None])[..., 0]


def _bs_load(cls, path, num_expected_shapes: int = -1,
             num_expected_vertices: int = -1):
    """Load a blend-shape basis from a file (pymomentum BlendShape.load)."""
    from momentum_tpu.io.shape import load_blend_shape

    return load_blend_shape(path, num_expected_shapes, num_expected_vertices)


def _bs_from_bytes(cls, blend_shape_bytes, num_expected_shapes: int = -1,
                   num_expected_vertices: int = -1):
    import os
    import tempfile

    from momentum_tpu.io.shape import load_blend_shape

    fd, tmp = tempfile.mkstemp(suffix=".bin")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            f.write(bytes(blend_shape_bytes))
        return load_blend_shape(tmp, num_expected_shapes,
                                num_expected_vertices)
    finally:
        os.unlink(tmp)


def _bs_from_tensors(cls, base_shape, shape_vectors):
    """Create directly from arrays (pymomentum BlendShape.from_tensors)."""
    return cls(base_shape=jnp.asarray(base_shape, jnp.float32),
               shape_vectors=jnp.asarray(shape_vectors, jnp.float32))


def _bs_save(self, path) -> None:
    from momentum_tpu.io.shape import save_blend_shape

    save_blend_shape(path, self)


def _bs_to_bytes(self) -> bytes:
    import os
    import tempfile

    from momentum_tpu.io.shape import save_blend_shape

    fd, tmp = tempfile.mkstemp(suffix=".bin")
    os.close(fd)
    try:
        save_blend_shape(tmp, self)
        with open(tmp, "rb") as f:
            return f.read()
    finally:
        os.unlink(tmp)


BlendShape.load = classmethod(_bs_load)
BlendShape.from_bytes = classmethod(_bs_from_bytes)
BlendShape.from_tensors = classmethod(_bs_from_tensors)
BlendShape.save = _bs_save
BlendShape.to_bytes = _bs_to_bytes
