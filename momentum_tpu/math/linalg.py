"""Small-matrix linear algebra helpers.

`psd_solve` replaces jax.scipy's cho_factor/cho_solve pair: on TPU the scipy
wrappers lower to a path ~80× slower for batched small matrices (measured
9.85 ms vs 0.13 ms for 2048×31×31 on v5e); the raw lax.linalg cholesky +
two triangular solves hit the fast batched kernels directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["psd_solve"]


def psd_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a x = b for SPD a. a (..., n, n); b (..., n) or (..., n, k)."""
    l = jax.lax.linalg.cholesky(a)
    vec = b.ndim == a.ndim - 1
    rhs = b[..., None] if vec else b
    y = jax.lax.linalg.triangular_solve(l, rhs, left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(l, y, left_side=True, lower=True,
                                        transpose_a=True)
    return x[..., 0] if vec else x
