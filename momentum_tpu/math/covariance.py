"""Low-rank covariance C = σ²·I + AᵀA (math/covariance_matrix.h:17-85).

Woodbury-based apply/solve and log-determinant without forming AᵀA: with
A (k, n), k ≪ n,
    C⁻¹·x = x/σ² − Aᵀ(σ²·I_k + AAᵀ)⁻¹A·x / σ²
    log|C| = 2(n−k)·log σ + log|σ²I_k + AAᵀ|
All functions are jittable/batched in the trailing rhs dimension.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from momentum_tpu.math.linalg import psd_solve

__all__ = ["LowRankCovarianceMatrix"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LowRankCovarianceMatrix:
    a: jnp.ndarray  # (k, n) basis
    sigma: jnp.ndarray  # scalar

    @classmethod
    def create(cls, sigma, a):
        return cls(a=jnp.asarray(a, jnp.float32),
                   sigma=jnp.asarray(sigma, jnp.float32))

    @property
    def dim(self) -> int:
        return self.a.shape[1]

    @property
    def rank(self) -> int:
        return self.a.shape[0]

    def _small(self):
        return self.sigma**2 * jnp.eye(self.rank) + self.a @ self.a.T

    def times_vec(self, x: jnp.ndarray) -> jnp.ndarray:
        """C·x = σ²x + Aᵀ(Ax)."""
        return self.sigma**2 * x + self.a.T @ (self.a @ x)

    def inverse_times_vec(self, x: jnp.ndarray) -> jnp.ndarray:
        """C⁻¹·x via Woodbury."""
        s2 = self.sigma**2
        ax = self.a @ x
        core = psd_solve(self._small(), ax)
        return (x - self.a.T @ core) / s2

    def log_determinant(self) -> jnp.ndarray:
        n, k = self.dim, self.rank
        sign, logdet_small = jnp.linalg.slogdet(self._small())
        return 2.0 * (n - k) * jnp.log(self.sigma) + logdet_small

    def inverse_log_determinant(self) -> jnp.ndarray:
        return -self.log_determinant()
