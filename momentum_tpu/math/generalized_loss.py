"""Barron's general & adaptive robust loss on *squared* residuals.

Mirrors the reference's GeneralizedLossT (momentum/math/generalized_loss.h:14-58,
.cpp closed forms): the loss and its derivative are functions of the squared
error s = ‖r‖², parameterized by (alpha, c). Special alphas snap to closed
forms — the branch is chosen at *trace time* (alpha is a static Python float),
so the jitted code contains only the selected formula:

    alpha = 2   : L2        f(s) = s/c²
    alpha = 1   : L1/Huber  f(s) = sqrt(s/c² + 1) − 1
    alpha = 0   : Cauchy    f(s) = log(½·s/c² + 1)
    alpha = -∞  : Welsch    f(s) = 1 − exp(−½·s/c²)    (sentinel ALPHA_WELSCH)
    otherwise   : Barron general form (eq. 1 of arXiv:1701.03077)

Note the reference intentionally omits the canonical ½ factor (generalized_loss.cpp:22-24).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

__all__ = ["GeneralizedLoss", "ALPHA_L2", "ALPHA_L1", "ALPHA_CAUCHY", "ALPHA_WELSCH"]

ALPHA_L2 = 2.0
ALPHA_L1 = 1.0
ALPHA_CAUCHY = 0.0
ALPHA_WELSCH = -1e9  # sentinel, matches reference kWelsch semantics (exact match only)
_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class GeneralizedLoss:
    """Static-config robust loss; `value`/`deriv` map squared errors elementwise."""

    alpha: float = ALPHA_L2
    c: float = 1.0

    def __post_init__(self):
        if not self.c > 0:
            raise ValueError(f"Loss parameter c must be positive, got {self.c}")

    @property
    def _inv_c2(self) -> float:
        return 1.0 / (self.c * self.c)

    def _kind(self) -> str:
        a = self.alpha
        if abs(a - ALPHA_L2) <= _EPS:
            return "l2"
        if abs(a - ALPHA_L1) <= _EPS:
            return "l1"
        if abs(a - ALPHA_CAUCHY) <= _EPS:
            return "cauchy"
        if a == ALPHA_WELSCH:
            return "welsch"
        return "general"

    def value(self, sqr_error: jnp.ndarray) -> jnp.ndarray:
        ic2 = self._inv_c2
        s = sqr_error * ic2
        kind = self._kind()
        if kind == "l2":
            return s
        if kind == "l1":
            return jnp.sqrt(s + 1.0) - 1.0
        if kind == "cauchy":
            return jnp.log1p(0.5 * s)
        if kind == "welsch":
            return 1.0 - jnp.exp(-0.5 * s)
        a = self.alpha
        d = abs(a - 2.0)
        return (d / a) * (jnp.power(s / d + 1.0, 0.5 * a) - 1.0)

    def deriv(self, sqr_error: jnp.ndarray) -> jnp.ndarray:
        """d loss / d (squared error)."""
        ic2 = self._inv_c2
        s = sqr_error * ic2
        kind = self._kind()
        if kind == "l2":
            return jnp.full_like(sqr_error, ic2)
        if kind == "l1":
            return 0.5 * ic2 / jnp.sqrt(s + 1.0)
        if kind == "cauchy":
            return ic2 / (s + 2.0)
        if kind == "welsch":
            return 0.5 * ic2 * jnp.exp(-0.5 * s)
        a = self.alpha
        d = abs(a - 2.0)
        return 0.5 * ic2 * jnp.power(s / d + 1.0, 0.5 * a - 1.0)

    def sqrt_deriv(self, sqr_error: jnp.ndarray) -> jnp.ndarray:
        """sqrt(deriv) — the residual row scaling used by GN Jacobians
        (joint_error_function-inl.h applies sqrt(w·f') to residual rows)."""
        return jnp.sqrt(jnp.maximum(self.deriv(sqr_error), 0.0))


def _welsch_sentinel_doc():  # pragma: no cover
    return math.inf
