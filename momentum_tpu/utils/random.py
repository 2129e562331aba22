"""Seeded RNG singleton (reference: math/random.h:33-50 Random<> — a global
generator with a settable seed used for test determinism).

JAX code should use explicit `jax.random` keys; this exists for host-side
code and tests that want the reference's "one global seeded stream" shape.
"""

from __future__ import annotations

import numpy as np

__all__ = ["GlobalRandom", "get_global_random", "set_global_seed"]

_DEFAULT_SEED = 12345  # the reference test fixture seed


class GlobalRandom:
    def __init__(self, seed: int = _DEFAULT_SEED):
        self._seed = seed
        self._rng = np.random.default_rng(seed)

    @property
    def seed(self) -> int:
        return self._seed

    def set_seed(self, seed: int) -> None:
        self._seed = seed
        self._rng = np.random.default_rng(seed)

    def uniform(self, lo=0.0, hi=1.0, size=None):
        return self._rng.uniform(lo, hi, size)

    def normal(self, mean=0.0, sigma=1.0, size=None):
        return self._rng.normal(mean, sigma, size)

    def integers(self, lo, hi, size=None):
        return self._rng.integers(lo, hi, size)

    def key(self):
        """A jax PRNG key derived from the current seed."""
        import jax

        return jax.random.PRNGKey(self._seed)


_SINGLETON = GlobalRandom()


def get_global_random() -> GlobalRandom:
    return _SINGLETON


def set_global_seed(seed: int) -> None:
    _SINGLETON.set_seed(seed)
