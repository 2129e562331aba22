"""Class-style solver wrappers mirroring pymomentum.solver2's surface
(solver2_pybind.cpp:275-984: SkeletonSolverFunction + GaussNewtonSolver /
GaussNewtonSolverQR / SubsetGaussNewtonSolver / SequenceSolver classes).

These are thin stateful shells over the functional solvers so code written
against the reference's class API ports line-by-line; new code should prefer
the functional API (solve_ik / solve_sequence)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from momentum_tpu.solver.gauss_newton import (
    SolverOptions,
    solve_gauss_newton,
    solve_levenberg_marquardt,
)
from momentum_tpu.solver.skeleton_solver_function import SkeletonSolverFunction

__all__ = [
    "GradientDescentSolver",
    "GaussNewtonSolver",
    "GaussNewtonSolverQR",
    "SubsetGaussNewtonSolver",
    "SparseGaussNewtonSolver",
    "TrustRegionQR",
    "SequenceSolver",
    "SequenceCholeskySolver",
    "MultiposeSolver",
    "solve_multipose",
]


class _SolverBase:
    method = "gauss_newton"

    def __init__(self, solver_function: SkeletonSolverFunction,
                 options: SolverOptions = SolverOptions()):
        self.solver_function = solver_function
        self.options = options
        self.enabled_parameters: Optional[jnp.ndarray] = None
        self.last_result = None

    def set_enabled_parameters(self, mask) -> None:
        """solver.cpp:36-43 setEnabledParameters."""
        self.enabled_parameters = jnp.asarray(np.asarray(mask, np.float32))

    def solve(self, params: jnp.ndarray) -> jnp.ndarray:
        from momentum_tpu.solver.ik import solve_ik

        res = solve_ik(self.solver_function, jnp.asarray(params),
                       self.enabled_parameters, self.options, self.method)
        self.last_result = res
        return res.params

    def set_store_history(self, store: bool = True) -> None:
        """solver.h:72-77 setStoreHistory."""
        self.options = dataclasses.replace(self.options, store_history=store)

    @property
    def error_history(self):
        """Per-iteration energies of the last solve (solver.h:90-92), or None."""
        if self.last_result is None:
            return None
        return self.last_result.error_history

    @property
    def parameter_history(self):
        if self.last_result is None:
            return None
        return self.last_result.param_history

    def get_error(self, params) -> float:
        return float(self.solver_function.error(jnp.asarray(params)))


class GaussNewtonSolver(_SolverBase):
    """gauss_newton_solver.h equivalent."""

    method = "gauss_newton"


class GaussNewtonSolverQR(GaussNewtonSolver):
    """gauss_newton_solver_qr.h equivalent: the damped step is computed by a
    QR factorization of [J; √λ·I] instead of the normal equations — the same
    √κ conditioning advantage as the reference's streaming Householder QR
    (online_householder_qr.h), as one batched dense factorization."""

    def __init__(self, solver_function, options: SolverOptions = SolverOptions()):
        super().__init__(solver_function,
                         dataclasses.replace(options, linear_solver="qr"))


class SubsetGaussNewtonSolver(GaussNewtonSolver):
    """subset_gauss_newton_solver.h equivalent — the subset lives in
    set_enabled_parameters (masked columns instead of compaction)."""


class SparseGaussNewtonSolver(GaussNewtonSolver):
    """gauss_newton_solver_sparse.h:50-90 equivalent for high-dimensional
    problems (P ≳ 500, e.g. dense blendshape rigs up to the
    kMaxModelParams=2048 envelope). The reference factors a sparse JᵀJ with
    SimplicialLLT; the TPU-native shape is matrix-free conjugate gradients
    on (JᵀJ + damp·I) via JVP/VJP sweeps — O(P) memory per element, no P×P
    materialization (solve_gauss_newton_cg)."""

    def __init__(self, solver_function, options: SolverOptions = SolverOptions()):
        super().__init__(solver_function,
                         dataclasses.replace(options, linear_solver="cg"))


class TrustRegionQR(_SolverBase):
    """trust_region_qr.h equivalent (adaptive-damping LM on the QR path)."""

    method = "levenberg_marquardt"

    def __init__(self, solver_function, options: SolverOptions = SolverOptions()):
        super().__init__(solver_function,
                         dataclasses.replace(options, linear_solver="qr"))


class GradientDescentSolver(_SolverBase):
    """gradient_descent_solver.h equivalent (first-order)."""

    method = "gradient_descent"

    def __init__(self, solver_function, options: SolverOptions = SolverOptions(),
                 learning_rate: float = 0.01):
        super().__init__(solver_function, options)
        self.learning_rate = learning_rate

    def solve(self, params):
        import jax.numpy as jnp

        from momentum_tpu.solver.gauss_newton import solve_gradient_descent

        fn = self.solver_function
        res = solve_gradient_descent(
            fn.residual, fn.error, jnp.asarray(params),
            self.enabled_parameters, self.options,
            learning_rate=self.learning_rate)
        self.last_result = res
        return res.params


class SequenceSolver:
    """sequence_solver.h equivalent."""

    def __init__(self, solver_function,
                 options: SolverOptions = SolverOptions()):
        self.solver_function = solver_function
        self.options = options
        self.last_result = None

    def solve(self, per_frame: jnp.ndarray, universal: jnp.ndarray):
        from momentum_tpu.sequence.solver import solve_sequence

        res = solve_sequence(self.solver_function, per_frame, universal, self.options)
        self.last_result = res
        return res


class SequenceCholeskySolver(SequenceSolver):
    """sequence_cholesky_solver.h equivalent. The TPU implementation already
    IS the compact banded-normal-equations Cholesky (sequence/solver.py +
    block_tridiag.py), so this shares SequenceSolver's path; the name exists
    for ported code."""


def solve_multipose(fn, pf0, u0, options: SolverOptions = SolverOptions()):
    """MultiposeSolver (multipose_solver.h:18-60): N independent poses coupled
    only through shared universal parameters — exactly the sequence solve with
    no sequence error functions (the band degenerates to block-diagonal +
    arrowhead)."""
    from momentum_tpu.sequence.solver import solve_sequence

    if fn.sequence_errors:
        raise ValueError("multipose solve expects no sequence error functions")
    return solve_sequence(fn, pf0, u0, options)


class MultiposeSolver(SequenceSolver):
    def solve(self, per_frame, universal):
        res = solve_multipose(self.solver_function, per_frame, universal, self.options)
        self.last_result = res
        return res
