from momentum_tpu.solver.gauss_newton import (  # noqa: F401
    SolveResult,
    SolverOptions,
    solve_gauss_newton,
    solve_levenberg_marquardt,
)
from momentum_tpu.solver.skeleton_solver_function import SkeletonSolverFunction  # noqa: F401
from momentum_tpu.solver.ik import solve_ik  # noqa: F401
