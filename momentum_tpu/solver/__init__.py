from momentum_tpu.solver.gauss_newton import (  # noqa: F401
    SolveResult,
    SolverOptions,
    solve_gauss_newton,
    solve_gauss_newton_cg,
    solve_levenberg_marquardt,
)
from momentum_tpu.solver.skeleton_solver_function import SkeletonSolverFunction  # noqa: F401
from momentum_tpu.solver.ik import solve_ik  # noqa: F401
from momentum_tpu.solver.diff_ik import gradient_rmse, solve_ik_ift  # noqa: F401
from momentum_tpu.solver.solvers import (  # noqa: F401
    GaussNewtonSolver,
    GaussNewtonSolverQR,
    MultiposeSolver,
    SequenceSolver,
    SparseGaussNewtonSolver,
    SubsetGaussNewtonSolver,
    TrustRegionQR,
    solve_multipose,
)
from momentum_tpu.solver.compaction import (  # noqa: F401
    gather_batch,
    scatter_batch,
    solve_compacted,
)
