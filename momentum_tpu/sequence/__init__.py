from momentum_tpu.sequence.block_tridiag import (  # noqa: F401
    banded_to_tridiag,
    block_tridiag_solve,
    schur_arrowhead_solve,
)
from momentum_tpu.sequence.errors import (  # noqa: F401
    AccelerationSequenceErrorFunction,
    JointToJointSequenceErrorFunction,
    SdfCollisionSequenceErrorFunction,
    VertexSequenceErrorFunction,
    FiniteDifferenceSequenceErrorFunction,
    JerkSequenceErrorFunction,
    ModelParametersSequenceErrorFunction,
    SequenceErrorFunction,
    StateSequenceErrorFunction,
    VelocityMagnitudeSequenceErrorFunction,
)
from momentum_tpu.sequence.solver import SequenceSolveResult, solve_sequence  # noqa: F401
from momentum_tpu.sequence.solver_function import (  # noqa: F401
    SequenceSolverFunction,
    broadcast_frames,
    stack_frames,
)
