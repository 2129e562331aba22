"""Multi-chip parallelism helpers.

Reference analog: §2.9 of the survey — the reference parallelizes with a CPU
thread pool (`dispenso::parallel_for` over IK problems / frames); the TPU
replacement is data parallelism over a `jax.sharding.Mesh` with XLA
collectives over ICI. This package gives the two standing patterns first-class
entry points:

* `solve_ik_sharded` — pure DP over a batch of IK problems (the 100k-solves/s
  configuration: batch split across chips, no cross-talk).
* `momentum_tpu.sequence.sharded.solve_sequence_sharded` — frames split
  across chips with SPIKE substructuring for the temporal band and a psum'd
  universal block (re-exported here).
"""

from momentum_tpu.parallel.batch import (  # noqa: F401
    default_mesh,
    shard_batch,
    solve_ik_sharded,
    track_poses_sharded,
)
from momentum_tpu.sequence.sharded import solve_sequence_sharded  # noqa: F401
