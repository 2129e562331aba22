#!/usr/bin/env python
"""Hello-world: build a character, pose it, solve IK back to the pose.

Mirror of the reference's examples/hello_world (create a test character,
run FK, solve a simple IK problem).
"""

# Allow running from a source checkout: `python examples/<tool>.py` puts
# examples/ (not the repo root) on sys.path
import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import numpy as np


def main():
    import jax.numpy as jnp

    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions, solve_ik
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(6)
    print(f"character: {char.num_joints} joints, "
          f"{char.num_model_parameters} model parameters")

    rng = np.random.default_rng(7)
    theta_gt = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters),
                           jnp.float32)
    states = char.skeleton_states(theta_gt)
    targets = char.locators.world_positions(states)
    print("FK: locator world positions at the target pose:")
    print(np.asarray(targets).round(3))

    ef = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(targets))
    fn = SkeletonSolverFunction(char, (ef,))
    res = solve_ik(fn, jnp.zeros(char.num_model_parameters),
                   options=SolverOptions(max_iterations=40, regularization=1e-5))
    err = float(fn.error(res.params))
    print(f"IK converged in {int(res.iterations)} iterations, "
          f"residual {err:.2e}")


if __name__ == "__main__":
    main()
