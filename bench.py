"""Benchmark: full-body IK solves/sec/chip (marker-tracking style workload).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json config 3 analog): a batch of independent per-frame IK
problems — position constraints from locators at a known ground-truth pose —
solved by the fused vmapped Gauss-Newton loop. vs_baseline is measured against
the driver-set target of 100k solves/sec (BASELINE.md: no published reference
numbers exist; the target is the north-star line).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

# BASELINE.json's north star is >=100k solves/sec on a v5e-8 (8-chip) slice;
# the metric is defined per chip, so the per-chip bar is 100k/8.
TARGET_SOLVES_PER_SEC_PER_CHIP = 100_000.0 / 8.0


def main():
    import jax
    import jax.numpy as jnp

    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
    from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt
    from momentum_tpu.testing.fixtures import create_test_character

    num_joints = 24
    batch = 2048
    iters = 16

    char = create_test_character(num_joints)
    rng = np.random.default_rng(0)
    thetas = jnp.asarray(
        rng.uniform(-0.3, 0.3, (batch, char.num_model_parameters)), jnp.float32
    )
    states = jax.vmap(char.skeleton_states)(thetas)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent),
        np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)),
    )
    x0 = jnp.zeros(char.num_model_parameters)
    opts = SolverOptions(max_iterations=iters, regularization=1e-4,
                         energy_from_residual=True)

    @jax.jit
    def solve_batch(targets):
        # batch-native path: batched analytic Jacobians + batched linalg +
        # the fused Pallas FK kernel — no vmap
        ef = dataclasses.replace(ef0, target=targets)
        fn = SkeletonSolverFunction(char, (ef,))
        x0b = jnp.broadcast_to(x0, (targets.shape[0],) + x0.shape)
        return solve_levenberg_marquardt(
            fn.residual, fn.error, x0b, options=opts,
            jacobian_fn=fn.residual_and_jacobian)

    # warmup / compile
    res = solve_batch(targets)
    jax.block_until_ready(res.params)

    # residual sanity: solves must actually converge
    med_err = float(jnp.nanmedian(res.error))
    nan_frac = float(jnp.mean(~jnp.isfinite(res.error)))
    conv_frac = float(jnp.mean(res.error < 1e-5))

    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = solve_batch(targets)
    jax.block_until_ready(res.params)
    dt = (time.perf_counter() - t0) / n_rep

    solves_per_sec = batch / dt
    print(
        json.dumps(
            {
                "metric": "full_body_ik_solves_per_sec_per_chip",
                "value": round(solves_per_sec, 1),
                "unit": f"solves/s ({num_joints}-joint char, {iters} LM iters, median residual {med_err:.2e}, {conv_frac:.2f} conv@1e-5, divergent {nan_frac:.3f})",
                "vs_baseline": round(solves_per_sec / TARGET_SOLVES_PER_SEC_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
