#!/usr/bin/env python
"""Sequence-solver benchmark (BASELINE config 5 shape): shared scale +
per-frame pose over many frames, optionally sharded over all local devices.

Usage: python examples/benchmark_sequence.py [--frames 1024] [--sharded]
"""

# Allow running from a source checkout: `python examples/<tool>.py` puts
# examples/ (not the repo root) on sys.path
import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--joints", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sharded", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.sequence import (
        ModelParametersSequenceErrorFunction,
        SequenceSolverFunction,
        solve_sequence,
        stack_frames,
    )
    from momentum_tpu.solver import SolverOptions
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(args.joints)
    p = char.num_model_parameters
    f = args.frames
    rng = np.random.default_rng(0)
    t = np.linspace(0, 10, f)[:, None]
    thetas = jnp.asarray(
        0.25 * np.sin(2 * np.pi * 0.5 * t + rng.uniform(0, 6, p)), jnp.float32)
    si = char.parameter_transform.parameter_index("scale_global")
    thetas = thetas.at[:, si].set(0.2)
    states = jax.vmap(char.skeleton_states)(thetas)
    targets = jax.vmap(char.locators.world_positions)(states)

    efs = stack_frames([
        PositionErrorFunction.create(
            np.asarray(char.locators.parent), np.asarray(char.locators.offset),
            np.asarray(targets[i])) for i in range(f)
    ])
    universal = np.zeros(p, bool)
    universal[si] = True
    fn = SequenceSolverFunction.create(
        char, f, universal=universal, per_frame_errors=(efs,),
        sequence_errors=(ModelParametersSequenceErrorFunction.create(p, weight=1e-3),))

    pf0 = jnp.zeros((f, fn.num_per_frame))
    u0 = jnp.zeros((fn.num_universal,))
    opts = SolverOptions(max_iterations=args.iters, min_iterations=args.iters,
                         regularization=1e-5)

    if args.sharded:
        from jax.sharding import Mesh

        from momentum_tpu.sequence.sharded import solve_sequence_sharded

        mesh = Mesh(np.asarray(jax.devices()), ("seq",))
        run = jax.jit(lambda a, b: solve_sequence_sharded(fn, a, b, mesh, "seq", opts))
    else:
        run = jax.jit(lambda a, b: solve_sequence(fn, a, b, opts))

    res = run(pf0, u0)
    jax.block_until_ready(res.per_frame)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        res = run(pf0, u0)
    jax.block_until_ready(res.per_frame)
    dt = (time.perf_counter() - t0) / n
    print(f"{f} frames x {args.iters} GN iters: {dt * 1e3:.1f} ms "
          f"({f / dt:.0f} frames/s), error {float(res.error):.3e}, "
          f"recovered scale {float(res.universal[0]):.4f} (true 0.2)"
          + (" [sharded]" if args.sharded else ""))


if __name__ == "__main__":
    main()
