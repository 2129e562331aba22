"""A/B measurement of the batched FK implementations on TPU.

Closes VERDICT round-2 weak #2: fk_pallas (ops/fk_pallas.py) is the
production dispatch for batched TPU FK (character/fk.py:126-131) but had no
recorded TPU measurement. This script times the three implementations at the
bench shape (B=2048, 51-joint full-body rig) with the sound pipelined-timing
methodology (N in-order dispatches + ONE terminal host-transfer sync; see
docs/BENCHMARKS.md "Timing methodology").

Reference precedent: pymomentum/backend/triton_fk.py:182-208 (the measured
GPU FK kernel this tier mirrors).

Usage: python benchmarks/bench_fk.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:  # `python benchmarks/bench_fk.py` from any cwd
    sys.path.insert(0, _repo)

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.character import fk
from momentum_tpu.testing.fixtures import create_fullbody_character


def _time(fn, *args, n_rep=30):
    out = fn(*args)
    float(jnp.sum(out))  # compile + real round trip
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n_rep, out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    char = create_fullbody_character()
    skel = char.skeleton
    rng = np.random.default_rng(0)
    mp = jnp.asarray(
        rng.uniform(-0.3, 0.3, (batch, char.num_model_parameters)), jnp.float32)
    jp = jax.jit(jax.vmap(char.parameter_transform.apply))(mp)
    local = jax.jit(lambda j: fk.local_skel_states(skel, j))(jp)
    local.block_until_ready()
    print(f"backend={jax.default_backend()} batch={batch} "
          f"nJ={skel.num_joints}", file=sys.stderr)

    scan = jax.jit(lambda l: fk.global_skel_states_scan(skel, l))
    lifted = jax.jit(lambda l: fk.global_skel_states_lifted(skel, l))
    results = {}
    dt, ref = _time(scan, local)
    results["scan"] = dt
    dt, out = _time(lifted, local)
    results["lifted"] = dt
    err_l = float(jnp.max(jnp.abs(out - ref)))

    err_p = None
    try:
        from momentum_tpu.ops.fk_pallas import make_differentiable_fk

        pallas = jax.jit(make_differentiable_fk(skel))
        dt, out = _time(pallas, local)
        results["pallas"] = dt
        err_p = float(jnp.max(jnp.abs(out - ref)))
    except Exception as e:  # noqa: BLE001 — record the failure, keep the A/B
        print(f"pallas path failed: {e!r}", file=sys.stderr)

    for name, dt in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"{name:8s} {dt*1e3:8.3f} ms  ({batch/dt:,.0f} FK/s)")
    print(f"max|lifted-scan|={err_l:.2e}"
          + (f"  max|pallas-scan|={err_p:.2e}" if err_p is not None else ""))


if __name__ == "__main__":
    main()
