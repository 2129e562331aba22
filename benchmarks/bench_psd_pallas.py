"""A/B: XLA blocked psd_solve vs the Pallas panel-factor solve on TPU.

Chained timing (N data-dependent reps per dispatch — tunnel-safe, see
bench_lm_stage_budget.py). Also checks solution agreement at the bench
shape before timing.

Usage: timeout 3000 python benchmarks/bench_psd_pallas.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import time

import numpy as np

import jax
import jax.numpy as jnp

from momentum_tpu.math.linalg import psd_solve
from momentum_tpu.ops.psd_pallas import psd_solve_pallas

B = int(_os.environ.get("MOMENTUM_TPU_BENCH_BATCH", 2048))
N = int(_os.environ.get("MOMENTUM_TPU_BUDGET_CHAIN", 20))
EPS = 1e-37


def main():
    n = 157
    rng = np.random.default_rng(0)
    jh = jnp.asarray(rng.normal(size=(B, 240, n)).astype(np.float32))

    @jax.jit
    def build(jh):
        a = jnp.einsum("brp,brq->bpq", jh, jh) + 0.1 * jnp.eye(n)
        return a

    a = build(jh)
    b = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    a.block_until_ready()
    print(f"psd A/B @ B={B}, n={n}, chain N={N}, "
          f"backend={jax.default_backend()}", flush=True)

    # correctness on device
    x_ref = jax.jit(psd_solve)(a, b)
    x_pal = jax.jit(psd_solve_pallas)(a, b)
    rel = float(jnp.max(jnp.abs(x_pal - x_ref))
                / (jnp.max(jnp.abs(x_ref)) + 1e-30))
    print(f"  agreement rel err: {rel:.2e}", flush=True)

    def chain(solver):
        @jax.jit
        def run(a, b):
            def body(i, carry):
                a, b = carry
                x = solver(a, b)
                return (a + EPS * x[:, None, :], b + EPS * x)
            return jax.lax.fori_loop(0, N, body, (a, b))
        return run

    from momentum_tpu.math.linalg import blocked_cholesky, blocked_cholesky_solve

    def psd_solve_xla(a, b):
        # the pre-round-5 XLA blocked path, bypassing the Pallas dispatch
        pad = (-a.shape[-1]) % 32
        bsz, nn = a.shape[0], a.shape[-1]
        ap = jnp.zeros((bsz, nn + pad, nn + pad), a.dtype)
        ap = ap.at[:, :nn, :nn].set(a)
        idx = jnp.arange(nn, nn + pad)
        ap = ap.at[:, idx, idx].set(1.0)
        rhs = jnp.concatenate([b, jnp.zeros((bsz, pad), b.dtype)], -1)[..., None]
        _, factors = blocked_cholesky(ap)
        return blocked_cholesky_solve(None, factors, rhs)[..., :nn, 0]

    pw = _os.environ.get("MOMENTUM_TPU_PSD_PW", "64")
    for name, solver in (("XLA blocked psd_solve", psd_solve_xla),
                         (f"Pallas panels w={pw} + subst kernel",
                          psd_solve_pallas)):
        run = chain(solver)
        out = run(a, b)
        float(jnp.sum(out[1]))
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(a, b)
        float(jnp.sum(out[1]))
        dt = (time.perf_counter() - t0) / (3 * N)
        print(f"  {name:34s} {dt*1e3:8.3f} ms/solve-batch", flush=True)


if __name__ == "__main__":
    main()
