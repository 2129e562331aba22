"""Compacted tail refinement for batched IK solves.

TPU-native "continuous batching": after `k_full` full-batch LM iterations
most batch elements have converged, so the remaining iterations are run only
on the worst `capacity` elements (gathered by energy into a compacted
subbatch) and scattered back. Total cost ≈ k_full + r_refine·(capacity/B)
iteration-equivalents instead of k_full + r_refine.

There is no reference analog: the reference solves batch elements on CPU
threads that exit independently (tensor_ik.cpp:127 dispenso::parallel_for),
so converged elements cost nothing. Under SPMD every element pays every
iteration — compaction restores the early-exit economics with static shapes
(jax.lax.top_k + gather + scatter).

The refinement solve resumes each element's LM damping state exactly via
SolveResult.lambda_final → lambda0, so refined elements follow the SAME
iterate sequence they would in a full-length solve: with capacity covering
every unconverged element, the result matches the (k_full + r_refine)-
iteration solve on the refined set.

Measured on the driver workload (v5e, batch 2048, 51-joint/157-param rig,
80 markers): LM-6 baseline 14.5k solves/s @ 0.9844 conv@1e-5; compacted
k=5/r=6/K=128 → 16.4k @ 0.9976; k=5/r=2/K=128 → 17.0k @ 0.9854 — faster
AND more converged than the uncompacted baseline.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from momentum_tpu.solver.gauss_newton import SolveResult

__all__ = ["gather_batch", "scatter_batch", "solve_compacted"]

_BIG = 3.0e38  # sorts NaN/inf energies first so divergent elements refine


def gather_batch(tree, idx: jnp.ndarray, batch_size: int):
    """Gather leaves with leading dim == batch_size at `idx`; pass through
    shared (unbatched) leaves unchanged. The standard way to compact the
    per-element arrays of an error-function pytree (targets, weights, ...)
    while keeping shared tables (parents, offsets, priors) intact."""

    def g(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == batch_size:
            return leaf[idx]
        return leaf

    return jax.tree_util.tree_map(g, tree)


def scatter_batch(tree, sub, idx: jnp.ndarray, capacity: int):
    """Inverse of gather_batch: write `sub`'s compacted leaves back at `idx`."""

    def s(full, small):
        if (hasattr(small, "ndim") and small.ndim >= 1
                and small.shape[0] == capacity
                and hasattr(full, "ndim") and full.ndim == small.ndim):
            return full.at[idx].set(small)
        return full

    return jax.tree_util.tree_map(s, tree, sub)


def solve_compacted(
    solve_fn: Callable,
    inputs,
    x0: jnp.ndarray,
    capacity: int,
    k_full: int,
    r_refine: int,
) -> SolveResult:
    """Two-stage batched solve: full batch for `k_full` iterations, then
    `r_refine` more iterations on the `capacity` worst elements only.

    solve_fn(inputs, x0, max_iterations, lambda0) -> SolveResult — the
    caller's jitted solve; `inputs` is any pytree whose leading-batch-dim
    leaves are per-element (gathered for the refinement stage). lambda0 is
    None for the first stage and the gathered per-element damping for the
    second (LM solvers resume; GN solvers may ignore it).

    capacity must cover every element still unconverged after k_full
    iterations for the result to match the full (k_full + r_refine)-iteration
    solve; elements beyond capacity keep their k_full-iteration result.
    """
    batch = x0.shape[0]
    res1 = solve_fn(inputs, x0, k_full, None)
    # capacity is static (shapes); k_full/r_refine may be traced scalars —
    # a traced r_refine must be ≥ 1 (the static skip only fires on Python ints)
    if capacity <= 0 or (isinstance(r_refine, int) and r_refine <= 0):
        return res1
    if capacity > batch:
        raise ValueError(f"capacity {capacity} exceeds batch {batch}")
    key = jnp.nan_to_num(res1.error, nan=_BIG, posinf=_BIG)
    _, idx = jax.lax.top_k(key, capacity)
    sub_inputs = gather_batch(inputs, idx, batch)
    lam = None if res1.lambda_final is None else res1.lambda_final[idx]
    res2 = solve_fn(sub_inputs, res1.params[idx], r_refine, lam)
    params = res1.params.at[idx].set(res2.params)
    error = res1.error.at[idx].set(res2.error)
    converged = res1.converged.at[idx].set(res2.converged)
    lam_out = None if res1.lambda_final is None else \
        res1.lambda_final.at[idx].set(
            res1.lambda_final[idx] if res2.lambda_final is None
            else res2.lambda_final)
    return SolveResult(
        params=params, error=error,
        iterations=res1.iterations + res2.iterations,
        converged=converged, lambda_final=lam_out)
