"""Sharded batch IK: split a batch of independent IK problems over a mesh.

This is the multi-chip configuration behind BASELINE's 100k-solves/sec
target: each chip solves its shard of the batch with the batch-native LM/GN
kernel; there is no cross-chip communication in the solve itself (pure data
parallelism — the reference's `dispenso::parallel_for` over problems,
tensor_ik.cpp:127, mapped onto ICI instead of CPU threads).

Everything here is plain `jax.sharding` + `jit`: the solver functions are
already batch-native, so sharding the leading axis is enough for XLA to
partition the whole solve.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["default_mesh", "shard_batch", "solve_ik_sharded", "track_poses_sharded"]


def default_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    """1-D mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(np.asarray(devs), axis_names=(axis,))


def shard_batch(tree, mesh, axis: str = "data", batch: Optional[int] = None):
    """Split leaves whose leading dim equals `batch` over the mesh axis;
    replicate everything else. `batch` defaults to the largest
    mesh-divisible leading dim found in the tree."""
    n = int(mesh.devices.size)
    if batch is None:
        dims = [jnp.asarray(x).shape[0]
                for x in jax.tree_util.tree_leaves(tree)
                if jnp.asarray(x).ndim > 0]
        candidates = [d for d in dims if d % n == 0 and d >= n]
        if not candidates:
            raise ValueError("no mesh-divisible leading batch axis found")
        batch = max(candidates)
    split = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def put(x):
        x = jnp.asarray(x)
        if x.ndim > 0 and x.shape[0] == batch:
            return jax.device_put(x, split)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, tree)


def solve_ik_sharded(solver_fn, x0, mesh=None, enabled_mask=None,
                     options=None, method: str = "levenberg_marquardt",
                     axis: str = "data"):
    """Batched IK with the batch dimension sharded over a device mesh.

    solver_fn: a SkeletonSolverFunction whose error-function arrays carry a
    leading batch axis (build it once with batched targets); x0 (B, P).
    The batch must be divisible by the mesh size. Returns a SolveResult with
    sharded outputs (device-resident; `np.asarray` gathers them).
    """
    from momentum_tpu.solver.gauss_newton import SolverOptions
    from momentum_tpu.solver.ik import solve_ik

    opts = options or SolverOptions()
    if mesh is None:
        mesh = default_mesh(axis=axis)
    n = mesh.devices.size
    b = x0.shape[0]
    if b % n:
        raise ValueError(f"batch {b} not divisible by mesh size {n}")

    solver_fn = shard_batch(solver_fn, mesh, axis, batch=b)
    x0 = shard_batch(jnp.asarray(x0), mesh, axis, batch=b)

    # close over the sharded solver_fn: its arrays enter the program as
    # committed constants with their shardings, and the host-side topology
    # queries (ancestor masks for analytic Jacobians) stay concrete
    @jax.jit
    def step(x0):
        return solve_ik(solver_fn, x0, enabled_mask, opts, method)

    return step(x0)


def track_poses_sharded(character, markers, mesh=None, config=None,
                        initial=None, enabled_mask=None, axis: str = "data"):
    """Frame-parallel marker tracking with frames sharded over a device mesh
    (the multi-chip shape of BASELINE config 3: trackPosesForFrames's
    thread-parallel frame loop becomes pure data parallelism over ICI).

    Frames must divide the mesh size; pad the clip (e.g. repeat the last
    frame) otherwise. Returns a TrackingResult with device-sharded outputs.
    """
    import dataclasses as _dc

    from momentum_tpu.tracking.config import TrackingConfig
    from momentum_tpu.tracking.tracker import track_poses_batched

    config = config or TrackingConfig()
    if mesh is None:
        mesh = default_mesh(axis=axis)
    n = mesh.devices.size
    f = markers.num_frames
    if f % n:
        raise ValueError(
            f"frame count {f} not divisible by mesh size {n}; pad the clip")
    markers = _dc.replace(
        markers,
        positions=shard_batch(jnp.asarray(markers.positions), mesh, axis, f),
        occluded=shard_batch(jnp.asarray(markers.occluded), mesh, axis, f),
    )
    return track_poses_batched(character, markers, config,
                               initial=initial, enabled_mask=enabled_mask)
