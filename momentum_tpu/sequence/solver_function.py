"""SequenceSolverFunction: multi-frame objective with per-frame + universal
parameter split.

Reference: character_sequence_solver/sequence_solver_function.h:31-131 — holds
per-frame ModelParameters, splits the parameter space into per-frame indices
and universal indices (shared across all frames, e.g. scale/shape), and
evaluates per-frame error functions (one per frame, or broadcast `kAllFrames`)
plus sequence error functions spanning `window` contiguous frames.

TPU-native shape: per-frame error functions are stored *stacked* — every array
field carries a leading F axis — so one `vmap` evaluates all frames at once
(the reference's dispenso frame-parallel FK, sequence_solver_function.cpp:
171-198, becomes a batched FK). Sequence errors evaluate on sliding windows
gathered from the per-frame contexts.

Unknowns: pf (F, n_pf) per-frame values + u (n_u,) universal values;
the full per-frame parameter vector is assembled by scatter into static index
sets (the joined-vector layout of sequence_solver_function.h:55-60).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.character.character import Character
from momentum_tpu.solver.skeleton_solver_function import SkeletonSolverFunction

__all__ = ["SequenceSolverFunction", "stack_frames", "broadcast_frames"]


def stack_frames(efs):
    """Stack a list of per-frame error functions (same type/shapes) into one
    leading-F stacked module (addErrorFunction(frame, ef) for every frame)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *efs)


def broadcast_frames(ef, num_frames: int):
    """Tile one error function across all frames (kAllFrames broadcast,
    sequence_solver_function.h:84-86)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (num_frames,) + x.shape), ef
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SequenceSolverFunction:
    character: Character
    # stacked per-frame error functions: every array field has leading F
    per_frame_errors: tuple
    # sequence error functions (window W each, unstacked)
    sequence_errors: tuple
    num_frames: int = dataclasses.field(metadata=dict(static=True))
    universal_index: tuple = dataclasses.field(metadata=dict(static=True))
    per_frame_index: tuple = dataclasses.field(metadata=dict(static=True))

    # ---- parameter packing ----

    @property
    def num_per_frame(self) -> int:
        return len(self.per_frame_index)

    @property
    def num_universal(self) -> int:
        return len(self.universal_index)

    def join(self, pf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """(F, n_pf), (n_u,) → (F, P) full model parameters per frame."""
        p = self.character.num_model_parameters
        f = self.num_frames
        theta = jnp.zeros(pf.shape[:-2] + (f, p), pf.dtype)
        if self.per_frame_index:
            theta = theta.at[..., np.asarray(self.per_frame_index)].set(pf)
        if self.universal_index:
            theta = theta.at[..., np.asarray(self.universal_index)].set(
                jnp.broadcast_to(u[..., None, :], pf.shape[:-2] + (f, self.num_universal))
            )
        return theta

    def split(self, thetas: jnp.ndarray):
        """(F, P) → (pf (F, n_pf), u (n_u,) from frame 0)."""
        pf = thetas[..., np.asarray(self.per_frame_index)] if self.per_frame_index else \
            jnp.zeros(thetas.shape[:-1] + (0,), thetas.dtype)
        u = thetas[..., 0, np.asarray(self.universal_index)] if self.universal_index else \
            jnp.zeros(thetas.shape[:-2] + (0,), thetas.dtype)
        return pf, u

    # ---- evaluation ----

    def _context(self, theta):
        # include sequence errors so their needs_mesh flags trigger the
        # mesh pipeline in the shared per-frame context
        efs = self.per_frame_errors + self.sequence_errors
        return SkeletonSolverFunction(self.character, efs).context(theta)

    def frame_contexts(self, thetas: jnp.ndarray):
        """(F, P) → EvalContext with leading F axis (one FK per frame, vmapped)."""
        return jax.vmap(self._context)(thetas)

    def frame_residual(self, theta_f, ef_frame):
        """Residual rows for ONE frame given its unstacked error functions."""
        ctx = self._context(theta_f)
        rows = [ef.residual(self.character, ctx) for ef in ef_frame]
        if not rows:
            return jnp.zeros((0,), theta_f.dtype)
        return jnp.concatenate(rows, axis=-1)

    def frame_error(self, theta_f, ef_frame):
        ctx = self._context(theta_f)
        total = jnp.zeros((), theta_f.dtype)
        for ef in ef_frame:
            total = total + ef.error(self.character, ctx)
        return total

    def _window_contexts(self, ctxs, window: int):
        """Gather sliding windows: leading axis F → (F-W+1, W)."""
        f = self.num_frames
        idx = jnp.arange(f - window + 1)[:, None] + jnp.arange(window)[None, :]
        return jax.tree_util.tree_map(lambda a: a[idx], ctxs)

    def error(self, pf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        thetas = self.join(pf, u)
        per_frame = jax.vmap(self.frame_error)(thetas, self.per_frame_errors)
        total = jnp.sum(per_frame)
        if self.sequence_errors:
            ctxs = self.frame_contexts(thetas)
            for sef in self.sequence_errors:
                w = sef.window
                ctx_w = self._window_contexts(ctxs, w)
                errs = jax.vmap(lambda c: sef.error(self.character, c))(ctx_w)
                total = total + jnp.sum(errs)
        return total

    def gradient(self, pf: jnp.ndarray, u: jnp.ndarray):
        return jax.grad(self.error, argnums=(0, 1))(pf, u)

    # ---- construction ----

    @classmethod
    def create(
        cls,
        character: Character,
        num_frames: int,
        universal: Optional[np.ndarray] = None,  # bool/0-1 mask over model params
        per_frame_errors=(),
        sequence_errors=(),
    ):
        p = character.num_model_parameters
        if universal is None:
            universal = np.zeros(p, bool)
        universal = np.asarray(universal).astype(bool)
        u_idx = tuple(int(i) for i in np.nonzero(universal)[0])
        pf_idx = tuple(int(i) for i in np.nonzero(~universal)[0])
        return cls(
            character=character,
            per_frame_errors=tuple(per_frame_errors),
            sequence_errors=tuple(sequence_errors),
            num_frames=num_frames,
            universal_index=u_idx,
            per_frame_index=pf_idx,
        )
