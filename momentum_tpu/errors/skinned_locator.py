"""SkinnedLocatorErrorFunction: position targets on multi-joint skinned
locators.

Reference: character/skinned_locator.h:25-47 (locator whose world position is
the skin-weighted blend of up to kMaxSkinJoints joint transforms applied to a
rest-pose point) + character_solver/skinned_locator_error_function.cpp
(position residual vs target).
    world = Σ_k w_k · (T_k · invBind_k) · restPos
    f = world − target
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import EvalContext, VectorErrorFunction, pad_rows
from momentum_tpu.math import skel_state as ss
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = ["SkinnedLocatorErrorFunction"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SkinnedLocatorErrorFunction(VectorErrorFunction):
    parents: jnp.ndarray  # (C, K) int32 skinning joints
    skin_weights: jnp.ndarray  # (C, K)
    rest_position: jnp.ndarray  # (C, 3) in the rest pose
    target: jnp.ndarray  # (C, 3) world targets
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 3

    def constraint_count(self) -> int:
        return self.parents.shape[0]

    def world_positions(self, character, skel_states):
        char = character.with_inverse_bind_pose()
        skin_t = ss.multiply(
            jnp.take(skel_states, self.parents, axis=-2),
            jnp.take(char.inverse_bind_pose, self.parents, axis=0),
        )  # (..., C, K, 8)
        pts = ss.transform_points(skin_t, self.rest_position[..., :, None, :])
        return jnp.einsum("...ck,...cki->...ci", self.skin_weights, pts)

    def raw(self, character, ctx: EvalContext):
        world = self.world_positions(character, ctx.skel_states)
        return world - self.target, self.cweight

    @classmethod
    def create(cls, parents, skin_weights, rest_position, target, cweight=None,
               weight=1.0, loss=None, capacity=None):
        parents = np.asarray(parents, np.int32)
        n, k = parents.shape
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        return cls(
            parents=jnp.asarray(pad_rows(parents, cap)),
            skin_weights=jnp.asarray(pad_rows(np.asarray(skin_weights, np.float32).reshape(n, k), cap)),
            rest_position=jnp.asarray(pad_rows(np.asarray(rest_position, np.float32).reshape(n, 3), cap)),
            target=jnp.asarray(pad_rows(np.asarray(target, np.float32).reshape(n, 3), cap)),
            cweight=jnp.asarray(pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            loss=loss or GeneralizedLoss(),
        )
