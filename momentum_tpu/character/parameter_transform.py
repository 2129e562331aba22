"""ParameterTransform: the rig abstraction mapping model parameters → joint parameters.

Reference: momentum/character/parameter_transform.h:34-62 —

    joint_parameters = transform · model_parameters + offsets

with `transform` a sparse (nJoints·7 × nModelParams) matrix. On TPU the matrix
is stored DENSE: at typical sizes (~350×250) a dense matmul on the MXU beats
any sparse representation, and the apply is then one einsum (SURVEY.md §7.1).

`activeJointParams` (parameter_transform.h:40-60: which joint parameters are
driven by any enabled model parameter) becomes a float/bool mask computed by a
matvec over the |transform| pattern.

The pseudo-inverse mapping (InverseParameterTransform,
inverse_parameter_transform.h) is a least-squares solve done with a
precomputed pinv matrix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.character.skeleton import PARAMS_PER_JOINT

__all__ = ["ParameterTransform", "make_identity_transform"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParameterTransform:
    """Dense rig matrix. transform: (nJointParams, nModelParams); offsets: (nJointParams,)."""

    transform: jnp.ndarray
    offsets: jnp.ndarray
    names: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # named parameter sets (reference: ParameterSets, bitsets by name) as static
    # dict name -> tuple of parameter indices
    parameter_sets: dict = dataclasses.field(default_factory=dict, metadata=dict(static=True))
    # named pose presets (reference: PoseConstraints, parameter_transform.h
    # poseConstraints) as static dict name -> ((param index, value), ...)
    pose_constraints: dict = dataclasses.field(default_factory=dict, metadata=dict(static=True))

    @property
    def num_model_parameters(self) -> int:
        return self.transform.shape[1]

    @property
    def num_joint_parameters(self) -> int:
        return self.transform.shape[0]

    @property
    def num_joints(self) -> int:
        return self.num_joint_parameters // PARAMS_PER_JOINT

    def apply(self, model_params: jnp.ndarray) -> jnp.ndarray:
        """(..., nP) → (..., nJ*7). One dense MXU matmul (parameter_transform.cpp:110)."""
        return jnp.einsum("jp,...p->...j", self.transform, model_params) + self.offsets

    def parameter_index(self, name: str) -> int:
        return self.names.index(name)

    def parameter_set_mask(self, set_name: str) -> jnp.ndarray:
        """0/1 mask over model params for a named parameter set."""
        idx = self.parameter_sets[set_name]
        m = np.zeros(self.num_model_parameters, np.float32)
        m[list(idx)] = 1.0
        return jnp.asarray(m)

    def active_joint_params(self, enabled: jnp.ndarray | None = None) -> jnp.ndarray:
        """Bool (nJ*7,): joint params driven by any enabled model param
        (parameter_transform.h computeActiveJointParams)."""
        pattern = jnp.abs(self.transform) > 0
        if enabled is None:
            return jnp.any(pattern, axis=1)
        return (pattern.astype(jnp.float32) @ enabled.astype(jnp.float32)) > 0

    def pinv(self) -> jnp.ndarray:
        """(nP, nJ*7) pseudo-inverse for joint→model mapping
        (inverse_parameter_transform.h). Host-side precompute."""
        return jnp.asarray(np.linalg.pinv(np.asarray(self.transform)))


def make_identity_transform(num_joints: int, dtype=jnp.float32) -> ParameterTransform:
    """One model parameter per joint parameter (for tests/debug)."""
    n = num_joints * PARAMS_PER_JOINT
    return ParameterTransform(
        transform=jnp.eye(n, dtype=dtype),
        offsets=jnp.zeros(n, dtype=dtype),
        names=tuple(f"p{i}" for i in range(n)),
    )
