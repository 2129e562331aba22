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

    # ---- pymomentum.geometry.ParameterTransform surface
    # (parameter_transform_pybind.cpp:176-244) ----

    @property
    def size(self) -> int:
        return self.num_model_parameters

    @property
    def all_parameters(self) -> np.ndarray:
        """Boolean mask with every parameter enabled."""
        return np.ones(self.num_model_parameters, bool)

    @property
    def no_parameters(self) -> np.ndarray:
        """Boolean mask with no parameter enabled."""
        return np.zeros(self.num_model_parameters, bool)

    def _name_mask(self, pred) -> np.ndarray:
        return np.asarray([pred(n) for n in self.names], bool)

    @property
    def scaling_parameters(self) -> np.ndarray:
        """Parameters controlling scale: names containing 'scale_'
        (parameter_transform.cpp:157-167)."""
        return self._name_mask(lambda n: "scale_" in n)

    @property
    def rigid_parameters(self) -> np.ndarray:
        """Parameters controlling the rigid transform: names containing
        'root_' or 'hips' (parameter_transform.cpp:173-183)."""
        return self._name_mask(lambda n: "root_" in n or "hips" in n)

    @property
    def blend_shape_parameters(self) -> np.ndarray:
        """Blendshape coefficient parameters ('blend_<i>' names, matching
        the reference's addBlendShapeParameters naming)."""
        return self._name_mask(lambda n: n.startswith("blend_"))

    @property
    def face_expression_parameters(self) -> np.ndarray:
        """Face-expression coefficient parameters ('face_expre_<i>')."""
        return self._name_mask(lambda n: n.startswith("face_expre_"))

    @property
    def pose_parameters(self) -> np.ndarray:
        """Everything except scaling/blendshape/face-expression parameters
        (parameter_transform.cpp:217-219 getPoseParameters)."""
        return (self.all_parameters & ~self.scaling_parameters
                & ~self.blend_shape_parameters
                & ~self.face_expression_parameters)

    def find_parameters(self, names, allow_missing: bool = False) -> np.ndarray:
        """Boolean mask with the named parameters set
        (parameter_transform_pybind.cpp:232-244)."""
        mask = np.zeros(self.num_model_parameters, bool)
        for n in names:
            if n in self.names:
                mask[self.names.index(n)] = True
            elif not allow_missing:
                raise ValueError(f"parameter {n!r} not in transform")
        return mask

    def parameters_for_joints(self, joint_indices) -> np.ndarray:
        """Boolean mask of parameters driving any of the given joints
        (parameter_transform_pybind.cpp:221-230)."""
        tf = np.asarray(self.transform)
        mask = np.zeros(self.num_model_parameters, bool)
        for j in joint_indices:
            rows = tf[int(j) * PARAMS_PER_JOINT:(int(j) + 1) * PARAMS_PER_JOINT]
            mask |= (np.abs(rows) > 0).any(axis=0)
        return mask

    def add_parameter_set(self, name: str, parameters) -> "ParameterTransform":
        """New transform with a named parameter set added (pybind
        add_parameter_set). `parameters` is a boolean mask or index list."""
        arr = np.asarray(parameters)
        idx = tuple(np.nonzero(arr)[0].tolist()) if arr.dtype == bool             else tuple(int(i) for i in arr)
        sets = dict(self.parameter_sets)
        sets[name] = idx
        return dataclasses.replace(self, parameter_sets=sets)

    def parameter_set(self, name: str) -> np.ndarray:
        """Boolean mask for a named parameter set (pybind parameter_set)."""
        mask = np.zeros(self.num_model_parameters, bool)
        mask[list(self.parameter_sets[name])] = True
        return mask

    def inverse(self) -> "InverseParameterTransform":
        """Least-squares joint→model inverse
        (inverse_parameter_transform.h; pybind ParameterTransform.inverse)."""
        return InverseParameterTransform(self)


class InverseParameterTransform:
    """Pseudo-inverse rig mapping: joint parameters → model parameters
    (inverse_parameter_transform.h InverseParameterTransform). apply() solves
    min ‖T·θ + offsets − joint_params‖² for θ via the precomputed pinv."""

    def __init__(self, parameter_transform: ParameterTransform):
        self.parameter_transform = parameter_transform
        self._pinv = parameter_transform.pinv()

    def apply(self, joint_params: jnp.ndarray) -> jnp.ndarray:
        """(..., nJ*7) → (..., nP)."""
        resid = joint_params - self.parameter_transform.offsets
        return jnp.einsum("pj,...j->...p", self._pinv, resid)


def make_identity_transform(num_joints: int, dtype=jnp.float32) -> ParameterTransform:
    """One model parameter per joint parameter (for tests/debug)."""
    n = num_joints * PARAMS_PER_JOINT
    return ParameterTransform(
        transform=jnp.eye(n, dtype=dtype),
        offsets=jnp.zeros(n, dtype=dtype),
        names=tuple(f"p{i}" for i in range(n)),
    )
