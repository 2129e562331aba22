"""Skeleton as a frozen pytree.

The reference's SkeletonT (momentum/character/skeleton.h:138-193) is a list of
JointT{name, parent, preRotation, translationOffset} kept in topological order
(parent index < child index, skeleton.h:139-147). Here the per-joint fields are
stacked into arrays so FK is pure array code:

    joint_parent        (nJ,)  int32, -1 for root(s)
    pre_rotation        (nJ,4) quaternion (x,y,z,w)
    translation_offset  (nJ,3)

Names are static (aux) data — they never enter jitted code.

Each joint has 7 parameters (tx,ty,tz,rx,ry,rz,scale) — kParametersPerJoint=7
(character/types.h:21); scale is stored log2 (joint_state.cpp:61-63).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

PARAMS_PER_JOINT = 7
INVALID_INDEX = -1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Skeleton:
    joint_parent: jnp.ndarray = dataclasses.field(metadata=dict(static=False))
    pre_rotation: jnp.ndarray = dataclasses.field(metadata=dict(static=False))
    translation_offset: jnp.ndarray = dataclasses.field(metadata=dict(static=False))
    joint_names: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # precomputed pointer-doubling schedule (tuple of tuples) — static so FK
    # works when the skeleton arrays are traced (e.g. inside shard_map)
    prefix_schedule: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def num_joints(self) -> int:
        return self.pre_rotation.shape[0]

    @property
    def num_joint_parameters(self) -> int:
        return self.num_joints * PARAMS_PER_JOINT

    def joint_index(self, name: str) -> int:
        return self.joint_names.index(name)

    # ---- pymomentum.geometry.Skeleton property/method spellings
    # (skeleton_pybind.cpp:109-260) ----

    @property
    def size(self) -> int:
        return self.num_joints

    def __len__(self) -> int:
        return self.num_joints

    @property
    def joint_parents(self) -> np.ndarray:
        """(nJ,) parent indices, -1 for roots."""
        return np.asarray(self.joint_parent)

    @property
    def pre_rotations(self) -> np.ndarray:
        """(nJ, 4) pre-rotation quaternions (x, y, z, w)."""
        return np.asarray(self.pre_rotation)

    @property
    def offsets(self) -> np.ndarray:
        """(nJ, 3) translation offsets."""
        return np.asarray(self.translation_offset)

    def get_parent(self, joint_index: int) -> int:
        """Parent index of a joint, -1 for roots (skeleton_pybind get_parent)."""
        return int(self._parents_np()[joint_index])

    def get_child_joints(self, root_joint_index: int,
                         recursive: bool = True) -> list:
        """Joints parented under `root_joint_index` (excluding it);
        recursive=False → direct children only (skeleton_pybind
        get_child_joints)."""
        parents = self._parents_np()
        if not recursive:
            return [int(j) for j in np.nonzero(parents == root_joint_index)[0]]
        out = np.zeros(len(parents), bool)
        out[root_joint_index] = True
        for j in range(len(parents)):  # topological: parent < child
            p = parents[j]
            if p != INVALID_INDEX and out[p]:
                out[j] = True
        out[root_joint_index] = False
        return [int(j) for j in np.nonzero(out)[0]]

    @property
    def upper_body_joints(self) -> list:
        """Joints parented under 'b_spine0' (inclusive), the reference's
        upper-body convenience set (skeleton_pybind.cpp:201-206)."""
        if "b_spine0" not in self.joint_names:
            raise ValueError("skeleton has no 'b_spine0' joint")
        root = self.joint_names.index("b_spine0")
        return [root] + self.get_child_joints(root, recursive=True)

    # ---- static (host-side) hierarchy queries; mirror skeleton.h ancestry API ----

    def _parents_np(self) -> np.ndarray:
        return np.asarray(self.joint_parent)

    def ancestor_matrix(self) -> np.ndarray:
        """Boolean (nJ, nJ): out[a, j] == True iff a is j's ancestor-or-self.

        This is the static mask that turns the reference's per-constraint
        chain walk (skeleton_derivative.cpp) into a dense masked matmul on TPU.
        """
        parents = self._parents_np()
        n = len(parents)
        out = np.zeros((n, n), dtype=bool)
        for j in range(n):
            a = j
            while a != INVALID_INDEX:
                out[a, j] = True
                a = parents[a]
        return out

    def is_ancestor(self, joint_index: int, ancestor_joint_index: int) -> bool:
        """True if `ancestor_joint_index` is `joint_index` or one of its
        ancestors — inclusive, matching skeleton.h isAncestor(jointId,
        ancestorJointId) and the pybind argument order."""
        parents = self._parents_np()
        a = joint_index
        while a != INVALID_INDEX:
            if a == ancestor_joint_index:
                return True
            a = int(parents[a])
        return False

    def common_ancestor(self, a: int, b: int) -> int:
        parents = self._parents_np()
        chain = set()
        x = a
        while x != INVALID_INDEX:
            chain.add(x)
            x = int(parents[x])
        x = b
        while x != INVALID_INDEX:
            if x in chain:
                return x
            x = int(parents[x])
        return INVALID_INDEX

    def prefix_levels(self) -> list[np.ndarray]:
        """Pointer-doubling parent-index schedule for binary-lifting FK.

        Uses a virtual identity node at index nJ (roots point at it, it points
        at itself, and its transform is identity), so each doubling round is an
        unconditional gather+compose with no masking:

            g_{k+1}[j] = g_k[p_k[j]] ∘ g_k[j];   p_{k+1} = p_k[p_k]

        After ceil(log2(depth)) rounds g[j] is the full root→j product. Same
        role as the reference torch backend's index schedule
        (pymomentum/backend/utils.py:24-70), reshaped for gather-friendly TPU
        execution. Returned arrays have length nJ+1 (sentinel last).
        """
        if self.prefix_schedule:
            return [np.asarray(p, np.int32) for p in self.prefix_schedule]
        parents = self._parents_np()
        n = len(parents)
        p = np.empty(n + 1, dtype=np.int32)
        p[:n] = np.where(parents == INVALID_INDEX, n, parents)
        p[n] = n
        levels = []
        while not np.all(p == n):
            levels.append(p.copy())
            p = p[p]
        return levels

    def validate(self) -> None:
        parents = self._parents_np()
        for j, p in enumerate(parents):
            if p != INVALID_INDEX and p >= j:
                raise ValueError(
                    f"skeleton not topologically sorted: joint {j} has parent {p}"
                )


def _max_depth(parents: np.ndarray) -> int:
    depth = np.zeros(len(parents), dtype=np.int64)
    for j, p in enumerate(parents):
        depth[j] = 0 if p == INVALID_INDEX else depth[p] + 1
    return int(depth.max()) + 1 if len(parents) else 0


def make_skeleton(
    parents: Sequence[int],
    pre_rotations: np.ndarray | None = None,
    translation_offsets: np.ndarray | None = None,
    names: Sequence[str] | None = None,
    dtype=jnp.float32,
) -> Skeleton:
    n = len(parents)
    if pre_rotations is None:
        pre_rotations = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))
    if translation_offsets is None:
        translation_offsets = np.zeros((n, 3))
    if names is None:
        names = tuple(f"joint{i}" for i in range(n))
    skel = Skeleton(
        joint_parent=jnp.asarray(parents, jnp.int32),
        pre_rotation=jnp.asarray(pre_rotations, dtype),
        translation_offset=jnp.asarray(translation_offsets, dtype),
        joint_names=tuple(names),
    )
    skel.validate()
    schedule = tuple(tuple(int(x) for x in lev) for lev in skel.prefix_levels())
    return dataclasses.replace(skel, prefix_schedule=schedule)
