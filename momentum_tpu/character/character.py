"""Character: the aggregate data model (reference: momentum/character/character.h:33-283).

A frozen pytree holding skeleton + parameter transform + optional mesh/skin/
blendshape/limits/locators/collision. Mirrors the reference's aggregate but as
arrays; names and other non-numeric metadata are static aux fields.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from momentum_tpu.character.blend_shape import BlendShape
from momentum_tpu.character.limits import ParameterLimits, make_empty_limits
from momentum_tpu.character.parameter_transform import ParameterTransform
from momentum_tpu.character.skeleton import Skeleton
from momentum_tpu.character.skinning import SkinWeights
from momentum_tpu.character import fk
from momentum_tpu.math import skel_state as ss

__all__ = ["Mesh", "Locators", "SkinnedLocators", "Character", "CollisionGeometry",
           "PhysicalProperties"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Mesh:
    """Vertices/normals/faces (+ optional attrs) — math/mesh.h equivalent."""

    vertices: jnp.ndarray  # (V, 3)
    faces: jnp.ndarray  # (F, 3) int32
    normals: jnp.ndarray | None = None
    texcoords: jnp.ndarray | None = None
    # per-face texcoord indices (math/mesh.h texcoord_faces); None ⇒ texcoords
    # are per-vertex and `faces` indexes them directly
    texcoord_faces: jnp.ndarray | None = None
    colors: jnp.ndarray | None = None
    confidence: jnp.ndarray | None = None
    # polyline data (math/mesh.h lines/texcoord_lines): tuple of index
    # arrays, one per polyline — static so jit treats topology as constant
    lines: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    texcoord_lines: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    # pymomentum.geometry.Mesh property spellings (mesh_pybind.cpp)
    @property
    def n_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def n_faces(self) -> int:
        return self.faces.shape[0]

    def with_updated_normals(self) -> "Mesh":
        """Recompute area-weighted vertex normals (mesh.h updateNormals;
        mesh_pybind with_updated_normals)."""
        from momentum_tpu.character.skinning import update_normals

        return dataclasses.replace(
            self, normals=update_normals(self.vertices, self.faces))

    def self_intersections(self, chunk: int = 256):
        """(N, 2) face-index pairs that intersect, excluding pairs sharing a
        vertex (mesh_pybind self_intersections → intersection.h)."""
        from momentum_tpu.math.mesh_ops import intersect_mesh_brute_force

        return intersect_mesh_brute_force(self.vertices, self.faces,
                                          chunk=chunk)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Locators:
    """Markers attached to joints: offset in parent-joint frame + per-axis
    lock weights (character/locator.h). Padded/static names tuple."""

    parent: jnp.ndarray  # (L,) int32
    offset: jnp.ndarray  # (L, 3)
    weight: jnp.ndarray  # (L,)
    names: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # per-axis hard-lock flags + calibration limit pull (locator.h:21-46:
    # limit_weight penalizes offset drift away from limit_origin during
    # locator calibration; attached_to_skin/skin_offset mark skin-derived
    # locators). All optional; None means all-zero defaults.
    locked: Optional[jnp.ndarray] = None  # (L, 3) 0/1
    limit_weight: Optional[jnp.ndarray] = None  # (L, 3)
    limit_origin: Optional[jnp.ndarray] = None  # (L, 3)
    attached_to_skin: Optional[jnp.ndarray] = None  # (L,) 0/1
    skin_offset: Optional[jnp.ndarray] = None  # (L,)

    @property
    def num_locators(self) -> int:
        return self.parent.shape[0]

    def world_positions(self, global_states: jnp.ndarray) -> jnp.ndarray:
        """LocatorState: world positions of all locators (locator_state.h)."""
        states = jnp.take(global_states, self.parent, axis=-2)
        return ss.transform_points(states, self.offset)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SkinnedLocators:
    """Locators skinned to multiple joints (character/skinned_locator.h:25-47):
    rest-pose point transformed by the blended skinning matrices of up to K
    parent joints."""

    parents: jnp.ndarray  # (L, K) int32
    skin_weights: jnp.ndarray  # (L, K)
    rest_position: jnp.ndarray  # (L, 3)
    names: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def num_locators(self) -> int:
        return self.parents.shape[0]

    def world_positions(self, character, global_states: jnp.ndarray,
                        rest_offset=None) -> jnp.ndarray:
        from momentum_tpu.math import skel_state as _ss

        char = character.with_inverse_bind_pose()
        skin_t = _ss.multiply(
            jnp.take(global_states, self.parents, axis=-2),
            jnp.take(char.inverse_bind_pose, self.parents, axis=0))
        rest = self.rest_position
        if rest_offset is not None:
            rest = rest + rest_offset
        pts = _ss.transform_points(skin_t, rest[..., :, None, :])
        return jnp.einsum("...ck,...cki->...ci", self.skin_weights, pts)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PhysicalProperties:
    """Per-joint physical mass properties in SoA form (character/joint.h:88-114
    JointPhysicalProperties / character.h:66 physicalProperties). Momentum
    units: mass in kg, center-of-mass offset in cm (joint frame), inertia in
    kg·cm² about the body COM expressed in the local inertia frame,
    inertia_rotation = quaternion (x,y,z,w) from the inertia frame to the
    joint frame. `joint_names` is the source of truth for remapping;
    `joint_index` is the resolved cache (joint.h:92-98)."""

    joint_index: jnp.ndarray  # (B,) int32
    mass: jnp.ndarray  # (B,) kg
    center_of_mass_offset: jnp.ndarray  # (B, 3) cm, joint frame
    inertia: jnp.ndarray  # (B, 3, 3) kg·cm², about COM in inertia frame
    inertia_rotation: jnp.ndarray  # (B, 4) quaternion xyzw, inertia→joint
    joint_names: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def num_bodies(self) -> int:
        return self.joint_index.shape[0]

    def total_mass(self) -> jnp.ndarray:
        return jnp.sum(self.mass)

    def com_constraint(self, num_joints: int):
        """Dense per-joint (masses, local offsets) for the center-of-mass
        error (center_of_mass_error_function.cpp:46: com = Σ mᵢ·worldPosᵢ).
        Joints without a body get zero mass."""
        masses = jnp.zeros((num_joints,), self.mass.dtype).at[self.joint_index].add(self.mass)
        weighted = jnp.zeros((num_joints, 3), self.mass.dtype).at[self.joint_index].add(
            self.mass[:, None] * self.center_of_mass_offset)
        offsets = weighted / jnp.maximum(masses, 1e-12)[:, None]
        return masses, offsets


# CollisionPrimitiveType (collision_geometry.h:22-26)
PRIMITIVE_TAPERED_CAPSULE = 0
PRIMITIVE_ELLIPSOID = 1
PRIMITIVE_BOX = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CollisionGeometry:
    """Per-joint collision primitives in SoA form (collision_geometry.h:22-170
    TaperedCapsule/Ellipsoid/Box): transform in parent-joint frame (8-param
    skel_state) plus per-type shape fields. `ptype` selects the primitive
    kind per row; the unused shape fields of a row are zero. Capsule-only
    geometry (the common case) leaves the optional fields at None."""

    parent: jnp.ndarray  # (C,) int32
    transform: jnp.ndarray  # (C, 8) local skel_state
    radius: jnp.ndarray  # (C, 2) tapered-capsule endpoint radii
    length: jnp.ndarray  # (C,) capsule length along local x
    # 0 = tapered capsule, 1 = ellipsoid, 2 = box (None ⇒ all capsules)
    ptype: Optional[jnp.ndarray] = None  # (C,) int32
    ellipsoid_radii: Optional[jnp.ndarray] = None  # (C, 3)
    box_half_extents: Optional[jnp.ndarray] = None  # (C, 3)

    @property
    def num_capsules(self) -> int:
        return self.parent.shape[0]

    @property
    def num_primitives(self) -> int:
        return self.parent.shape[0]

    def primitive_types(self) -> jnp.ndarray:
        if self.ptype is None:
            return jnp.zeros(self.parent.shape, jnp.int32)
        return self.ptype

    def shape3(self, field) -> jnp.ndarray:
        arr = getattr(self, field)
        if arr is None:
            return jnp.zeros(self.parent.shape + (3,), self.radius.dtype)
        return arr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Character:
    skeleton: Skeleton
    parameter_transform: ParameterTransform
    limits: ParameterLimits = dataclasses.field(default_factory=make_empty_limits)
    mesh: Optional[Mesh] = None
    skin_weights: Optional[SkinWeights] = None
    inverse_bind_pose: Optional[jnp.ndarray] = None  # (nJ, 8)
    blend_shape: Optional[BlendShape] = None
    locators: Optional[Locators] = None
    skinned_locators: Optional["SkinnedLocators"] = None
    collision: Optional[CollisionGeometry] = None
    # model-parameter indices driving blendshape coefficients, in basis order
    # (reference: ParameterTransform::blendShapeParameters,
    # parameter_transform.h:189-227). Static so gathers stay trace-constant.
    blend_shape_param_index: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # model-parameter indices driving skinned-locator rest offsets, flattened
    # (L, 3) order; -1 = not parameterized (parameter_transform.h:94-95
    # skinnedLocatorParameters)
    skinned_locator_param_index: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # separate face-expression basis (character.h faceExpressionBlendShape;
    # addFaceExpressionParameters, parameter_transform.h:212-215)
    # per-joint mass/inertia bodies loaded from model assets (character.h:66)
    physical_properties: Optional[PhysicalProperties] = None
    face_expression_blend_shape: Optional[BlendShape] = None
    face_expression_param_index: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    name: str = dataclasses.field(default="", metadata=dict(static=True))
    # free-form metadata string (character.h Character metadata;
    # character_pybind with_metadata)
    metadata: str = dataclasses.field(default="", metadata=dict(static=True))

    @property
    def num_joints(self) -> int:
        return self.skeleton.num_joints

    @property
    def num_model_parameters(self) -> int:
        return self.parameter_transform.num_model_parameters

    # ---- core pipelines ----

    def joint_parameters(self, model_params: jnp.ndarray) -> jnp.ndarray:
        return self.parameter_transform.apply(model_params)

    def skeleton_states(self, model_params: jnp.ndarray, method: str = "lifted") -> jnp.ndarray:
        """model params → (..., nJ, 8) global skeleton states (FK hot path)."""
        return fk.global_skel_states(self.skeleton, self.joint_parameters(model_params), method)

    def bind_pose(self) -> jnp.ndarray:
        """Global states at zero joint parameters."""
        zeros = jnp.zeros(self.skeleton.num_joint_parameters, self.skeleton.translation_offset.dtype)
        return fk.global_skel_states(self.skeleton, zeros)

    def with_inverse_bind_pose(self) -> "Character":
        """Compute inverse bind pose from the rest skeleton if absent
        (character.h inverseBindPose)."""
        if self.inverse_bind_pose is not None:
            return self
        inv = ss.inverse(self.bind_pose())
        return dataclasses.replace(self, inverse_bind_pose=inv)

    # ---- pymomentum.geometry Character API-parity surface ----------------
    # Thin delegations to the io/utility modules so reference users can keep
    # their call sites (character_pybind.cpp:139-260). The substance lives in
    # momentum_tpu.io / momentum_tpu.character.utility.

    @classmethod
    def load_gltf(cls, path) -> "Character":
        from momentum_tpu.io.gltf import load_character_glb

        character, _, _ = load_character_glb(str(path))
        return character

    @classmethod
    def load_gltf_with_motion(cls, path):
        """→ (Character, motion (F, P) or None, fps)."""
        from momentum_tpu.io.gltf import load_character_glb

        return load_character_glb(str(path))

    @classmethod
    def load_fbx(cls, path) -> "Character":
        from momentum_tpu.io.fbx import load_fbx

        return load_fbx(str(path))

    @classmethod
    def load_fbx_with_motion(cls, path, fps: float = 120.0):
        from momentum_tpu.io.fbx import load_fbx_with_motion

        return load_fbx_with_motion(str(path), fps)

    @classmethod
    def load_urdf(cls, path) -> "Character":
        from momentum_tpu.io.urdf import load_urdf

        return load_urdf(str(path))

    @classmethod
    def load_legacy_json(cls, path) -> "Character":
        from momentum_tpu.io.legacy_json import load_legacy_json

        return load_legacy_json(str(path))

    def save_gltf(self, path, motion=None, fps: float = 120.0,
                  markers=None) -> None:
        from momentum_tpu.io.gltf import save_character_glb

        save_character_glb(str(path), self, motion=motion, fps=fps,
                           markers=markers)

    def save_fbx(self, path, motion=None, fps: float = 120.0) -> None:
        from momentum_tpu.io.fbx_writer import save_fbx

        save_fbx(str(path), self, motion=motion, fps=fps)

    def save_fbx_with_joint_params(self, path, joint_params=None,
                                   fps: float = 120.0) -> None:
        from momentum_tpu.io.fbx_writer import save_fbx_with_joint_params

        save_fbx_with_joint_params(str(path), self, joint_params, fps=fps)

    def save_legacy_json(self, path) -> None:
        from momentum_tpu.io.legacy_json import save_legacy_json

        save_legacy_json(str(path), self)

    def load_locators(self, source) -> "Character":
        """Attach locators from a .locators file (character_pybind
        load_locators)."""
        from momentum_tpu.io.locators import load_locators

        return dataclasses.replace(self, locators=load_locators(source, self))

    def save_locators(self, path, space: str = "local") -> None:
        from momentum_tpu.io.locators import save_locators

        save_locators(str(path), self, space)

    def load_model_definition(self, source) -> "Character":
        """Replace the parameter transform + limits from a .model/.cfg
        definition."""
        from momentum_tpu.io.model_definition import load_model_definition

        pt, limits = load_model_definition(source, self.skeleton)
        return dataclasses.replace(self, parameter_transform=pt,
                                   limits=limits)

    # functional with_* updates (character_pybind with_mesh_and_skin_weights
    # etc.); every one returns a new frozen pytree
    def with_mesh_and_skin_weights(self, mesh, skin_weights) -> "Character":
        return dataclasses.replace(
            self, mesh=mesh, skin_weights=skin_weights,
            inverse_bind_pose=None).with_inverse_bind_pose()

    def with_locators(self, locators) -> "Character":
        return dataclasses.replace(self, locators=locators)

    def with_collision_geometry(self, collision) -> "Character":
        return dataclasses.replace(self, collision=collision)

    def with_parameter_limits(self, limits) -> "Character":
        return dataclasses.replace(self, limits=limits)

    def with_name(self, name: str) -> "Character":
        return dataclasses.replace(self, name=name)

    def with_blend_shape(self, blend_shape, num_shapes=None) -> "Character":
        """Attach a blend-shape basis AND extend the rig with coefficient
        parameters (character.h withBlendShape)."""
        from momentum_tpu.character.utility import add_blend_shape_parameters

        return add_blend_shape_parameters(
            dataclasses.replace(self, blend_shape=blend_shape),
            blend_shape, num_shapes)

    def scaled(self, scale: float, mass_scale: str = "preserve_mass") -> "Character":
        from momentum_tpu.character.utility import scale_character

        return scale_character(self, scale, mass_scale)

    def transformed(self, xform) -> "Character":
        from momentum_tpu.character.utility import transform_character

        return transform_character(self, xform)

    def simplify(self, enabled_params=None) -> "Character":
        from momentum_tpu.character.utility import simplify

        return simplify(self, enabled_params)

    def pose_mesh(self, model_params: jnp.ndarray) -> jnp.ndarray:
        """Posed mesh vertices (LBS + blendshapes when rigged) — the
        reference's Character.pose_mesh / skin_points."""
        from momentum_tpu.compat import skin_points_from_model_parameters

        return skin_points_from_model_parameters(self, model_params)

    skin_points = pose_mesh

    def apply_model_param_limits(self, model_params: jnp.ndarray) -> jnp.ndarray:
        """Clamp model parameters into their MinMax limit ranges
        (character_pybind apply_model_param_limits)."""
        lim = self.limits
        if lim is None or lim.minmax_index.shape[0] == 0:
            return model_params
        idx = lim.minmax_index
        vals = jnp.take(model_params, idx, axis=-1)
        clamped = jnp.clip(vals, lim.minmax_bounds[..., 0],
                           lim.minmax_bounds[..., 1])
        return model_params.at[..., idx].set(clamped)

    def find_locators(self, names) -> jnp.ndarray:
        """Indices of the named locators (character_pybind find_locators);
        raises KeyError on a missing name."""
        if self.locators is None:
            raise KeyError("character has no locators")
        lookup = {n: i for i, n in enumerate(self.locators.names)}
        try:
            return jnp.asarray([lookup[n] for n in names], jnp.int32)
        except KeyError as e:
            raise KeyError(f"unknown locator {e.args[0]!r}") from None

    # ---- remaining pymomentum.geometry.Character member surface
    # (character_pybind.cpp:252-1210) ----

    def clone(self) -> "Character":
        """Deep copy (frozen pytrees make this a value-identical replace)."""
        return dataclasses.replace(self)

    @property
    def has_mesh(self) -> bool:
        """True when both mesh and skin weights exist
        (character_pybind.cpp:431-435)."""
        return self.mesh is not None and self.skin_weights is not None

    def skel_states(self, model_params: jnp.ndarray) -> jnp.ndarray:
        """pybind spelling of skeleton_states: (..., P) → (..., nJ, 8)."""
        return self.skeleton_states(model_params)

    def rebind_skin(self) -> "Character":
        """Recompute the inverse bind pose from the rest skeleton
        (character_pybind rebind_skin → initInverseBindPose)."""
        return self.with_inverse_bind_pose()

    def bake_blend_shape(self, coefficients) -> "Character":
        """Bake blendshape coefficients into the static mesh and strip the
        basis + its parameters (character.h bake)."""
        from momentum_tpu.character.utility import bake_blend_shape

        return bake_blend_shape(self, coefficients)

    def simplify_skeleton(self, enabled_joint_indices) -> "Character":
        """Remove all joints except the listed ones (+ their ancestor chains
        stay; character_pybind simplify_skeleton)."""
        import numpy as np

        from momentum_tpu.character.utility import simplify_skeleton

        mask = np.zeros(self.num_joints, bool)
        mask[np.asarray(enabled_joint_indices, np.int64)] = True
        return simplify_skeleton(self, mask)

    def simplify_parameter_transform(self, enabled_parameters) -> "Character":
        """Reduce the rig to the enabled model parameters
        (character_pybind simplify_parameter_transform)."""
        import numpy as np

        from momentum_tpu.character.utility import simplify_parameter_transform

        return simplify_parameter_transform(
            self, np.asarray(enabled_parameters, bool))

    def joints_for_parameters(self, active_parameters) -> list:
        """Joint indices driven by the given parameters (boolean mask or
        index list; character_pybind joints_for_parameters)."""
        import numpy as np

        arr = np.asarray(active_parameters)
        if arr.dtype != bool:
            mask = np.zeros(self.num_model_parameters, bool)
            mask[arr.astype(np.int64)] = True
        else:
            mask = arr
        from momentum_tpu.character.utility import parameters_to_active_joints

        active = parameters_to_active_joints(self.parameter_transform, mask)
        return [int(j) for j in np.nonzero(np.asarray(active))[0]]

    def parameters_for_joints(self, joint_indices) -> "jnp.ndarray":
        """Boolean mask of parameters driving the given joints
        (character_pybind parameters_for_joints)."""
        return self.parameter_transform.parameters_for_joints(joint_indices)

    def with_metadata(self, metadata: str) -> "Character":
        """Attach an arbitrary metadata string (character_pybind
        with_metadata; persisted by the GLB writer's document extension)."""
        return dataclasses.replace(self, metadata=metadata)

    def with_skinned_locators(self, skinned_locators) -> "Character":
        return dataclasses.replace(self, skinned_locators=skinned_locators)

    def with_face_expression_blend_shape(self, blend_shape,
                                         num_shapes=None) -> "Character":
        """Attach a face-expression basis AND extend the rig with its
        coefficient parameters (character.h withFaceExpressionBlendShape)."""
        from momentum_tpu.character.utility import (
            add_face_expression_parameters)

        return add_face_expression_parameters(self, blend_shape, num_shapes)

    def skin_skinned_locators(self, skel_state, rest_positions=None
                              ) -> jnp.ndarray:
        """World positions of the character's skinned locators under a
        skeleton state (character_pybind skin_skinned_locators)."""
        if self.skinned_locators is None:
            raise ValueError("character has no skinned locators")
        sl = self.skinned_locators
        if rest_positions is not None:
            sl = dataclasses.replace(
                sl, rest_position=jnp.asarray(rest_positions, jnp.float32))
        return sl.world_positions(self, jnp.asarray(skel_state, jnp.float32))

    # ---- *_from_bytes / skel-state / timestamp loader-savers
    # (character_pybind.cpp:719-1100) ----

    @classmethod
    def load_gltf_from_bytes(cls, gltf_bytes) -> "Character":
        from momentum_tpu.io.gltf import load_character_glb

        character, _, _ = load_character_glb(bytes(gltf_bytes))
        return character

    @classmethod
    def load_gltf_with_motion_from_bytes(cls, gltf_bytes):
        from momentum_tpu.io.gltf import load_character_glb

        return load_character_glb(bytes(gltf_bytes))

    @classmethod
    def load_gltf_with_skel_states(cls, path, fps: float = None):
        """→ (Character, skel_states (F, nJ, 8) or None, fps). fps=None
        samples at the file's own keyframe rate."""
        from momentum_tpu.io.gltf import load_character_glb_with_skel_states

        return load_character_glb_with_skel_states(path, fps)

    @classmethod
    def load_gltf_with_skel_states_from_bytes(cls, gltf_bytes,
                                              fps: float = None):
        from momentum_tpu.io.gltf import load_character_glb_with_skel_states

        return load_character_glb_with_skel_states(bytes(gltf_bytes), fps)

    @classmethod
    def load_fbx_from_bytes(cls, fbx_bytes, **kwargs) -> "Character":
        from momentum_tpu.io.fbx import load_fbx

        return load_fbx(bytes(fbx_bytes), **kwargs)

    @classmethod
    def load_fbx_with_motion_from_bytes(cls, fbx_bytes, fps: float = 120.0):
        from momentum_tpu.io.fbx import load_fbx_with_motion

        return load_fbx_with_motion(bytes(fbx_bytes), fps)

    @classmethod
    def load_legacy_json_from_bytes(cls, json_bytes) -> "Character":
        from momentum_tpu.io.legacy_json import load_legacy_json

        return load_legacy_json(bytes(json_bytes).decode("utf-8"))

    @classmethod
    def load_legacy_json_from_string(cls, json_string: str) -> "Character":
        from momentum_tpu.io.legacy_json import load_legacy_json

        return load_legacy_json(json_string)

    @staticmethod
    def load_motion_timestamps(gltf_filename):
        """Per-frame timestamps stored alongside GLB motion (gltf_io.h:57)."""
        from momentum_tpu.io.gltf import load_motion_timestamps

        return load_motion_timestamps(gltf_filename)

    def save(self, path, motion=None, fps: float = 120.0) -> None:
        """Save in the format implied by the extension (character_pybind
        save → character_io.h saveCharacter dispatch)."""
        from momentum_tpu.io.character_io import save_character

        save_character(str(path), self, motion=motion, fps=fps)

    def save_gltf_from_skel_states(self, path, skel_states,
                                   fps: float = 120.0) -> None:
        """Save with motion given as GLOBAL skeleton states, exported as
        standard glTF animation channels (character_pybind
        save_gltf_from_skel_states → GltfBuilder)."""
        from momentum_tpu.io.gltf_builder import GltfBuilder

        b = GltfBuilder()
        b.add_character(self)
        b.add_skeleton_states(skel_states)
        b.set_fps(fps)
        b.save(str(path))

    def save_with_skel_states(self, path, skel_states,
                              fps: float = 120.0) -> None:
        """Extension-dispatched save with skeleton-state motion: .glb/.gltf
        via animation channels, .usd* via UsdSkel, .fbx via inverse FK to
        joint curves (character_pybind save_with_skel_states)."""
        import os as _os

        ext = _os.path.splitext(str(path))[1].lower()
        if ext in (".glb", ".gltf"):
            self.save_gltf_from_skel_states(path, skel_states, fps)
        elif ext in (".usd", ".usda", ".usdc"):
            from momentum_tpu.io.usd import save_character_from_skel_states

            save_character_from_skel_states(path, self, skel_states, fps)
        elif ext == ".fbx":
            import numpy as _np

            from momentum_tpu.character.inverse_fk import (
                joint_parameters_from_skeleton_states)
            from momentum_tpu.io.fbx_writer import save_fbx_with_joint_params

            states = jnp.asarray(skel_states, jnp.float32)
            if states.ndim == 2:
                states = states[None]
            jp = _np.asarray(joint_parameters_from_skeleton_states(
                self.skeleton, states))
            save_fbx_with_joint_params(str(path), self, jp, fps)
        else:
            raise ValueError(f"unsupported extension {ext!r}")

    def to_gltf(self, fps: float = 120.0, motion=None) -> dict:
        """The character as a glTF document dictionary (character_pybind
        to_gltf 'dictionary form')."""
        import json as _json
        import os as _os
        import struct as _struct
        import tempfile as _tempfile

        from momentum_tpu.io.gltf import save_character_glb

        fd, tmp = _tempfile.mkstemp(suffix=".glb")
        _os.close(fd)
        try:
            save_character_glb(tmp, self, motion=motion, fps=fps)
            with open(tmp, "rb") as f:
                data = f.read()
        finally:
            _os.unlink(tmp)
        json_len = _struct.unpack_from("<I", data, 12)[0]
        return _json.loads(data[20:20 + json_len])

    def to_legacy_json_string(self) -> str:
        """The legacy full-character JSON as a string (character_pybind
        to_legacy_json_string)."""
        import os as _os
        import tempfile as _tempfile

        from momentum_tpu.io.legacy_json import save_legacy_json

        fd, tmp = _tempfile.mkstemp(suffix=".json")
        _os.close(fd)
        try:
            save_legacy_json(tmp, self)
            with open(tmp) as f:
                return f.read()
        finally:
            _os.unlink(tmp)
