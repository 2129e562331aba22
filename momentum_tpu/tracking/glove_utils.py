"""Glove calibration / tracking utilities.

Reference: marker_tracking/glove_utils.{h,cpp} — data-glove sensor streams are
fused into the marker-tracking solves by (1) extending the character with one
"glove bone" per wrist, (2) optionally exposing its 6 DOF as model parameters
(the "gloves" parameter set) for calibration, and (3) turning per-frame sensor
observations into JointToJoint position/orientation constraints between each
finger joint and the glove bone.

TPU-native shape: sensor streams are padded dense arrays with a validity mask
(GloveSequence) instead of vectors of per-frame observation structs; invalid
sensors get constraint weight 0 so every frame has identical static shapes and
one stacked error function covers the whole sequence.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from momentum_tpu.character.character import Character
from momentum_tpu.character.parameter_transform import ParameterTransform
from momentum_tpu.character.skeleton import PARAMS_PER_JOINT, make_skeleton
from momentum_tpu.errors.joint_pair import (
    JointToJointOrientationErrorFunction,
    JointToJointPositionErrorFunction,
)
from momentum_tpu.math import euler, quaternion as quat

__all__ = [
    "GloveConfig",
    "GloveOffset",
    "GloveSequence",
    "add_glove_bones",
    "add_glove_calibration_parameters",
    "create_glove_character",
    "extract_glove_offsets_from_character",
    "bake_glove_offsets_from_params",
    "make_glove_error_functions",
]

_GLOVE_DOFS = ("tx", "ty", "tz", "rx", "ry", "rz")


@dataclasses.dataclass(frozen=True)
class GloveConfig:
    """glove_utils.h:55-70 GloveConfig."""

    position_weight: float = 1.0
    orientation_weight: float = 1.0
    wrist_joint_names: Tuple[str, str] = ("l_wrist", "r_wrist")


@dataclasses.dataclass(frozen=True)
class GloveOffset:
    """Calibrated glove-to-wrist offset (glove_utils.h:73-82)."""

    translation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    rotation_euler_xyz: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))


@dataclasses.dataclass(frozen=True)
class GloveSequence:
    """Padded per-frame glove sensor stream for one hand
    (GloveFrameData, glove_utils.h:30-50, in dense form).

    joint_index: (S,) finger-joint indices into the skeleton.
    positions:   (F, S, 3) sensor positions in the glove frame.
    orientations:(F, S, 4) sensor orientation quaternions (x, y, z, w).
    valid:       (F, S) bool — False rows get constraint weight 0.
    """

    joint_index: np.ndarray
    positions: np.ndarray
    orientations: np.ndarray
    valid: np.ndarray

    @property
    def num_frames(self) -> int:
        return self.positions.shape[0]


def _glove_bone_name(cfg: GloveConfig, hand: int, prefix: str) -> str:
    return prefix + cfg.wrist_joint_names[hand]


def add_glove_bones(
    character: Character,
    cfg: GloveConfig = GloveConfig(),
    offsets: Sequence[GloveOffset] = (GloveOffset(), GloveOffset()),
    prefix: str = "glove_",
) -> Character:
    """Append one glove bone under each configured wrist joint
    (glove_utils.h addGloveBones): translation offset + pre-rotation from the
    calibrated offset, no model parameters. Wrists missing from the skeleton
    are skipped."""
    skel = character.skeleton
    parents = list(np.asarray(skel.joint_parent))
    pre = list(np.asarray(skel.pre_rotation))
    toff = list(np.asarray(skel.translation_offset))
    names = list(skel.joint_names)
    for hand, wrist in enumerate(cfg.wrist_joint_names):
        if wrist not in names:
            continue
        bone = _glove_bone_name(cfg, hand, prefix)
        if bone in names:
            continue
        off = offsets[hand] if hand < len(offsets) else GloveOffset()
        m = np.asarray(euler.euler_xyz_to_matrix(
            jnp.asarray(off.rotation_euler_xyz, jnp.float32)))
        q = np.asarray(quat.from_rotation_matrix(jnp.asarray(m)))
        parents.append(names.index(wrist))
        pre.append(q)
        toff.append(np.asarray(off.translation, np.float32))
        names.append(bone)
    new_skel = make_skeleton(parents, np.asarray(pre), np.asarray(toff), names)
    # widen the parameter transform rows to the new joint count (new joints
    # driven by nothing)
    pt = character.parameter_transform
    rows_new = new_skel.num_joints * PARAMS_PER_JOINT
    tf = np.asarray(pt.transform)
    tf2 = np.zeros((rows_new, tf.shape[1]), tf.dtype)
    tf2[: tf.shape[0]] = tf
    offs = np.zeros(rows_new, np.float32)
    offs[: tf.shape[0]] = np.asarray(pt.offsets)
    pt2 = ParameterTransform(
        transform=jnp.asarray(tf2), offsets=jnp.asarray(offs),
        names=pt.names, parameter_sets=pt.parameter_sets)
    return dataclasses.replace(
        character, skeleton=new_skel, parameter_transform=pt2)


def add_glove_calibration_parameters(
    character: Character,
    cfg: GloveConfig = GloveConfig(),
    prefix: str = "glove_",
) -> Character:
    """Expose each glove bone's 6 DOF (tx ty tz rx ry rz) as new model
    parameters and register the "gloves" parameter set
    (glove_utils.h addGloveCalibrationParameters)."""
    pt = character.parameter_transform
    names = character.skeleton.joint_names
    tf = np.asarray(pt.transform)
    new_cols = []
    new_names = []
    for hand in range(len(cfg.wrist_joint_names)):
        bone = _glove_bone_name(cfg, hand, prefix)
        if bone not in names:
            continue
        j = names.index(bone)
        for d, dof in enumerate(_GLOVE_DOFS):
            col = np.zeros((tf.shape[0], 1), tf.dtype)
            col[j * PARAMS_PER_JOINT + d, 0] = 1.0
            new_cols.append(col)
            new_names.append(f"{bone}_{dof}")
    if not new_cols:
        return character
    p0 = pt.num_model_parameters
    tf2 = np.concatenate([tf] + new_cols, axis=1)
    sets = dict(pt.parameter_sets)
    sets["gloves"] = tuple(range(p0, p0 + len(new_cols)))
    pt2 = ParameterTransform(
        transform=jnp.asarray(tf2), offsets=pt.offsets,
        names=pt.names + tuple(new_names), parameter_sets=sets)
    return dataclasses.replace(character, parameter_transform=pt2)


def create_glove_character(
    character: Character,
    cfg: GloveConfig = GloveConfig(),
    prefix: str = "glove_",
) -> Character:
    """addGloveBones + addGloveCalibrationParameters
    (glove_utils.h createGloveCharacter)."""
    return add_glove_calibration_parameters(
        add_glove_bones(character, cfg, prefix=prefix), cfg, prefix)


def extract_glove_offsets_from_character(
    character: Character,
    params: np.ndarray,
    cfg: GloveConfig = GloveConfig(),
    prefix: str = "glove_",
):
    """Read the solved per-hand glove offsets out of the calibration
    parameters (glove_utils.h extractGloveOffsetsFromCharacter)."""
    pt = character.parameter_transform
    out = []
    params = np.asarray(params)
    for hand in range(len(cfg.wrist_joint_names)):
        bone = _glove_bone_name(cfg, hand, prefix)
        try:
            vals = np.asarray(
                [params[pt.parameter_index(f"{bone}_{d}")] for d in _GLOVE_DOFS],
                np.float32)
        except ValueError:
            out.append(GloveOffset())
            continue
        out.append(GloveOffset(translation=vals[:3], rotation_euler_xyz=vals[3:]))
    return out


def bake_glove_offsets_from_params(
    character: Character,
    solved_params: np.ndarray,
    solving_character: Character,
    cfg: Optional[GloveConfig] = GloveConfig(),
    prefix: str = "glove_",
) -> Character:
    """Bake calibrated glove offsets into a (glove-parameter-free) character's
    skeleton (glove_utils.h bakeGloveOffsetsFromParams). Functional: returns a
    new Character with glove bones at the solved offsets."""
    if cfg is None:
        return character
    offsets = extract_glove_offsets_from_character(
        solving_character, solved_params, cfg, prefix)
    # drop any existing glove bones first, then re-add at the solved offsets
    names = character.skeleton.joint_names
    existing = [
        _glove_bone_name(cfg, h, prefix)
        for h in range(len(cfg.wrist_joint_names))
        if _glove_bone_name(cfg, h, prefix) in names
    ]
    if existing:
        from momentum_tpu.character.utility import remove_joints

        character = remove_joints(character, existing)
    return add_glove_bones(character, cfg, offsets, prefix)


def make_glove_error_functions(
    character: Character,
    glove: GloveSequence,
    frame: int,
    cfg: GloveConfig = GloveConfig(),
    hand: int = 0,
    prefix: str = "glove_",
):
    """Build the per-frame JointToJoint position + orientation error functions
    for one hand (glove_utils.h setupGloveErrorFunctions /
    createGlove{Position,Orientation}ConstraintData): source = finger joint,
    reference = glove bone, target = the sensor observation in the glove
    frame; invalid sensors get weight 0."""
    names = character.skeleton.joint_names
    bone = _glove_bone_name(cfg, hand, prefix)
    if bone not in names:
        raise ValueError(f"glove bone {bone!r} not in skeleton; "
                         "run create_glove_character first")
    ref = names.index(bone)
    src = np.asarray(glove.joint_index, np.int32)
    s = src.shape[0]
    valid = np.asarray(glove.valid[frame], np.float32)
    zeros3 = np.zeros((s, 3), np.float32)
    pos_ef = JointToJointPositionErrorFunction.create(
        source=src,
        reference=np.full(s, ref, np.int32),
        source_offset=zeros3,
        reference_offset=zeros3,
        target=np.asarray(glove.positions[frame], np.float32),
        cweight=valid,
        weight=cfg.position_weight,
    )
    ori_ef = JointToJointOrientationErrorFunction.create(
        source=src,
        reference=np.full(s, ref, np.int32),
        target=np.asarray(glove.orientations[frame], np.float32),
        cweight=valid,
        weight=cfg.orientation_weight,
    )
    return pos_ef, ori_ef
