"""Top-level marker-pipeline API (marker_tracking/process_markers.h):
`calibrate_markers`, `process_markers`, `process_marker_file` — the
library-level entry points the reference's process_markers_app CLI wraps
(process_markers.cpp:132 calibrateMarkers, :202 processMarkers,
:292 processMarkerFile). The examples/process_markers.py CLI composes the
same pieces with extra bootstrap conveniences."""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from momentum_tpu.character.character import Character
from momentum_tpu.tracking.config import CalibrationConfig, TrackingConfig
from momentum_tpu.tracking.tracker import (
    MarkerSequence,
    TrackingResult,
    calibrate_model,
    get_locator_error,
    track_poses_per_frame,
)

__all__ = ["calibrate_markers", "process_markers", "process_marker_file"]


def _slice_frames(markers: MarkerSequence, first_frame: int,
                  max_frames: int) -> MarkerSequence:
    """[first_frame, first_frame+max_frames) window (max_frames 0 = rest),
    passed by slicing rather than data copy in the reference
    (process_markers.cpp:150-153)."""
    f = markers.num_frames
    if first_frame > f:
        raise ValueError(
            f"first frame {first_frame} can't exceed total frames {f}")
    last = min(first_frame + max_frames, f) if max_frames > 0 else f
    if first_frame == 0 and last == f:
        return markers
    return MarkerSequence(positions=markers.positions[first_frame:last],
                          occluded=markers.occluded[first_frame:last],
                          names=markers.names)


def calibrate_markers(
    character: Character,
    identity: jnp.ndarray,
    markers: MarkerSequence,
    calibration_config: CalibrationConfig = CalibrationConfig(),
    first_frame: int = 0,
    max_frames: int = 0,
):
    """Calibrate identity (or, with `locators_only`, the locator offsets)
    from a clip window (calibrateMarkers, process_markers.cpp:132-199).
    → (character, identity) with the calibrated quantity replaced."""
    data = _slice_frames(markers, first_frame, max_frames)
    if data.num_frames < 2:
        raise ValueError(
            f"calibration requires at least 2 frames, got {data.num_frames}")
    if calibration_config.global_scale_only and calibration_config.locators_only:
        raise ValueError(
            "global_scale_only and locators_only are exclusive")

    if calibration_config.locators_only:
        identity_out, _, character = calibrate_model(
            character, data, calibration_config, initial=identity)
        return character, identity_out
    identity_out, _ = calibrate_model(
        character, data, calibration_config, initial=identity)
    return character, identity_out


def process_markers(
    character: Character,
    identity: jnp.ndarray,
    markers: MarkerSequence,
    tracking_config: TrackingConfig = TrackingConfig(),
    calibration_config: CalibrationConfig = CalibrationConfig(),
    calibrate: bool = True,
    first_frame: int = 0,
    max_frames: int = 0,
    debug: bool = False,
):
    """Full pipeline on a clip window: optional calibration, then per-frame
    tracking seeded with the identity (processMarkers,
    process_markers.cpp:202-290). → (TrackingResult over the window,
    character, identity); with `debug` the average/max marker errors are
    printed the way the reference logs them."""
    data = _slice_frames(markers, first_frame, max_frames)
    if data.num_frames == 0:
        raise ValueError("input marker data is empty")
    if calibrate:
        character, identity = calibrate_markers(
            character, identity, data, calibration_config)
    result = track_poses_per_frame(
        character, data, tracking_config, initial=identity)
    if debug:
        avg, mx = get_locator_error(character, data, result.motion)
        print(f"Average marker error: {avg}")
        print(f"Max marker error: {mx}")
    return result, character, identity


def process_marker_file(
    input_marker_file: str,
    output_file: str,
    tracking_config: TrackingConfig = TrackingConfig(),
    calibration_config: CalibrationConfig = CalibrationConfig(),
    character_path: Optional[str] = None,
    model_path: Optional[str] = None,
    identity_path: Optional[str] = None,
    calibrate: bool = True,
    first_frame: int = 0,
    max_frames: int = 0,
) -> TrackingResult:
    """Track a marker file end to end and save the solved motion
    (processMarkerFile, process_markers.cpp:292-380): load character (+
    optional .model definition and identity), load the markers, run
    `process_markers`, save. Output formats: .glb/.gltf (FB_momentum
    motion), .fbx (the native writer — the reference gates this on the
    Autodesk SDK), .bvh, .mmo."""
    import momentum_tpu.io as mio
    from momentum_tpu.tracking.app_utils import load_character_with_identity

    ext = os.path.splitext(output_file)[1].lower()
    if ext not in (".glb", ".gltf", ".fbx", ".bvh", ".mmo"):
        raise ValueError(
            f"invalid output file type {ext}; supported: glb/gltf/fbx/bvh/mmo")

    character, identity = load_character_with_identity(
        character_path, model_path, identity_path)

    if input_marker_file.lower().endswith(".trc"):
        raw = mio.load_trc(input_marker_file)
    else:
        raw = mio.load_c3d(input_marker_file)
    markers = raw.to_marker_sequence()

    result, character, identity = process_markers(
        character, identity, markers, tracking_config, calibration_config,
        calibrate, first_frame, max_frames)

    motion = np.asarray(result.motion)
    if ext in (".glb", ".gltf"):
        mio.save_character_glb(output_file, character, motion=motion,
                               fps=raw.fps)
    elif ext == ".fbx":
        mio.save_fbx(output_file, character, motion=motion, fps=raw.fps)
    elif ext == ".bvh":
        jp = np.asarray(character.parameter_transform.apply(
            jnp.asarray(motion)))
        mio.save_bvh(output_file, character, jp, fps=raw.fps)
    else:
        mio.save_mmo(output_file, motion,
                     np.zeros(character.num_joints, np.float32),
                     list(character.parameter_transform.names),
                     list(character.skeleton.joint_names))
    return result


def save_motion(out_file, character, identity, motion, marker_data=None,
                fps: float = 120.0, save_marker_mesh: bool = True) -> None:
    """Save tracked motion with the identity split out — the pymomentum
    marker_tracking.save_motion surface (marker_tracking_pybind.cpp:921-955 →
    marker_tracker saveMotion): the scaling (identity) parameters are removed
    from the per-frame motion and stored once as the GLB identity section
    (joint parameters); markers ride along when save_marker_mesh.

    out_file: .glb/.gltf (identity-aware), or any extension
    io.save_character supports (identity then baked into the motion).
    motion: (F, P) model parameters; identity: (P,) model parameters or None.
    """
    import os

    import numpy as np

    import jax.numpy as jnp

    import momentum_tpu.io as mio

    motion = np.asarray(motion, np.float32)
    pt = character.parameter_transform
    p = pt.num_model_parameters
    if motion.shape[-1] != p:
        raise ValueError(
            f"motion has {motion.shape[-1]} parameters, character has {p}")
    if identity is None or np.asarray(identity).size == 0:
        identity = np.zeros(p, np.float32)
    identity = np.asarray(identity, np.float32).reshape(p)

    ext = os.path.splitext(str(out_file))[1].lower()
    markers = marker_data if save_marker_mesh else None
    if ext in (".glb", ".gltf"):
        # strip the scaling fields from per-frame motion; store the identity
        # as joint parameters (the reference's saveMotion split)
        scaling = np.asarray(pt.scaling_parameters)
        stripped = motion.copy()
        stripped[:, scaling] = 0.0
        identity_jp = np.asarray(pt.apply(jnp.asarray(identity)))
        mio.save_character_glb(str(out_file), character, motion=stripped,
                               fps=fps, markers=markers,
                               identity=identity_jp)
    else:
        # bake identity into the motion for formats without an identity slot
        full = motion.copy()
        scaling = np.asarray(pt.scaling_parameters)
        full[:, scaling] += identity[None, scaling]
        mio.save_character(str(out_file), character, motion=full, fps=fps)
