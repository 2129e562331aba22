"""Library-level pipeline API (tracking/process_markers.py — the reference's
process_markers.h calibrateMarkers / processMarkers / processMarkerFile,
process_markers.cpp:132/202/292) on synthetic marker data and real file IO."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from momentum_tpu.testing.fixtures import create_test_character
from momentum_tpu.tracking import (
    CalibrationConfig,
    MarkerSequence,
    TrackingConfig,
    calibrate_markers,
    process_marker_file,
    process_markers,
)


@pytest.fixture(scope="module")
def char():
    return create_test_character(4)


def _synthetic(char, f, scale=0.0, seed=12345):
    rng = np.random.default_rng(seed)
    p = char.num_model_parameters
    t = np.linspace(0, 1, f)[:, None]
    phase = rng.uniform(0, 2 * np.pi, p)
    amp = rng.uniform(0.05, 0.3, p)
    thetas = amp * np.sin(2 * np.pi * t + phase)
    thetas[:, 0] = np.clip(thetas[:, 0], -0.09, 0.09)
    si = char.parameter_transform.parameter_index("scale_global")
    thetas[:, si] = scale
    thetas = jnp.asarray(thetas, jnp.float32)
    states = jax.vmap(char.skeleton_states)(thetas)
    positions = jax.vmap(char.locators.world_positions)(states)
    return thetas, MarkerSequence(
        positions=positions,
        occluded=jnp.zeros(positions.shape[:2], bool),
        names=tuple(char.locators.names))


def test_process_markers_no_calibration(char):
    _, markers = _synthetic(char, 6)
    res, out_char, identity = process_markers(
        char, jnp.zeros(char.num_model_parameters), markers,
        TrackingConfig(max_iter=30, regularization=1e-5), calibrate=False)
    assert res.motion.shape == (6, char.num_model_parameters)
    assert float(jnp.max(res.errors)) < 1e-6
    assert out_char is char


def test_process_markers_frame_window(char):
    """first_frame/max_frames select a window without copying semantics
    surprises — the result covers only the window."""
    _, markers = _synthetic(char, 10)
    res, _, _ = process_markers(
        char, jnp.zeros(char.num_model_parameters), markers,
        TrackingConfig(max_iter=20, regularization=1e-5), calibrate=False,
        first_frame=2, max_frames=5)
    assert res.motion.shape[0] == 5
    with pytest.raises(ValueError, match="can't exceed"):
        process_markers(char, jnp.zeros(char.num_model_parameters), markers,
                        calibrate=False, first_frame=11)


def test_calibrate_markers_recovers_scale(char):
    gt_scale = 0.12
    _, markers = _synthetic(char, 8, scale=gt_scale)
    cfg = CalibrationConfig(calib_frames=8, major_iter=2, max_iter=30,
                            regularization=1e-4)
    out_char, identity = calibrate_markers(
        char, jnp.zeros(char.num_model_parameters), markers, cfg)
    si = char.parameter_transform.parameter_index("scale_global")
    assert abs(float(identity[si]) - gt_scale) < 0.02
    with pytest.raises(ValueError, match="at least 2 frames"):
        calibrate_markers(char, jnp.zeros(char.num_model_parameters),
                          markers, cfg, first_frame=8)
    with pytest.raises(ValueError, match="exclusive"):
        calibrate_markers(
            char, jnp.zeros(char.num_model_parameters), markers,
            dataclasses.replace(cfg, global_scale_only=True,
                                locators_only=True))


def test_process_marker_file_end_to_end(char, tmp_path):
    """C3D in → GLB motion out through the file-level entry point."""
    from momentum_tpu.io import load_character_glb, save_character_glb
    from momentum_tpu.io.markers import RawMarkerData, save_trc

    _, markers = _synthetic(char, 6)
    char_path = str(tmp_path / "char.glb")
    save_character_glb(char_path, char)
    trc_path = str(tmp_path / "clip.trc")
    save_trc(trc_path, RawMarkerData(
        np.asarray(markers.positions),
        np.zeros(markers.positions.shape[:2], bool),
        list(markers.names), fps=30.0))

    out_path = str(tmp_path / "solved.glb")
    res = process_marker_file(
        trc_path, out_path,
        TrackingConfig(max_iter=30, regularization=1e-5),
        character_path=char_path, calibrate=False)
    assert float(jnp.max(res.errors)) < 1e-5

    loaded, motion, fps = load_character_glb(out_path)
    assert motion.shape == (6, char.num_model_parameters)
    np.testing.assert_allclose(np.asarray(motion), np.asarray(res.motion),
                               atol=1e-6)

    with pytest.raises(ValueError, match="invalid output file type"):
        process_marker_file(trc_path, str(tmp_path / "x.obj"),
                            character_path=char_path, calibrate=False)
