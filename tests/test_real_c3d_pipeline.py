"""End-to-end marker pipeline on the reference's REAL mocap data.

Loads /root/reference/pymomentum/test/resources/02_01.c3d (a CMU walking
take: 343 frames × 41 Vicon markers, mm, 120 fps), bootstraps the built-in
CMU humanoid (tracking/cmu.py), calibrates (scale + locator offsets),
tracks per frame, saves GLB + MMO, and asserts converged marker residual
statistics — the reference pipeline shape processMarkerFile
(marker_tracking/process_markers.cpp:292→359) driven by real noisy data
with genuine model mismatch (no inverse crime: targets are measured,
not synthesized from the rig)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

C3D = "/root/reference/pymomentum/test/resources/02_01.c3d"

pytestmark = pytest.mark.skipif(not os.path.exists(C3D),
                                reason="reference C3D not available")


@pytest.fixture(scope="module")
def tracked():
    from momentum_tpu.io.markers import load_c3d
    from momentum_tpu.tracking import (
        CalibrationConfig, MarkerSequence, TrackingConfig, calibrate_model,
        track_poses_per_frame)
    from momentum_tpu.tracking.cmu import create_cmu_character

    raw = load_c3d(C3D)
    char = create_cmu_character()
    # every 4th frame keeps the test CPU-friendly while spanning the clip
    seq = MarkerSequence(positions=jnp.asarray(raw.positions[::4]),
                         occluded=jnp.asarray(raw.occluded[::4]),
                         names=tuple(raw.names))
    p = char.num_model_parameters
    seed = jnp.zeros(p).at[:3].set(jnp.mean(seq.positions[0], axis=0))
    cfg = CalibrationConfig(calib_frames=10, major_iter=2, max_iter=25,
                            regularization=1e-3,
                            method="levenberg_marquardt")
    identity, _ = calibrate_model(char, seq, cfg, initial=seed)
    import dataclasses as dc
    cfg_loc = dc.replace(cfg, locators_only=True, major_iter=1)
    _, _, char2 = calibrate_model(char, seq, cfg_loc, initial=identity)
    tr = track_poses_per_frame(
        char2, seq,
        TrackingConfig(max_iter=15, regularization=1e-3,
                       method="levenberg_marquardt"),
        initial=identity)
    return char2, seq, tr, raw


def _marker_errors_mm(char, seq, motion):
    from momentum_tpu.tracking.tracker import _match_locators

    li, mi = _match_locators(char, seq)
    states = jax.vmap(char.skeleton_states)(motion)
    wp = jax.vmap(char.locators.world_positions)(states)
    return np.linalg.norm(np.asarray(wp[:, li])
                          - np.asarray(seq.positions[:, mi]), axis=-1)


def test_real_clip_residuals_converge(tracked):
    """Calibrated tracking of the real clip reaches mocap-grade residuals:
    no NaN frames, median marker error < 5 mm, p90 < 16 mm. The thresholds
    are deliberately tight around the measured optimum on THIS ::4-subsample
    config (median 3.7, p90 14.05; the full clip sits at 3.67/10.03): a
    round-3 regression — sequence-solver equilibration jitter over-damping
    the calibration — pushed full-clip p90 up 76% and sailed under the
    original <25 mm gate unseen."""
    char2, seq, tr, _ = tracked
    motion = np.asarray(tr.motion)
    assert np.isfinite(motion).all()
    d = _marker_errors_mm(char2, seq, tr.motion)
    assert np.median(d) < 5.0, np.median(d)
    assert np.percentile(d, 90) < 16.0, np.percentile(d, 90)


def test_real_clip_motion_is_smooth(tracked):
    """Warm-started per-frame tracking on a walking take must not jump:
    p95 inter-frame joint-parameter delta stays bounded (no pops)."""
    _, _, tr, _ = tracked
    motion = np.asarray(tr.motion)
    dpose = np.abs(np.diff(motion[:, 6:], axis=0))  # rotations only
    assert np.percentile(dpose, 95) < 0.5  # radians between sampled frames


def test_real_clip_refine_improves(tracked):
    """The refine stage of processMarkerFile (process_markers.cpp:292→359,
    refineMotion in marker_tracker.cpp) exercised on MEASURED data: a
    whole-sequence smoothed solve warm-started at the per-frame track must
    tighten the residual tail (p90) without degrading the median — the
    per-frame scan has no temporal coupling, so frames with marginal marker
    visibility are where refine pays."""
    from momentum_tpu.tracking import refine_motion
    from momentum_tpu.tracking.config import RefineConfig

    char2, seq, tr, _ = tracked
    d0 = _marker_errors_mm(char2, seq, tr.motion)
    cfg = RefineConfig(max_iter=10, regularization=1e-3, smoothing=1e-4,
                       method="levenberg_marquardt")
    refined, _ = refine_motion(char2, seq, tr.motion, cfg)
    assert np.isfinite(np.asarray(refined.motion)).all()
    d1 = _marker_errors_mm(char2, seq, refined.motion)
    p90_0, p90_1 = np.percentile(d0, 90), np.percentile(d1, 90)
    med0, med1 = np.median(d0), np.median(d1)
    assert p90_1 < p90_0, (p90_0, p90_1)
    assert med1 < med0 * 1.05, (med0, med1)
    # record for BENCHMARKS config 6: refined stats land at mocap grade
    assert med1 < 10.0 and p90_1 < 25.0


def test_real_clip_save_roundtrip(tracked, tmp_path):
    """processMarkerFile's save step (process_markers.cpp:359): GLB with the
    solved motion + .mmo binary, both reloadable."""
    import momentum_tpu.io as mio

    char2, seq, tr, raw = tracked
    motion = np.asarray(tr.motion)
    glb = str(tmp_path / "solved.glb")
    mio.save_character_glb(glb, char2, motion=motion, fps=raw.fps / 4)
    char_back, motion_back, _ = mio.load_character_glb(glb)
    assert char_back.num_joints == char2.num_joints
    assert motion_back is not None and motion_back.shape[0] == motion.shape[0]

    mmo = str(tmp_path / "solved.mmo")
    mio.save_mmo(mmo, motion, np.zeros(char2.num_joints, np.float32),
                 list(char2.parameter_transform.names),
                 list(char2.skeleton.joint_names))
    m2, _, names, _ = mio.load_mmo(mmo)
    np.testing.assert_allclose(np.asarray(m2), motion, atol=1e-5)
    assert tuple(names) == tuple(char2.parameter_transform.names)
