"""Marker-tracking pipeline tests (reference: test/marker_tracking/,
test/process_markers with synthetic data substituted for the bundled C3D)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.testing.fixtures import create_test_character
from momentum_tpu.tracking import (
    CalibrationConfig,
    MarkerSequence,
    TrackingConfig,
    calibrate_locators,
    calibrate_model,
    track_poses_batched,
    track_poses_per_frame,
    track_sequence,
)


@pytest.fixture(scope="module")
def char():
    return create_test_character(4)


def _rng():
    return np.random.default_rng(12345)


def _synthetic_markers(char, f, rng, occlusion=0.0, scale=None):
    p = char.num_model_parameters
    t = np.linspace(0, 1, f)[:, None]
    phase = rng.uniform(0, 2 * np.pi, p)
    amp = rng.uniform(0.05, 0.3, p)
    thetas = amp * np.sin(2 * np.pi * t + phase)
    # respect the fixture's MinMax limit on parameter 0 ([-0.1, 0.1]) so the
    # limit penalty is zero at the ground truth
    thetas[:, 0] = np.clip(thetas[:, 0], -0.09, 0.09)
    # identity (scale) is constant over a take — tracking solves pose only
    # (freeze_scaling), calibration estimates the scale
    si = char.parameter_transform.parameter_index("scale_global")
    thetas[:, si] = 0.0 if scale is None else scale
    thetas = jnp.asarray(thetas, jnp.float32)
    states = jax.vmap(char.skeleton_states)(thetas)
    positions = jax.vmap(char.locators.world_positions)(states)
    occluded = jnp.asarray(rng.random((f, char.locators.num_locators)) < occlusion)
    markers = MarkerSequence(positions=positions, occluded=occluded,
                             names=tuple(char.locators.names))
    return thetas, markers


class TestTracking:
    def test_per_frame_tracking_recovers_markers(self, char):
        rng = _rng()
        thetas, markers = _synthetic_markers(char, 8, rng)
        cfg = TrackingConfig(max_iter=30, regularization=1e-5)
        res = jax.jit(lambda m: track_poses_per_frame(char, m, cfg))(markers)
        assert res.motion.shape == (8, char.num_model_parameters)
        assert float(jnp.max(res.errors)) < 1e-6

    def test_batched_tracking(self, char):
        rng = _rng()
        _, markers = _synthetic_markers(char, 8, rng)
        cfg = TrackingConfig(max_iter=30, regularization=1e-5)
        res = track_poses_batched(char, markers, cfg)
        assert float(jnp.max(res.errors)) < 1e-6

    def test_hierarchical_tracking(self, char):
        from momentum_tpu.tracking import track_poses_hierarchical

        rng = _rng()
        _, markers = _synthetic_markers(char, 13, rng)
        # few refine iterations: hierarchical must still converge because the
        # interpolated keyframe inits land near each frame's optimum
        cfg = TrackingConfig(max_iter=30, regularization=1e-5,
                             refine=(4, 2, 4))
        res = jax.jit(
            lambda m: track_poses_hierarchical(char, m, cfg, stride=4))(
                markers)
        assert res.motion.shape == (13, char.num_model_parameters)
        assert float(jnp.max(res.errors)) < 1e-6

    def test_hierarchical_single_keyframe(self, char):
        from momentum_tpu.tracking import track_poses_hierarchical

        rng = _rng()
        _, markers = _synthetic_markers(char, 1, rng)
        cfg = TrackingConfig(max_iter=30, regularization=1e-5)
        res = track_poses_hierarchical(char, markers, cfg, stride=100)
        assert res.motion.shape == (1, char.num_model_parameters)
        assert float(jnp.max(res.errors)) < 1e-6

    def test_occluded_markers_ignored(self, char):
        rng = _rng()
        _, markers = _synthetic_markers(char, 6, rng, occlusion=0.3)
        # corrupt occluded marker positions — they must not affect the fit
        corrupted = jnp.where(markers.occluded[..., None],
                              jnp.full_like(markers.positions, 1e3),
                              markers.positions)
        markers2 = dataclasses.replace(markers, positions=corrupted)
        cfg = TrackingConfig(max_iter=30, regularization=1e-5)
        res = track_poses_per_frame(char, markers2, cfg)
        assert float(jnp.max(res.errors)) < 1e-6

    def test_sequence_tracking_with_smoothing(self, char):
        rng = _rng()
        _, markers = _synthetic_markers(char, 6, rng)
        cfg = TrackingConfig(max_iter=25, regularization=1e-5, smoothing=1e-4)
        res, _ = track_sequence(char, markers, cfg)
        assert float(res.errors[0]) < 1e-3

    def test_calibration_recovers_scale(self, char):
        rng = _rng()
        true_scale = 0.25
        _, markers = _synthetic_markers(char, 12, rng, scale=true_scale)
        cfg = CalibrationConfig(calib_frames=6, major_iter=3,
                                max_iter=25, regularization=1e-6)
        identity, motion = calibrate_model(char, markers, cfg)
        si = char.parameter_transform.parameter_index("scale_global")
        np.testing.assert_allclose(float(identity[si]), true_scale, atol=5e-3)

    def test_calibrate_locators_recovers_offsets(self, char):
        rng = _rng()
        thetas, markers = _synthetic_markers(char, 10, rng)
        # perturb the character's locator offsets; calibration should restore
        true_offsets = np.asarray(char.locators.offset)
        perturbed = dataclasses.replace(
            char, locators=dataclasses.replace(
                char.locators,
                offset=jnp.asarray(true_offsets + rng.normal(0, 0.1, true_offsets.shape)
                                   .astype(np.float32))))
        recovered = calibrate_locators(perturbed, markers, thetas)
        np.testing.assert_allclose(
            np.asarray(recovered.locators.offset), true_offsets, atol=1e-3)


class TestRefine:
    def test_refine_improves_noisy_motion(self, char):
        from momentum_tpu.tracking import refine_motion
        from momentum_tpu.tracking.config import RefineConfig

        rng = _rng()
        thetas, markers = _synthetic_markers(char, 6, rng)
        noisy = thetas + jnp.asarray(
            rng.normal(0, 0.05, thetas.shape), jnp.float32)
        cfg = RefineConfig(max_iter=15, regularization=1e-5,
                           regularizer=1e-3, smoothing=1e-4)
        refined, _ = refine_motion(char, markers, noisy, cfg)
        # refined motion reproduces the markers much better than the noisy one
        def marker_err(motion):
            states = jax.vmap(char.skeleton_states)(motion)
            pos = jax.vmap(char.locators.world_positions)(states)
            return float(jnp.mean(jnp.sum((pos - markers.positions) ** 2, axis=-1)))
        assert marker_err(refined.motion) < 0.05 * marker_err(noisy)


class TestGapFill:
    def test_fills_interior_gaps(self, char):
        from momentum_tpu.tracking import fill_marker_gaps
        rng = _rng()
        _, markers = _synthetic_markers(char, 10, rng)
        occ = np.zeros((10, markers.num_markers), bool)
        occ[3:6, 0] = True   # interior gap of 3 -> filled
        occ[0:2, 1] = True   # leading gap -> stays occluded
        m2 = dataclasses.replace(markers, occluded=jnp.asarray(occ))
        filled = fill_marker_gaps(m2, max_gap=5)
        occ2 = np.asarray(filled.occluded)
        assert not occ2[3:6, 0].any()
        assert occ2[0:2, 1].all()
        # filled samples lie between the bracketing visible samples
        p = np.asarray(filled.positions)
        for f in (3, 4, 5):
            t = (f - 2) / (6 - 2)
            expect = (1 - t) * p[2, 0] + t * p[6, 0]
            np.testing.assert_allclose(p[f, 0], expect, atol=1e-5)


def test_tracking_config_options():
    """min_vis_percent / greedy_sampling / smoothing_weights / calib_shape /
    locators_only wire through (marker_tracker.h:42-135 options)."""
    import dataclasses as dc
    from momentum_tpu.tracking import (
        CalibrationConfig, MarkerSequence, TrackingConfig, calibrate_model,
        track_poses_batched, track_sequence,
    )
    from momentum_tpu.tracking.tracker import _mask_low_visibility

    from momentum_tpu.testing.fixtures import create_test_character as _ctc
    char = _ctc(4)
    gt, markers = _synthetic_markers(char, 6, _rng())

    # a frame with < 50% visibility is skipped entirely
    occ = np.asarray(markers.occluded).copy()
    occ[2, :] = True
    occ[2, 0] = False  # one visible marker
    m2 = dc.replace(markers, occluded=jnp.asarray(occ))
    masked = _mask_low_visibility(m2, 50.0)
    assert bool(np.asarray(masked.occluded)[2].all())
    assert not np.asarray(masked.occluded)[3].any()

    # smoothing_weights accepted by the sequence tracker
    cfg = TrackingConfig(max_iter=5, smoothing=0.5,
                         smoothing_weights=tuple(
                             1.0 for _ in range(char.num_model_parameters)))
    res, _ = track_sequence(char, markers, cfg)
    assert np.isfinite(np.asarray(res.motion)).all()

    # greedy sampling picks distinct, separated frames
    cal = CalibrationConfig(calib_frames=3, major_iter=1, max_iter=5,
                            greedy_sampling=2)
    ident, motion = calibrate_model(char, markers, cal)
    assert np.isfinite(np.asarray(ident)).all()

    # locators_only returns the refined character
    cal2 = CalibrationConfig(calib_frames=3, major_iter=1, max_iter=5,
                             locators_only=True)
    out = calibrate_model(char, markers, cal2)
    assert len(out) == 3
    ident2, motion2, char2 = out
    assert char2.locators.offset.shape == char.locators.offset.shape


class TestForFrames:
    def test_stride_repeats_solved_pose(self, char):
        """frame_stride solves every Nth frame; unsolved frames repeat the
        next solved pose (trackPosesForFrames outputIndex fill)."""
        rng = _rng()
        thetas, markers = _synthetic_markers(char, 9, rng)
        cfg = TrackingConfig(max_iter=30, regularization=1e-5)
        res = track_poses_per_frame(char, markers, cfg, frame_stride=3)
        assert res.motion.shape == (9, char.num_model_parameters)
        m = np.asarray(res.motion)
        # frames 1,2 repeat the solve of frame 3; 4,5 of 6; 7,8 tail-carry 6
        np.testing.assert_allclose(m[1], m[3], atol=0)
        np.testing.assert_allclose(m[2], m[3], atol=0)
        np.testing.assert_allclose(m[4], m[6], atol=0)
        np.testing.assert_allclose(m[7], m[6], atol=0)
        np.testing.assert_allclose(m[8], m[6], atol=0)
        # solved frames fit their markers
        from momentum_tpu.tracking import get_locator_error

        sub = MarkerSequence(positions=markers.positions[::3],
                             occluded=markers.occluded[::3],
                             names=markers.names)
        avg, _ = get_locator_error(char, sub, res.motion[::3])
        assert avg < 1e-3

    def test_explicit_frame_indices_non_continuous(self, char):
        from momentum_tpu.tracking import track_poses_for_frames

        rng = _rng()
        thetas, markers = _synthetic_markers(char, 6, rng)
        cfg = TrackingConfig(max_iter=30, regularization=1e-5)
        init = jnp.zeros((6, char.num_model_parameters))
        res = track_poses_for_frames(char, markers, init, cfg,
                                     frame_indices=[0, 2, 5],
                                     is_continuous=False)
        assert res.motion.shape == (6, char.num_model_parameters)
        m = np.asarray(res.motion)
        np.testing.assert_allclose(m[1], m[2], atol=0)
        np.testing.assert_allclose(m[3], m[5], atol=0)
        np.testing.assert_allclose(m[4], m[5], atol=0)


def test_get_locator_error_matches_ground_truth(char):
    """Ground-truth motion → ~0 error; perturbed motion → positive error,
    and a fully-occluded marker does not contribute."""
    from momentum_tpu.tracking import get_locator_error

    rng = _rng()
    thetas, markers = _synthetic_markers(char, 5, rng)
    avg, mx = get_locator_error(char, markers, thetas)
    assert avg < 1e-5 and mx < 1e-4

    off = jnp.asarray(thetas).at[:, 0].add(0.05)
    avg2, mx2 = get_locator_error(char, markers, off)
    assert avg2 > 1e-3 and mx2 >= avg2

    occluded = jnp.ones_like(markers.occluded)
    dead = dataclasses.replace(markers, occluded=occluded)
    avg3, mx3 = get_locator_error(char, dead, off)
    assert avg3 == 0.0 and mx3 == 0.0


class TestCalibrationHeuristics:
    """Floor/height/pose-constraint calibration options
    (marker_tracker.cpp addSequenceErrorFunctions:392-463)."""

    def _with_floor(self, char, offset=(0.0, -0.5, 0.0)):
        from momentum_tpu.character.character import Locators

        loc = char.locators
        return dataclasses.replace(char, locators=Locators(
            parent=jnp.concatenate([loc.parent, jnp.asarray([0], jnp.int32)]),
            offset=jnp.concatenate([loc.offset,
                                    jnp.asarray([list(offset)])]),
            weight=jnp.concatenate([loc.weight, jnp.asarray([1.0])]),
            names=tuple(loc.names) + ("Floor_root",)))

    def test_floor_half_plane_blocks_penetration(self, char):
        """Markers pulling the rig below the floor: with floor constraints
        the solved root stays higher than without."""
        from momentum_tpu.tracking.tracker import _floor_error

        fchar = self._with_floor(char)
        assert _floor_error(fchar) is not None
        rng = _rng()
        _, markers = _synthetic_markers(char, 3, rng)
        # push every marker target 3 units below the original pose
        sunk = dataclasses.replace(
            markers, positions=markers.positions - jnp.asarray([0, 3.0, 0]))
        cfg_floor = TrackingConfig(max_iter=20, regularization=1e-4)
        cfg_nofloor = dataclasses.replace(cfg_floor, floor_constraints=False)
        lo = track_poses_batched(fchar, sunk, cfg_nofloor)
        hi = track_poses_batched(fchar, sunk, cfg_floor)
        y_lo = float(np.asarray(lo.motion)[:, 1].mean())
        y_hi = float(np.asarray(hi.motion)[:, 1].mean())
        assert y_hi > y_lo + 0.1

    def test_marker_weight_zero_disables_markers(self, char):
        rng = _rng()
        _, markers = _synthetic_markers(char, 3, rng)
        cfg = TrackingConfig(max_iter=10, regularization=1e-4,
                             marker_weight=0.0)
        res = track_poses_batched(char, markers, cfg)
        # nothing pulls the pose away from zero
        assert float(jnp.max(jnp.abs(res.motion))) < 1e-5

    def test_calibration_extras_first_frame_weights(self, char):
        from momentum_tpu.tracking.tracker import _calibration_extras

        pt = dataclasses.replace(char.parameter_transform,
                                 pose_constraints={"bind": ((0, 0.25),)})
        fchar = self._with_floor(dataclasses.replace(
            char, parameter_transform=pt))
        cfg = CalibrationConfig(target_height_cm=120.0,
                                enforce_floor_in_first_frame=True,
                                first_frame_pose_constraint_set="bind")
        extras = _calibration_extras(fchar, cfg, 5)
        assert len(extras) == 3
        for e in extras:
            w = np.asarray(e.weight)
            assert w.shape == (5,)
            assert w[0] == 5.0 and np.all(w[1:] == 0.0)

    def test_adaptive_contacts_mask(self, char):
        from momentum_tpu.tracking.tracker import _adaptive_floor_contacts

        fchar = self._with_floor(char)
        cfg = CalibrationConfig(adaptive_floor_contact=True,
                                floor_contact_percentile=0.3)
        motion = np.zeros((5, char.num_model_parameters), np.float32)
        motion[:, 1] = [0.0, 1.0, 2.0, 3.0, 4.0]  # root rises over time
        ad = _adaptive_floor_contacts(fchar, cfg, jnp.asarray(motion))
        cw = np.asarray(ad.cweight)  # (F, L=1): only the 2 lowest frames
        assert cw.shape == (5, 1)
        assert cw[0, 0] > 0 and cw[1, 0] > 0
        assert np.all(cw[2:, 0] == 0)

    def test_exclusive_floor_flags_raise(self, char):
        rng = _rng()
        _, markers = _synthetic_markers(char, 4, rng)
        cfg = CalibrationConfig(enforce_floor_in_first_frame=True,
                                adaptive_floor_contact=True)
        with pytest.raises(ValueError, match="exclusive"):
            calibrate_model(char, markers, cfg)

    def test_calibration_with_floor_extras_still_recovers_scale(self, char):
        """End-to-end: floor extras CONSISTENT with the data (the Floor_
        locator rides the root, which stays on y=0 in the ground truth)
        don't perturb scale calibration."""
        # floor locator exactly at the root joint; ground truth keeps the
        # root translation at zero so the locator is on the floor all clip
        fchar = self._with_floor(char, offset=(0.0, 0.0, 0.0))
        rng = _rng()
        gt_scale = 0.1
        p = char.num_model_parameters
        t = np.linspace(0, 1, 8)[:, None]
        phase = rng.uniform(0, 2 * np.pi, p)
        amp = rng.uniform(0.05, 0.3, p)
        thetas = amp * np.sin(2 * np.pi * t + phase)
        thetas[:, :3] = 0.0  # root pinned to the floor plane
        si = char.parameter_transform.parameter_index("scale_global")
        thetas[:, si] = gt_scale
        thetas = jnp.asarray(thetas, jnp.float32)
        states = jax.vmap(char.skeleton_states)(thetas)
        markers = MarkerSequence(
            positions=jax.vmap(char.locators.world_positions)(states),
            occluded=jnp.zeros((8, char.locators.num_locators), bool),
            names=tuple(char.locators.names))
        cfg = CalibrationConfig(calib_frames=8, major_iter=2, max_iter=30,
                                regularization=1e-4,
                                adaptive_floor_contact=True)
        identity, _ = calibrate_model(fchar, markers, cfg)
        assert abs(float(identity[si]) - gt_scale) < 0.03


class TestSaveMotion:
    """pymomentum marker_tracking.save_motion: identity split out of the
    per-frame motion (marker_tracking_pybind.cpp:921-955)."""

    def test_identity_split_glb(self, tmp_path):
        import numpy as np

        import momentum_tpu.tracking as t
        from momentum_tpu.io.gltf import load_motion_glb
        from momentum_tpu.testing.fixtures import create_test_character

        c = create_test_character(4)
        p = c.num_model_parameters
        scaling = np.asarray(c.parameter_transform.scaling_parameters)
        assert scaling.any(), "fixture should carry a scale_ parameter"
        motion = np.random.default_rng(0).normal(0, 0.1, (3, p)).astype(
            np.float32)
        identity = np.zeros(p, np.float32)
        identity[scaling] = 0.25
        out = tmp_path / "m.glb"
        t.save_motion(out, c, identity, motion, fps=60.0)
        m2, names, ident_jp, jnames = load_motion_glb(out)
        # per-frame scaling columns are stripped
        assert (np.abs(m2[:, scaling]) < 1e-7).all()
        # non-scaling columns survive untouched
        np.testing.assert_allclose(m2[:, ~scaling], motion[:, ~scaling],
                                   atol=1e-6)
        # identity rides as joint parameters
        expected_jp = np.asarray(
            c.parameter_transform.apply(identity))
        np.testing.assert_allclose(ident_jp, expected_jp, atol=1e-6)

    def test_non_glb_bakes_identity(self, tmp_path):
        import numpy as np

        import momentum_tpu.tracking as t
        from momentum_tpu.io import load_mmo
        from momentum_tpu.testing.fixtures import create_test_character

        c = create_test_character(4)
        p = c.num_model_parameters
        scaling = np.asarray(c.parameter_transform.scaling_parameters)
        motion = np.zeros((2, p), np.float32)
        identity = np.zeros(p, np.float32)
        identity[scaling] = 0.5
        out = tmp_path / "m.mmo"
        t.save_motion(out, c, identity, motion, fps=60.0)
        poses, _, _, _ = load_mmo(out)
        np.testing.assert_allclose(np.asarray(poses)[:, scaling], 0.5,
                                   atol=1e-6)

    def test_converter_aliases(self):
        import momentum_tpu.tracking as t

        assert (t.convert_locators_to_skinned_locators
                is t.locators_to_skinned_locators)
        assert (t.convert_skinned_locators_to_locators
                is t.skinned_locators_to_locators)


class TestBatchedRefine:
    """Compacted tail refinement in the batched tracker
    (TrackingConfig.refine, solver/compaction economics)."""

    def _problem(self, F=16):
        import numpy as np

        import jax
        import jax.numpy as jnp

        from momentum_tpu.testing.fixtures import create_test_character

        char = create_test_character(4)
        rng = np.random.default_rng(0)
        gt = jnp.asarray(
            rng.uniform(-0.3, 0.3, (F, char.num_model_parameters)),
            jnp.float32)
        states = jax.vmap(char.skeleton_states)(gt)
        pos = jax.vmap(char.locators.world_positions)(states)
        from momentum_tpu.tracking import MarkerSequence

        mk = MarkerSequence(positions=pos,
                            occluded=jnp.zeros(pos.shape[:2], bool),
                            names=tuple(char.locators.names))
        return char, mk

    def test_full_capacity_matches_uncompacted_lm(self):
        import dataclasses

        import jax.numpy as jnp

        from momentum_tpu.tracking import TrackingConfig, track_poses_batched

        char, mk = self._problem()
        cfg = TrackingConfig(max_iter=6, method="levenberg_marquardt")
        full = track_poses_batched(char, mk, cfg)
        comp = track_poses_batched(
            char, mk, dataclasses.replace(cfg, refine=(3, 3, mk.num_frames)))
        assert float(jnp.max(jnp.abs(comp.motion - full.motion))) == 0.0
        # errors re-evaluate at the stage boundary; fusion differs by ~1 ulp
        import numpy as np

        np.testing.assert_allclose(np.asarray(comp.errors),
                                   np.asarray(full.errors), rtol=1e-5)

    def test_partial_capacity_never_worse_than_stage1(self):
        import dataclasses

        import numpy as np

        from momentum_tpu.tracking import TrackingConfig, track_poses_batched

        char, mk = self._problem()
        cfg = TrackingConfig(max_iter=4, method="levenberg_marquardt")
        stage1 = track_poses_batched(char, mk, cfg)
        comp = track_poses_batched(
            char, mk,
            dataclasses.replace(cfg, max_iter=4, refine=(4, 2, 4)))
        assert np.all(np.asarray(comp.errors)
                      <= np.asarray(stage1.errors) + 1e-12)

    def test_gauss_newton_path(self):
        import dataclasses

        import jax.numpy as jnp

        from momentum_tpu.tracking import TrackingConfig, track_poses_batched

        char, mk = self._problem(F=8)
        cfg = TrackingConfig(max_iter=6, method="gauss_newton",
                             regularization=1e-3)
        full = track_poses_batched(char, mk, cfg)
        comp = track_poses_batched(
            char, mk, dataclasses.replace(cfg, refine=(3, 3, 8)))
        # GN is memoryless: full-capacity split == uncompacted exactly
        assert float(jnp.max(jnp.abs(comp.motion - full.motion))) == 0.0


class TestCameraKeypoints:
    """2D keypoint projection constraints during tracking
    (marker_tracker.h:36-40 CameraKeypointData +
    marker_tracker.cpp:312-366 addKeypointProjectionConstraints)."""

    def _problem(self, F=6):
        import numpy as np

        import jax
        import jax.numpy as jnp

        from momentum_tpu.camera import Camera, PinholeIntrinsics
        from momentum_tpu.testing.fixtures import create_test_character
        from momentum_tpu.tracking import CameraKeypointData, MarkerSequence

        char = create_test_character(4)
        rng = np.random.default_rng(0)
        gt = jnp.asarray(
            rng.uniform(-0.3, 0.3, (F, char.num_model_parameters)),
            jnp.float32)
        pos = jax.vmap(char.locators.world_positions)(
            jax.vmap(char.skeleton_states)(gt))
        mk = MarkerSequence(positions=pos,
                            occluded=jnp.zeros(pos.shape[:2], bool),
                            names=tuple(char.locators.names))
        cam = Camera.create(PinholeIntrinsics.create(
            200.0, 200.0, 63.5, 47.5, image_size=(128, 96))).look_at(
            (0.0, 1.0, -8.0), (0.0, 1.0, 0.0))
        uvz, valid = jax.vmap(cam.project)(pos)
        ckd = CameraKeypointData(camera=cam, targets=uvz[..., :2],
                                 confidence=valid.astype(jnp.float32))
        return char, mk, cam, ckd, uvz

    def test_keypoints_only_recovers_reprojection(self):
        import jax
        import jax.numpy as jnp

        from momentum_tpu.tracking import TrackingConfig, track_poses_batched

        char, mk, cam, ckd, uvz = self._problem()
        cfg = TrackingConfig(max_iter=20, method="levenberg_marquardt",
                             marker_weight=0.0, projection_weight=1.0)
        res = track_poses_batched(char, mk, cfg, camera_keypoints=(ckd,))
        uvz2, _ = jax.vmap(cam.project)(
            jax.vmap(char.locators.world_positions)(
                jax.vmap(char.skeleton_states)(res.motion)))
        px = jnp.linalg.norm(uvz2[..., :2] - uvz[..., :2], axis=-1)
        assert float(jnp.median(px)) < 1e-2

    def test_scan_and_batched_agree(self):
        import numpy as np

        from momentum_tpu.tracking import (
            TrackingConfig, track_poses_batched, track_poses_per_frame)

        char, mk, _, ckd, _ = self._problem()
        cfg = TrackingConfig(max_iter=8, method="levenberg_marquardt",
                             projection_weight=1e-3)
        r_scan = track_poses_per_frame(char, mk, cfg, camera_keypoints=(ckd,))
        r_batch = track_poses_batched(char, mk, cfg, camera_keypoints=(ckd,))
        # scan warm-starts, batched starts from rest — both must fit well
        assert float(np.median(np.asarray(r_scan.errors))) < 0.1
        assert float(np.median(np.asarray(r_batch.errors))) < 0.1

    def test_zero_weight_matches_no_keypoints(self):
        import numpy as np

        from momentum_tpu.tracking import TrackingConfig, track_poses_batched

        char, mk, _, ckd, _ = self._problem()
        cfg = TrackingConfig(max_iter=6, projection_weight=0.0)
        a = track_poses_batched(char, mk, cfg, camera_keypoints=(ckd,))
        b = track_poses_batched(char, mk, cfg)
        np.testing.assert_array_equal(np.asarray(a.motion),
                                      np.asarray(b.motion))

    def test_refine_path_carries_keypoints(self):
        import dataclasses

        import numpy as np

        from momentum_tpu.tracking import TrackingConfig, track_poses_batched

        char, mk, _, ckd, _ = self._problem()
        cfg = TrackingConfig(max_iter=6, method="levenberg_marquardt",
                             projection_weight=1e-3)
        full = track_poses_batched(char, mk, cfg, camera_keypoints=(ckd,))
        comp = track_poses_batched(
            char, mk, dataclasses.replace(cfg, refine=(3, 3, mk.num_frames)),
            camera_keypoints=(ckd,))
        np.testing.assert_allclose(np.asarray(comp.motion),
                                   np.asarray(full.motion), atol=1e-6)


def test_calibrate_model_with_camera_keypoints():
    """Keypoint constraints participate in the calibration sequence solve
    (marker_tracker.cpp addKeypointProjectionConstraints in calibration)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from momentum_tpu.camera import Camera, PinholeIntrinsics
    from momentum_tpu.testing.fixtures import create_test_character
    from momentum_tpu.tracking import (
        CalibrationConfig, CameraKeypointData, MarkerSequence,
        calibrate_model)

    char = create_test_character(4)
    rng = np.random.default_rng(0)
    F = 8
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (F, char.num_model_parameters)),
                     jnp.float32)
    scale_idx = char.parameter_transform.parameter_index("scale_global")
    gt = gt.at[:, scale_idx].set(0.2)
    pos = jax.vmap(char.locators.world_positions)(
        jax.vmap(char.skeleton_states)(gt))
    mk = MarkerSequence(positions=pos, occluded=jnp.zeros(pos.shape[:2], bool),
                        names=tuple(char.locators.names))
    cam = Camera.create(PinholeIntrinsics.create(
        200.0, 200.0, 63.5, 47.5, image_size=(128, 96))).look_at(
        (0.0, 1.0, -8.0), (0.0, 1.0, 0.0))
    uvz, valid = jax.vmap(cam.project)(pos)
    ckd = CameraKeypointData(camera=cam, targets=uvz[..., :2],
                             confidence=valid.astype(jnp.float32))
    cfg = CalibrationConfig(calib_frames=8, major_iter=2, max_iter=10,
                            method="levenberg_marquardt",
                            projection_weight=1e-3)
    ident, motion = calibrate_model(char, mk, cfg, camera_keypoints=(ckd,))
    assert abs(float(ident[scale_idx]) - 0.2) < 0.02


def test_track_sequence_with_camera_keypoints():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from momentum_tpu.camera import Camera, PinholeIntrinsics
    from momentum_tpu.testing.fixtures import create_test_character
    from momentum_tpu.tracking import (
        CameraKeypointData, MarkerSequence, TrackingConfig, track_sequence)

    char = create_test_character(4)
    rng = np.random.default_rng(0)
    F = 5
    gt = jnp.asarray(rng.uniform(-0.2, 0.2, (F, char.num_model_parameters)),
                     jnp.float32)
    pos = jax.vmap(char.locators.world_positions)(
        jax.vmap(char.skeleton_states)(gt))
    mk = MarkerSequence(positions=pos, occluded=jnp.zeros(pos.shape[:2], bool),
                        names=tuple(char.locators.names))
    cam = Camera.create(PinholeIntrinsics.create(
        200.0, 200.0, 63.5, 47.5, image_size=(128, 96))).look_at(
        (0.0, 1.0, -8.0), (0.0, 1.0, 0.0))
    uvz, valid = jax.vmap(cam.project)(pos)
    ckd = CameraKeypointData(camera=cam, targets=uvz[..., :2],
                             confidence=valid.astype(jnp.float32))
    cfg = TrackingConfig(max_iter=15, method="levenberg_marquardt",
                         smoothing=1e-4, projection_weight=1e-3)
    res, u = track_sequence(char, mk, cfg, camera_keypoints=(ckd,))
    assert float(jnp.median(res.errors)) < 0.05


class TestLocatorMatching:
    """Name-vs-positional marker↔locator binding (_match_locators)."""

    def test_positional_fallback_warns_loudly(self, char, caplog):
        """Zero name matches + equal counts → positional binding, but with a
        WARNING naming the mismatch (a wrong-asset mistake must not be
        silent)."""
        from momentum_tpu.tracking.tracker import _match_locators

        pos = jnp.zeros((2, char.locators.num_locators, 3), jnp.float32)
        mk = MarkerSequence(
            positions=pos, occluded=jnp.zeros(pos.shape[:2], bool),
            names=tuple(f"not_a_locator_{i}"
                        for i in range(char.locators.num_locators)))
        import logging
        with caplog.at_level(logging.WARNING, logger="momentum_tpu.tracking"):
            li, mi = _match_locators(char, mk)
        np.testing.assert_array_equal(li, np.arange(len(li)))
        np.testing.assert_array_equal(mi, np.arange(len(mi)))
        assert any("POSITIONAL" in r.message for r in caplog.records)

    def test_name_match_does_not_warn(self, char, caplog):
        from momentum_tpu.tracking.tracker import _match_locators

        pos = jnp.zeros((2, char.locators.num_locators, 3), jnp.float32)
        mk = MarkerSequence(
            positions=pos, occluded=jnp.zeros(pos.shape[:2], bool),
            names=tuple(char.locators.names))
        import logging
        with caplog.at_level(logging.WARNING, logger="momentum_tpu.tracking"):
            _match_locators(char, mk)
        assert not any("POSITIONAL" in r.message for r in caplog.records)
