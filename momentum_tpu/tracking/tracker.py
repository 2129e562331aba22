"""Marker-based mocap tracking pipeline.

Reference: momentum/marker_tracking/marker_tracker.cpp —
  trackPosesPerframe  (:754-930): frame-by-frame GN with previous-frame warm
    start; here a lax.scan over frames whose body is the fused GN solve, so
    the whole clip is ONE XLA computation (the serial warm-start chain is the
    algorithm, not an implementation accident).
  trackSequence       (:228-700): whole-sequence solve with smoothness and
    optional universal (calibration) parameters → solve_sequence.
  calibrateModel      (:1479-1720): alternating major iterations of
    per-frame tracking on sampled frames and a universal-parameter sequence
    solve (scale/shape shared across frames; MultiposeSolver pattern).
  calibrateLocators: locator-offset refinement — the locator offsets are
    differentiable inputs of the position residuals here, solved by a few
    Gauss-Newton steps on the offset variables directly (the IFT machinery
    exposes the same derivative, diff_ik).

Markers are a static-shape (F, M, 3) array + (F, M) occlusion mask; occluded
markers get constraint weight 0 (the reference drops them per frame,
marker_tracker.cpp:287-476 — weight-0 padding is the static-shape analog).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.character.character import Character
from momentum_tpu.errors import LimitErrorFunction, PositionErrorFunction
from momentum_tpu.math.generalized_loss import GeneralizedLoss
from momentum_tpu.sequence import (
    ModelParametersSequenceErrorFunction,
    SequenceSolverFunction,
    solve_sequence,
)
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
from momentum_tpu.solver.gauss_newton import solve_gauss_newton
from momentum_tpu.tracking.config import CalibrationConfig, TrackingConfig

__all__ = ["MarkerSequence", "TrackingResult", "track_poses_per_frame",
           "track_poses_for_frames", "track_sequence", "calibrate_model",
           "calibrate_locators", "get_locator_error"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MarkerSequence:
    """(F, M, 3) marker positions + (F, M) occlusion flags; names static."""

    positions: jnp.ndarray
    occluded: jnp.ndarray
    names: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def num_frames(self) -> int:
        return self.positions.shape[0]

    @property
    def num_markers(self) -> int:
        return self.positions.shape[1]


class TrackingResult(NamedTuple):
    motion: jnp.ndarray  # (F, P) model parameters per frame
    errors: jnp.ndarray  # (F,) final per-frame energy


def _match_locators(character: Character, markers: MarkerSequence):
    """Match marker names to locator names → (locator parents, offsets,
    marker column index per matched locator). Mirrors the name matching in
    app_utils/marker_tracker; "Subject:Marker" namespaces are stripped the
    way the reference's C3D loader does (io/marker/c3d_io.cpp:30-48,167)."""
    loc = character.locators
    name_to_col = {n: i for i, n in enumerate(markers.names)}
    for i, n in enumerate(markers.names):
        if ":" in n:
            name_to_col.setdefault(n.rsplit(":", 1)[-1], i)
    rows = [(li, name_to_col[n]) for li, n in enumerate(loc.names) if n in name_to_col]
    if not rows and markers.num_markers == loc.num_locators:
        # Positional fallback: zero names matched but the counts agree. A
        # wrong-asset mistake (markers from a different rig) would silently
        # produce garbage here, so warn loudly with the evidence.
        from momentum_tpu.utils.logging import get_logger
        get_logger("momentum_tpu.tracking").warning(
            "No marker names matched any locator name; falling back to "
            "POSITIONAL marker↔locator binding because counts agree (%d). "
            "If markers and character come from different rigs this will "
            "produce garbage. Locator names: %s... Marker names: %s...",
            loc.num_locators, list(loc.names)[:5], list(markers.names)[:5])
        rows = [(i, i) for i in range(loc.num_locators)]
    li = np.asarray([r[0] for r in rows], np.int32)
    mi = np.asarray([r[1] for r in rows], np.int32)
    return li, mi


def _marker_error_template(character: Character, markers: MarkerSequence, config):
    li, mi = _match_locators(character, markers)
    loc = character.locators
    ef0 = PositionErrorFunction.create(
        np.asarray(loc.parent)[li],
        np.asarray(loc.offset)[li],
        np.zeros((len(li), 3), np.float32),
        cweight=np.asarray(loc.weight)[li],
        # markerWeight multiplier (marker_tracker.h; 0 disables markers)
        weight=getattr(config, "marker_weight", 1.0),
        loss=GeneralizedLoss(alpha=config.loss_alpha, c=config.loss_c),
    )
    base_w = jnp.asarray(np.asarray(loc.weight)[li])

    def per_frame(ef, frame_positions, frame_occluded):
        targets = frame_positions[mi]
        w = base_w * (1.0 - frame_occluded[mi].astype(jnp.float32))
        return dataclasses.replace(ef, target=targets, cweight=w)

    return ef0, per_frame


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraKeypointData:
    """Per-camera 2D keypoint observations, static-shape form of the
    reference's CameraKeypointData (marker_tracker.h:36-40): one slot per
    character locator, `targets` (F, L, 2) pixel coordinates and
    `confidence` (F, L) with 0 marking unobserved keypoints (the reference's
    per-observation locatorIndex/confidence list becomes a dense table)."""

    camera: object  # momentum_tpu.camera.Camera (world-space extrinsics)
    targets: jnp.ndarray  # (F, L, 2)
    confidence: jnp.ndarray  # (F, L)


def _keypoint_error_template(character: Character, ckd, config):
    """→ (ef0, per_frame) for one camera's 2D keypoint constraints
    (addKeypointProjectionConstraints, marker_tracker.cpp:312-366): a
    CameraProjectionErrorFunction over the character's locators, per-frame
    targets/confidences swapped in, scaled by config.projection_weight."""
    from momentum_tpu.errors.camera_projection import (
        CameraProjectionErrorFunction)

    loc = character.locators
    n = loc.num_locators
    ef0 = CameraProjectionErrorFunction.create(
        ckd.camera, np.asarray(loc.parent), np.asarray(loc.offset),
        np.zeros((n, 2), np.float32), cweight=np.zeros(n, np.float32),
        weight=getattr(config, "projection_weight", 0.0))

    def per_frame(ef, targets_f, confidence_f):
        return dataclasses.replace(ef, target=targets_f,
                                   cweight=confidence_f)

    return ef0, per_frame


def _keypoint_templates(character, camera_keypoints, config):
    if not camera_keypoints or getattr(config, "projection_weight", 0.0) <= 0:
        return ()
    return tuple(_keypoint_error_template(character, ckd, config)
                 for ckd in camera_keypoints)


def _glove_templates(character: Character, glove_data, glove_config=None):
    """Frame-0 glove error-function templates + their sequences.

    `glove_data` entries are (GloveSequence, hand) pairs or bare
    GloveSequences (hand 0 = left) — the dense form of the reference's
    leftGloveData/rightGloveData spans (marker_tracker.h:165-199)."""
    if not glove_data:
        return ()
    from momentum_tpu.tracking.glove_utils import (
        GloveConfig, make_glove_error_functions)

    cfg = glove_config or GloveConfig()
    out = []
    for entry in glove_data:
        glove, hand = entry if isinstance(entry, tuple) else (entry, 0)
        pos0, ori0 = make_glove_error_functions(character, glove, 0, cfg,
                                                hand)
        out.append((pos0, ori0, glove))
    return tuple(out)


def _floor_rows(character: Character, prefix: str = "Floor_"):
    """Floor-locator constraint rows (plane_error_function.cpp:15
    createFloorConstraints): locators whose names start with `prefix`,
    weighted loc.weight × 5 against a y-up plane at y=0. → (parents,
    offsets, cweights) or None when the rig has no floor locators."""
    loc = character.locators
    if loc is None:
        return None
    idx = [i for i, n in enumerate(loc.names) if n.startswith(prefix)]
    if not idx:
        return None
    return (np.asarray(loc.parent)[idx], np.asarray(loc.offset)[idx],
            np.asarray(loc.weight)[idx] * 5.0)


def _floor_error(character: Character, half_plane: bool = True,
                 weight: float = 1.0, cweight_scale=None):
    """PlaneErrorFunction over the Floor_ locators (y-up plane at 0), or
    None. Half-plane = non-penetration (tracking); equality = pin to floor
    (enforceFloorInFirstFrame / adaptive contacts)."""
    from momentum_tpu.errors import PlaneErrorFunction

    rows = _floor_rows(character)
    if rows is None:
        return None
    parents, offsets, cw = rows
    if cweight_scale is not None:
        cw = cw * np.asarray(cweight_scale, np.float32)
    n = len(parents)
    return PlaneErrorFunction.create(
        parents, offsets, np.tile(np.asarray([[0.0, 1.0, 0.0]], np.float32),
                                  (n, 1)),
        np.zeros(n, np.float32), cweight=cw, weight=weight,
        half_plane=half_plane)


def _pose_mask(character: Character, config, enabled_mask):
    """Default tracking mask: pose params only — identity/scaling parameters
    stay frozen during tracking (the reference solves pose while tracking,
    marker_tracker.cpp trackPosesPerframe; scale comes from calibration)."""
    if enabled_mask is not None or not config.freeze_scaling:
        return enabled_mask
    pt = character.parameter_transform
    mask = np.ones(character.num_model_parameters, np.float32)
    if "scaling" in pt.parameter_sets:
        mask[list(pt.parameter_sets["scaling"])] = 0.0
    else:
        for i, n in enumerate(pt.names):
            if "scale" in n.lower():
                mask[i] = 0.0
    return jnp.asarray(mask)


def _solver_for(config):
    from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt

    return (solve_levenberg_marquardt
            if config.method in ("levenberg_marquardt", "trust_region")
            else solve_gauss_newton)


def track_poses_per_frame(
    character: Character,
    markers: MarkerSequence,
    config: TrackingConfig = TrackingConfig(),
    initial: Optional[jnp.ndarray] = None,
    enabled_mask: Optional[jnp.ndarray] = None,
    frame_stride: int = 1,
    camera_keypoints: tuple = (),
    glove_data: tuple = (),
    glove_config=None,
) -> TrackingResult:
    """Frame-by-frame tracking with warm starts (trackPosesPerframe,
    marker_tracker.cpp:754-930). One jitted scan over the clip.

    `frame_stride` > 1 solves every Nth frame and repeats the solved pose
    within each stride (marker_tracker.cpp:753-790: stride < 5 keeps
    temporal coherence between the solved frames)."""
    p = character.num_model_parameters
    if frame_stride > 1:
        f = markers.num_frames
        x_init = jnp.zeros(p) if initial is None else jnp.asarray(initial)
        init_motion = (jnp.broadcast_to(x_init, (f, p))
                       if x_init.ndim == 1 else x_init)
        return track_poses_for_frames(
            character, markers, init_motion, config,
            np.arange(0, f, frame_stride),
            is_continuous=frame_stride < 5, enabled_mask=enabled_mask)
    markers = _mask_low_visibility(markers, config.min_vis_percent)
    ef0, per_frame = _marker_error_template(character, markers, config)
    limits = LimitErrorFunction.create()
    fl = (_floor_error(character)
          if getattr(config, "floor_constraints", True) else None)
    floor = () if fl is None else (fl,)
    opts = SolverOptions(max_iterations=config.max_iter,
                         regularization=config.regularization)
    x_init = jnp.zeros(p) if initial is None else initial
    enabled_mask = _pose_mask(character, config, enabled_mask)
    solver = _solver_for(config)

    kp = _keypoint_templates(character, camera_keypoints, config)
    gloves = _glove_templates(character, glove_data, glove_config)

    def step(carry, inputs):
        x_prev = carry
        pos_f, occ_f, kp_f, gl_f = inputs
        ef = per_frame(ef0, pos_f, occ_f)
        kp_efs = tuple(pf(e0, t_f, c_f)
                       for (e0, pf), (t_f, c_f) in zip(kp, kp_f))
        gl_efs = ()
        for (pos0, ori0, _), (gp_f, go_f, gv_f) in zip(gloves, gl_f):
            gl_efs = gl_efs + (
                dataclasses.replace(pos0, target=gp_f, cweight=gv_f),
                dataclasses.replace(ori0, target=go_f, cweight=gv_f))
        fn = SkeletonSolverFunction(
            character, (ef, limits) + floor + kp_efs + gl_efs)
        res = solver(fn.residual, fn.error, x_prev, enabled_mask, opts)
        # NaN guard (tensor_ik.cpp:168-175): revert to warm start
        bad = ~jnp.all(jnp.isfinite(res.params))
        x = jnp.where(bad, x_prev, res.params)
        return x, (x, res.error)

    kp_inputs = tuple((ckd.targets, ckd.confidence)
                      for ckd in camera_keypoints) if kp else ()
    gl_inputs = tuple(
        (jnp.asarray(np.asarray(g.positions, np.float32)),
         jnp.asarray(np.asarray(g.orientations, np.float32)),
         jnp.asarray(np.asarray(g.valid, np.float32)))
        for _, _, g in gloves) if gloves else ()
    _, (motion, errors) = jax.lax.scan(
        step, x_init,
        (markers.positions, markers.occluded, kp_inputs, gl_inputs))
    return TrackingResult(motion=motion, errors=errors)


def track_poses_batched(
    character: Character,
    markers: MarkerSequence,
    config: TrackingConfig = TrackingConfig(),
    initial: Optional[jnp.ndarray] = None,
    enabled_mask: Optional[jnp.ndarray] = None,
    camera_keypoints: tuple = (),
) -> TrackingResult:
    """All frames solved independently in one vmap (no warm start) — the
    high-throughput path when frames are dense enough to converge from rest;
    this is BASELINE config 3's shape."""
    p = character.num_model_parameters
    markers = _mask_low_visibility(markers, config.min_vis_percent)
    ef0, per_frame = _marker_error_template(character, markers, config)
    limits = LimitErrorFunction.create()
    fl = (_floor_error(character)
          if getattr(config, "floor_constraints", True) else None)
    floor = () if fl is None else (fl,)
    opts = SolverOptions(max_iterations=config.max_iter,
                         regularization=config.regularization)
    x0 = jnp.zeros(p) if initial is None else initial
    enabled_mask = _pose_mask(character, config, enabled_mask)
    solver = _solver_for(config)

    kp = _keypoint_templates(character, camera_keypoints, config)
    kp_inputs = tuple((ckd.targets, ckd.confidence)
                      for ckd in camera_keypoints) if kp else ()

    f_cnt = markers.positions.shape[0]
    refine = getattr(config, "refine", None)
    if refine is None:
        def solve_one(pos_f, occ_f, kp_f, x0f):
            ef = per_frame(ef0, pos_f, occ_f)
            kp_efs = tuple(pf(e0, t_f, c_f)
                           for (e0, pf), (t_f, c_f) in zip(kp, kp_f))
            fn = SkeletonSolverFunction(character,
                                        (ef, limits) + floor + kp_efs)
            res = solver(fn.residual, fn.error, x0f, enabled_mask, opts)
            return res.params, res.error

        x_b = (jnp.broadcast_to(x0, (f_cnt, p)) if x0.ndim == 1 else x0)
        motion, errors = jax.vmap(solve_one)(markers.positions,
                                             markers.occluded, kp_inputs,
                                             x_b)
        return TrackingResult(motion=motion, errors=errors)

    # compacted tail refinement: k_full iterations on every frame, then
    # r_refine more on the `capacity` worst frames only (λ carried exactly —
    # solver/compaction.py economics applied to the tracking batch)
    import dataclasses as _dc

    from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt

    k_full, r_refine, capacity = refine
    capacity = min(int(capacity), f_cnt)
    is_lm = solver is solve_levenberg_marquardt

    def solve_frames(pos, occ, kps, x, iters, lam0):
        def one(pf, of, kp_f, xf, lf):
            ef = per_frame(ef0, pf, of)
            kp_efs = tuple(pfn(e0, t_f, c_f)
                           for (e0, pfn), (t_f, c_f) in zip(kp, kp_f))
            fn = SkeletonSolverFunction(character,
                                        (ef, limits) + floor + kp_efs)
            o = _dc.replace(opts, max_iterations=iters)
            if is_lm:
                res = solver(fn.residual, fn.error, xf, enabled_mask, o,
                             lambda0=lf)
                return res.params, res.error, res.lambda_final
            res = solver(fn.residual, fn.error, xf, enabled_mask, o)
            return res.params, res.error, lf

        return jax.vmap(one)(pos, occ, kps, x, lam0)

    x_b = (jnp.broadcast_to(x0, (f_cnt, p)) if x0.ndim == 1 else x0)
    lam_init = jnp.full((f_cnt,), opts.lambda_init, jnp.float32)
    params1, err1, lam1 = solve_frames(
        markers.positions, markers.occluded, kp_inputs, x_b, k_full,
        lam_init)
    key = jnp.nan_to_num(err1, nan=jnp.float32(3e38), posinf=jnp.float32(3e38))
    _, idx = jax.lax.top_k(key, capacity)
    kp_sub = jax.tree_util.tree_map(lambda a: a[idx], kp_inputs)
    params2, err2, _ = solve_frames(
        markers.positions[idx], markers.occluded[idx], kp_sub, params1[idx],
        r_refine, lam1[idx])
    motion = params1.at[idx].set(params2)
    errors = err1.at[idx].set(err2)
    return TrackingResult(motion=motion, errors=errors)


def track_poses_for_frames(
    character: Character,
    markers: MarkerSequence,
    initial_motion: jnp.ndarray,
    config: TrackingConfig = TrackingConfig(),
    frame_indices=None,
    is_continuous: bool = False,
    enabled_mask: Optional[jnp.ndarray] = None,
) -> TrackingResult:
    """Solve only the given frames (trackPosesForFrames,
    marker_tracker.cpp:848-1068): with `is_continuous` the solved frames warm
    start each other in order; otherwise each starts from its own
    `initial_motion` row. The returned motion spans ALL frames — every
    unsolved frame repeats the pose of the NEXT solved frame at or after it
    (the reference's outputIndex fill, :1040-1049), with the tail carrying
    the last solve."""
    f_all = markers.num_frames
    initial_motion = jnp.asarray(initial_motion)
    if frame_indices is None:
        frame_indices = np.arange(f_all)
    sorted_idx = np.unique(np.asarray(frame_indices, np.int64))
    markers = _mask_low_visibility(markers, config.min_vis_percent)
    sub = MarkerSequence(positions=markers.positions[sorted_idx],
                         occluded=markers.occluded[sorted_idx],
                         names=markers.names)
    ef0, per_frame = _marker_error_template(character, sub, config)
    limits = LimitErrorFunction.create()
    fl = (_floor_error(character)
          if getattr(config, "floor_constraints", True) else None)
    floor = () if fl is None else (fl,)
    opts = SolverOptions(max_iterations=config.max_iter,
                         regularization=config.regularization)
    enabled_mask = _pose_mask(character, config, enabled_mask)
    solver = _solver_for(config)
    inits = initial_motion[sorted_idx]

    if is_continuous:
        def step(carry, inputs):
            pos_f, occ_f = inputs
            ef = per_frame(ef0, pos_f, occ_f)
            fn = SkeletonSolverFunction(character, (ef, limits) + floor)
            res = solver(fn.residual, fn.error, carry, enabled_mask, opts)
            bad = ~jnp.all(jnp.isfinite(res.params))
            x = jnp.where(bad, carry, res.params)
            return x, (x, res.error)

        _, (solved, errors) = jax.lax.scan(
            step, inits[0], (sub.positions, sub.occluded))
    else:
        def solve_one(x0, pos_f, occ_f):
            ef = per_frame(ef0, pos_f, occ_f)
            fn = SkeletonSolverFunction(character, (ef, limits) + floor)
            res = solver(fn.residual, fn.error, x0, enabled_mask, opts)
            bad = ~jnp.all(jnp.isfinite(res.params))
            return jnp.where(bad, x0, res.params), res.error

        solved, errors = jax.vmap(solve_one)(
            inits, sub.positions, sub.occluded)

    # fill: frame t takes the pose of the first solved frame >= t, the tail
    # carries the last solve (matches the reference's column fill)
    seg = np.minimum(np.searchsorted(sorted_idx, np.arange(f_all), "left"),
                     len(sorted_idx) - 1)
    return TrackingResult(motion=solved[seg], errors=errors[seg])


def track_poses_hierarchical(
    character: Character,
    markers: MarkerSequence,
    config: TrackingConfig = TrackingConfig(),
    initial: Optional[jnp.ndarray] = None,
    enabled_mask: Optional[jnp.ndarray] = None,
    stride: int = 8,
) -> TrackingResult:
    """Keyframe-warm-started batched tracking — the throughput path that
    keeps the sequential scan's quality.

    `track_poses_batched` solves every frame independently, which is the
    TPU-native layout (one vmap, MXU-saturating) but starts each frame cold:
    on a real walking clip a rest-pose init is tens of mm from the optimum
    and 10-15 LM iterations leave a fat error tail (measured 33.6 mm median
    on CMU 02_01.c3d vs 3.7 mm for the warm-started scan). The reference
    never faces this because its per-frame tracker is inherently sequential
    (trackPosesPerFrame warm starts from the previous frame,
    marker_tracker.cpp:754-846). This entry restores those economics at
    batch throughput: solve every `stride`-th frame with the warm-start
    chain (`track_poses_for_frames(is_continuous=True)`,
    marker_tracker.cpp:848-1068), linearly interpolate the keyframe
    solutions as per-frame inits, then refine ALL frames independently in
    one batch. Latency is O(F/stride) sequential solves + one batched
    solve; the batch starts within a stride's motion of the optimum."""
    f = markers.num_frames
    p = character.num_model_parameters
    stride = int(max(stride, 1))
    keys = np.arange(0, f, stride)
    if keys[-1] != f - 1:
        keys = np.append(keys, f - 1)
    init0 = jnp.zeros(p) if initial is None else jnp.asarray(initial)
    if init0.ndim == 1:
        init0 = jnp.broadcast_to(init0, (f, p))
    key_res = track_poses_for_frames(
        character, markers, init0, config, frame_indices=keys,
        is_continuous=True, enabled_mask=enabled_mask)
    km = key_res.motion[jnp.asarray(keys)]  # (K, p)
    if len(keys) == 1:
        init_all = jnp.broadcast_to(km[0], (f, p))
    else:
        t = np.arange(f)
        seg = np.clip(np.searchsorted(keys, t, "right") - 1,
                      0, len(keys) - 2)
        lo, hi = keys[seg], keys[seg + 1]
        w = jnp.asarray(((t - lo) / np.maximum(hi - lo, 1))[:, None],
                        km.dtype)
        init_all = km[seg] * (1 - w) + km[seg + 1] * w
    return track_poses_batched(character, markers, config,
                               initial=init_all, enabled_mask=enabled_mask)


def _match_names(names, markers: MarkerSequence):
    """marker column index per named item (namespace-stripped like
    _match_locators) → (item rows, marker cols)."""
    name_to_col = {n: i for i, n in enumerate(markers.names)}
    for i, n in enumerate(markers.names):
        if ":" in n:
            name_to_col.setdefault(n.rsplit(":", 1)[-1], i)
    rows = [(i, name_to_col[n]) for i, n in enumerate(names)
            if n in name_to_col]
    return (np.asarray([r[0] for r in rows], np.int32),
            np.asarray([r[1] for r in rows], np.int32))


def get_locator_error(character: Character, markers: MarkerSequence,
                      motion: jnp.ndarray):
    """(average per-frame marker error, max marker error) of a motion vs the
    markers (getLocatorError, marker_tracker.cpp:1978-2082): per frame the
    mean distance over visible matched markers — regular locators first,
    skinned locators for names not covered by them — averaged over frames
    that have at least one valid marker."""
    from momentum_tpu.math import skel_state as ss

    f = markers.num_frames
    states = jax.vmap(character.skeleton_states)(jnp.asarray(motion)[:f])

    norm_parts, vis_parts = [], []
    covered = set()
    if character.locators is not None:
        loc = character.locators
        li, mi = _match_names(loc.names, markers)
        if li.size:
            covered = {loc.names[i] for i in li}
            world = ss.transform_points(
                jnp.take(states, jnp.asarray(np.asarray(loc.parent)[li]),
                         axis=-2),
                jnp.asarray(np.asarray(loc.offset)[li]))
            norm_parts.append(jnp.linalg.norm(
                world - markers.positions[:, mi], axis=-1))
            vis_parts.append(1.0 - markers.occluded[:, mi].astype(jnp.float32))
    if character.skinned_locators is not None:
        sl = character.skinned_locators
        names = tuple(n for n in sl.names)
        sli, smi = _match_names(names, markers)
        keep = [k for k in range(sli.size) if names[sli[k]] not in covered]
        if keep:
            sli, smi = sli[keep], smi[keep]
            world_all = sl.world_positions(character, states)  # (F, L, 3)
            norm_parts.append(jnp.linalg.norm(
                world_all[:, sli] - markers.positions[:, smi], axis=-1))
            vis_parts.append(1.0 - markers.occluded[:, smi].astype(jnp.float32))
    if not norm_parts:
        return 0.0, 0.0
    norms = jnp.concatenate(norm_parts, axis=-1)
    vis = jnp.concatenate(vis_parts, axis=-1)
    norms = norms * vis
    count = jnp.sum(vis, axis=-1)
    frame_err = jnp.sum(norms, axis=-1) / jnp.maximum(count, 1.0)
    n_valid = jnp.maximum(jnp.sum((count > 0).astype(jnp.float32)), 1.0)
    avg = jnp.sum(jnp.where(count > 0, frame_err, 0.0)) / n_valid
    return float(avg), float(jnp.max(norms))


def track_sequence(
    character: Character,
    markers: MarkerSequence,
    config: TrackingConfig = TrackingConfig(),
    universal: Optional[np.ndarray] = None,
    initial: Optional[jnp.ndarray] = None,
    extra_per_frame_errors: tuple = (),
    extra_sequence_errors: tuple = (),
    camera_keypoints: tuple = (),
    glove_data: tuple = (),
    glove_config=None,
):
    """Whole-sequence solve with smoothness (trackSequence,
    marker_tracker.cpp:228-700). Returns (TrackingResult, universal values).

    `extra_per_frame_errors` are frame-stacked error pytrees appended to the
    built-in marker/limit/collision set — the calibration pipeline passes its
    first-frame height/floor/pose constraints through here (the reference's
    addSequenceErrorFunctions extras, marker_tracker.cpp:374-476)."""
    f = markers.num_frames
    markers = _mask_low_visibility(markers, config.min_vis_percent)
    ef0, per_frame = _marker_error_template(character, markers, config)
    stacked = jax.vmap(per_frame, in_axes=(None, 0, 0))(
        ef0, markers.positions, markers.occluded)
    from momentum_tpu.sequence.solver_function import broadcast_frames

    # 2D keypoint projection constraints as stacked per-frame modules
    # (addKeypointProjectionConstraints, marker_tracker.cpp:312-366)
    for (e0, _pf), ckd in zip(
            _keypoint_templates(character, camera_keypoints, config),
            camera_keypoints):
        ef_f = broadcast_frames(e0, f)
        extra_per_frame_errors = tuple(extra_per_frame_errors) + (
            dataclasses.replace(ef_f, target=ckd.targets,
                                cweight=ckd.confidence),)

    # glove sensor constraints as stacked per-frame modules
    # (addSequenceFrameConstraints glove paths, marker_tracker.cpp:395-470)
    for pos0, ori0, glove in _glove_templates(character, glove_data,
                                              glove_config):
        valid = jnp.asarray(np.asarray(glove.valid, np.float32))
        extra_per_frame_errors = tuple(extra_per_frame_errors) + (
            dataclasses.replace(
                broadcast_frames(pos0, f),
                target=jnp.asarray(np.asarray(glove.positions, np.float32)),
                cweight=valid),
            dataclasses.replace(
                broadcast_frames(ori0, f),
                target=jnp.asarray(np.asarray(glove.orientations,
                                              np.float32)),
                cweight=valid),
        )

    limits = broadcast_frames(LimitErrorFunction.create(), f)
    seq_errors = tuple(extra_sequence_errors)
    if config.smoothing > 0:
        pweight = (np.asarray(config.smoothing_weights, np.float32)
                   if config.smoothing_weights else None)
        seq_errors = seq_errors + (ModelParametersSequenceErrorFunction.create(
            character.num_model_parameters, pweight=pweight,
            weight=config.smoothing),)

    per_frame_errors = [stacked, limits]
    if config.collision_error_weight > 0 and character.collision is not None:
        from momentum_tpu.errors import CollisionErrorFunction

        coll = CollisionErrorFunction.create(
            character, weight=config.collision_error_weight)
        per_frame_errors.append(broadcast_frames(coll, f))
    if getattr(config, "floor_constraints", True):
        fl = _floor_error(character)
        if fl is not None:
            per_frame_errors.append(broadcast_frames(fl, f))
    per_frame_errors.extend(extra_per_frame_errors)

    fn = SequenceSolverFunction.create(
        character, f, universal=universal,
        per_frame_errors=tuple(per_frame_errors), sequence_errors=seq_errors)
    if initial is not None:
        pf0, u0 = fn.split(initial)
    else:
        pf0 = jnp.zeros((f, fn.num_per_frame))
        u0 = jnp.zeros((fn.num_universal,))
    res = solve_sequence(fn, pf0, u0, SolverOptions(
        max_iterations=config.max_iter, regularization=config.regularization,
        # plain GN can overshoot the log2 scale on mm-scale uncalibrated
        # data; Armijo backtracking (the reference SequenceSolver option,
        # sequence_solver.cpp:531-555) keeps the universal solve in range
        do_line_search=(config.line_search
                        or config.method != "gauss_newton")))
    # NaN guard (tensor_ik.cpp:168-175 semantics): revert to the inits
    pf_bad = ~jnp.all(jnp.isfinite(res.per_frame))
    u_bad = ~jnp.all(jnp.isfinite(res.universal))
    per_frame_out = jnp.where(pf_bad, pf0, res.per_frame)
    universal_out = jnp.where(u_bad, u0, res.universal)
    motion = fn.join(per_frame_out, universal_out)
    return TrackingResult(motion=motion, errors=jnp.broadcast_to(res.error, (f,))), universal_out


def _mask_low_visibility(markers: MarkerSequence, min_vis_percent: float):
    """Frames with fewer visible markers than the threshold are fully
    occluded (skipped), marker_tracker.h minVisPercent semantics."""
    if min_vis_percent <= 0:
        return markers
    vis = 1.0 - markers.occluded.astype(jnp.float32)
    frac = jnp.mean(vis, axis=-1)
    skip = frac * 100.0 < min_vis_percent
    occ = jnp.where(skip[:, None], True, markers.occluded)
    return dataclasses.replace(markers, occluded=occ)


def _calibration_extras(character: Character, config, f: int) -> tuple:
    """Frame-stacked first-frame calibration constraints
    (addSequenceErrorFunctions, marker_tracker.cpp:392-463): each is active
    only on frame 0 with weight × solvedFrames — the reference's way of
    making a shared constraint count once rather than per frame.

    - target_height_cm → HeightErrorFunction (:422-428)
    - enforce_floor_in_first_frame → equality floor pin (:431-438)
    - first_frame_pose_constraint_set → pose-constraint values as hard
      targets (:454-461; minmax limits with lo == hi ≡ a model-parameter
      target error on those entries)
    """
    extras = []
    first = np.zeros(f, np.float32)
    first[0] = float(f)
    first = jnp.asarray(first)
    if config.target_height_cm > 0 and character.mesh is not None:
        from momentum_tpu.errors import HeightErrorFunction

        h0 = HeightErrorFunction.create(config.target_height_cm)
        extras.append(jax.vmap(
            lambda w: dataclasses.replace(h0, weight=w))(first))
    if config.enforce_floor_in_first_frame:
        fl = _floor_error(character, half_plane=False)
        if fl is not None:
            extras.append(jax.vmap(
                lambda w: dataclasses.replace(fl, weight=w))(first))
    pcs = config.first_frame_pose_constraint_set
    if pcs:
        pc = getattr(character.parameter_transform, "pose_constraints",
                     None) or {}
        if pcs in pc:
            from momentum_tpu.errors import ModelParametersErrorFunction

            p = character.num_model_parameters
            target = np.zeros(p, np.float32)
            mask = np.zeros(p, np.float32)
            for i, v in pc[pcs]:
                target[i] = v
                mask[i] = 1.0
            m0 = ModelParametersErrorFunction.create(target, pweight=mask)
            extras.append(jax.vmap(
                lambda w: dataclasses.replace(m0, weight=w))(first))
    return tuple(extras)


def _adaptive_floor_contacts(character: Character, config, motion):
    """Soft equality floor constraints on detected contact frames
    (marker_tracker.cpp:449-453 perFrameFloorContacts, detection at
    tracker_utils.cpp:944-1002): per floor locator, frames at or below the
    height percentile get pinned to the floor with 3× weight. Returns a
    frame-stacked PlaneErrorFunction (contact mask → cweight) or None."""
    from momentum_tpu.tracking.tracker_utils import (
        compute_floor_contact_constraints,
    )

    rows = _floor_rows(character)
    if rows is None:
        return None
    parents, offsets, cw = rows
    contact, _ = compute_floor_contact_constraints(
        character, motion, parents, offsets,
        percentile=config.floor_contact_percentile)
    fl = _floor_error(character, half_plane=False, weight=3.0)
    cw_frames = contact.astype(jnp.float32) * jnp.asarray(cw)  # (F, L)
    return jax.vmap(lambda c: dataclasses.replace(fl, cweight=c))(cw_frames)


def calibrate_model(
    character: Character,
    markers: MarkerSequence,
    config: CalibrationConfig = CalibrationConfig(),
    scaling_set: str = "scaling",
    initial: Optional[jnp.ndarray] = None,
    camera_keypoints: tuple = (),
):
    """Alternating identity calibration (calibrateModel,
    marker_tracker.cpp:1479-1720): sample frames, then repeat major_iter
    times {per-frame track → universal-scale sequence solve}.

    `scaling_set` names the parameter set holding identity/scale params
    (falls back to any parameter whose name contains 'scale').
    Returns (calibrated model params (P,) with identity filled in, motion);
    with config.locators_only the refined character is returned as a third
    element (its locator offsets were re-estimated instead of the scales).
    """
    f_all = markers.num_frames
    n_sample = min(config.calib_frames, f_all)
    if config.greedy_sampling > 0:
        # greedy most-visible-first sampling with a minimum frame separation
        # (marker_tracker.h greedySampling)
        vis = np.asarray(1.0 - markers.occluded.astype(jnp.float32)).mean(-1)
        order = np.argsort(-vis)
        picked = []
        for fidx in order:
            if all(abs(int(fidx) - q) >= config.greedy_sampling for q in picked):
                picked.append(int(fidx))
            if len(picked) >= n_sample:
                break
        idx = np.sort(np.asarray(picked, np.int64))
    else:
        stride = max(1, f_all // n_sample)
        idx = np.arange(0, f_all, stride)[:n_sample]
    sampled = MarkerSequence(
        positions=markers.positions[idx], occluded=markers.occluded[idx],
        names=markers.names)
    sampled_kp = tuple(
        CameraKeypointData(camera=ckd.camera, targets=ckd.targets[idx],
                           confidence=ckd.confidence[idx])
        for ckd in camera_keypoints)

    pt = character.parameter_transform
    p = character.num_model_parameters
    universal = np.zeros(p, bool)
    if scaling_set in pt.parameter_sets:
        universal[list(pt.parameter_sets[scaling_set])] = True
    else:
        for i, n in enumerate(pt.names):
            if "scale" in n.lower():
                universal[i] = True
    if config.global_scale_only:
        keep = np.zeros(p, bool)
        for i, n in enumerate(pt.names):
            if universal[i] and "global" in n.lower():
                keep[i] = True
        universal = keep if keep.any() else universal
    if config.calib_shape and character.blend_shape_param_index:
        universal[list(character.blend_shape_param_index)] = True

    track_cfg = TrackingConfig(
        loss_alpha=config.loss_alpha, loss_c=config.loss_c,
        max_iter=config.max_iter, regularization=config.regularization,
        method=config.method, freeze_scaling=config.freeze_scaling,
        projection_weight=getattr(config, "projection_weight", 0.0),
        line_search=True)

    if config.enforce_floor_in_first_frame and config.adaptive_floor_contact:
        raise ValueError("enforce_floor_in_first_frame and "
                         "adaptive_floor_contact are exclusive")
    extras_static = _calibration_extras(character, config, len(idx))

    identity = jnp.zeros(p) if initial is None else jnp.asarray(initial)
    motion = None
    for _ in range(config.major_iter):
        init = identity  # warm start with current identity estimate
        tracked = track_poses_per_frame(character, sampled, track_cfg,
                                        initial=init,
                                        camera_keypoints=sampled_kp)
        if config.locators_only:
            # refine only the locator offsets against the tracked poses
            # (calibrateLocators alternation, locatorsOnly)
            character = calibrate_locators(
                character, sampled, tracked.motion, config)
            motion = tracked.motion
            continue
        extras = extras_static
        if config.adaptive_floor_contact:
            ad = _adaptive_floor_contacts(character, config, tracked.motion)
            if ad is not None:
                extras = extras_static + (ad,)
        # 2D keypoint constraints ride the sequence solve as stacked
        # per-frame modules (addKeypointProjectionConstraints during
        # calibration, marker_tracker.cpp:312-366): every module field needs
        # the leading F axis, so tile the template then swap the tables in
        from momentum_tpu.sequence.solver_function import broadcast_frames

        for (e0, _pf), ckd_s in zip(
                _keypoint_templates(character, sampled_kp, config),
                sampled_kp):
            ef_f = broadcast_frames(e0, len(idx))
            extras = extras + (dataclasses.replace(
                ef_f, target=ckd_s.targets, cweight=ckd_s.confidence),)
        seq_res, u = track_sequence(
            character, sampled, track_cfg, universal=universal,
            initial=tracked.motion, extra_per_frame_errors=extras)
        u_idx = np.nonzero(universal)[0]
        identity = identity.at[u_idx].set(u)
        motion = seq_res.motion
    if config.locators_only:
        # locator offsets live on the character: return the updated one too
        return identity, motion, character
    return identity, motion


def calibrate_locators(
    character: Character,
    markers: MarkerSequence,
    motion: jnp.ndarray,
    config: CalibrationConfig = CalibrationConfig(),
    iterations: int = 10,
):
    """Refine locator offsets given a tracked motion (calibrateLocators):
    least-squares on the offset variables with poses held fixed. Because the
    marker residual is linear in the offset in the joint frame, a few GN
    steps on the offsets converge quickly; implemented with jax.grad on the
    summed clip energy."""
    li, mi = _match_locators(character, markers)
    loc = character.locators
    parents = jnp.asarray(np.asarray(loc.parent)[li])
    base_w = jnp.asarray(np.asarray(loc.weight)[li])
    states = jax.vmap(character.skeleton_states)(motion)  # (F, nJ, 8)

    from momentum_tpu.math import skel_state as ss

    def energy(offsets):
        st = jnp.take(states, parents, axis=-2)  # (F, L, 8)
        world = ss.transform_points(st, offsets)
        tgt = markers.positions[:, mi]
        w = base_w * (1.0 - markers.occluded[:, mi].astype(jnp.float32))
        return jnp.sum(w * jnp.sum((world - tgt) ** 2, axis=-1))

    offsets = jnp.asarray(np.asarray(loc.offset)[li])

    # Gauss-Newton on a per-locator 3x3 system (closed-form per step)
    def gn_step(offsets, _):
        g = jax.grad(energy)(offsets)
        # diagonal 3x3 blocks of the Hessian via 3 HVPs (offsets independent)
        def hvp(v):
            return jax.jvp(jax.grad(energy), (offsets,), (v,))[1]
        eye = jnp.eye(3)
        cols = jnp.stack([hvp(jnp.broadcast_to(eye[i], offsets.shape)) for i in range(3)],
                         axis=-1)  # (L, 3, 3)
        delta = jnp.linalg.solve(cols + 1e-8 * eye, g[..., None])[..., 0]
        return offsets - delta, None

    offsets, _ = jax.lax.scan(gn_step, offsets, None, length=iterations)

    new_off = np.asarray(loc.offset).copy()
    new_off[li] = np.asarray(offsets)
    new_loc = dataclasses.replace(loc, offset=jnp.asarray(new_off))
    return dataclasses.replace(character, locators=new_loc)


def refine_motion(
    character: Character,
    markers: MarkerSequence,
    motion: jnp.ndarray,
    config=None,
    camera_keypoints: tuple = (),
):
    """Refine an existing motion against the markers (refineMotion,
    marker_tracker.cpp): whole-sequence solve warm-started at `motion`, with
    an optional per-frame regularizer pulling toward the input and optional
    identity re-calibration (RefineConfig.calib_id)."""
    from momentum_tpu.errors import ModelParametersErrorFunction
    from momentum_tpu.tracking.config import RefineConfig

    config = config or RefineConfig()
    f = markers.num_frames
    p = character.num_model_parameters
    markers = _mask_low_visibility(markers, config.min_vis_percent)
    ef0, per_frame = _marker_error_template(character, markers, config)
    stacked = jax.vmap(per_frame, in_axes=(None, 0, 0))(
        ef0, markers.positions, markers.occluded)
    from momentum_tpu.sequence.solver_function import broadcast_frames

    limits = broadcast_frames(LimitErrorFunction.create(), f)
    per_frame_errors = [stacked, limits]
    # 2D keypoint projection constraints as stacked per-frame modules
    # (addKeypointProjectionConstraints, marker_tracker.cpp:312-366)
    for (e0, _pf), ckd in zip(
            _keypoint_templates(character, camera_keypoints, config),
            camera_keypoints):
        ef_f = broadcast_frames(e0, f)
        per_frame_errors.append(dataclasses.replace(
            ef_f, target=ckd.targets, cweight=ckd.confidence))
    if config.regularizer > 0:
        reg0 = ModelParametersErrorFunction.create(
            np.zeros(p, np.float32), weight=config.regularizer)
        reg = jax.vmap(lambda t: dataclasses.replace(reg0, target=t))(motion)
        per_frame_errors.append(reg)

    seq_errors = ()
    if config.smoothing > 0:
        # honor per-parameter smoothing weights exactly as track_sequence
        # does (unit-converted configs rescale translation-param entries)
        pweight = (np.asarray(config.smoothing_weights, np.float32)
                   if config.smoothing_weights else None)
        seq_errors = (ModelParametersSequenceErrorFunction.create(
            p, pweight=pweight, weight=config.smoothing),)

    universal = None
    if config.calib_id:
        pt = character.parameter_transform
        universal = np.zeros(p, bool)
        if "scaling" in pt.parameter_sets:
            universal[list(pt.parameter_sets["scaling"])] = True
        else:
            for i, n in enumerate(pt.names):
                if "scale" in n.lower():
                    universal[i] = True

    fn = SequenceSolverFunction.create(
        character, f, universal=universal,
        per_frame_errors=tuple(per_frame_errors), sequence_errors=seq_errors)
    pf0, u0 = fn.split(motion)
    use_f64 = getattr(config, "f64", True)
    opts = SolverOptions(
        max_iterations=config.max_iter, regularization=config.regularization,
        # mm-scale marker data can overshoot under plain GN exactly as in
        # track_sequence; Armijo backtracking (sequence_solver.cpp:531-555)
        do_line_search=(config.line_search
                        or config.method != "gauss_newton"),
        # the smoothing-dominated refine system is genuinely near-singular
        # at ~1e-7 relative curvature (measured recursion-pivot min-eig
        # 1.05e-7 → −7e-8 across the real clip — f32 Cholesky NaN). The
        # principled fix is double-precision normal equations + solve
        # (sequence_cholesky_solver.h:31-33), the default; the f32 fallback
        # keeps the LM-style 1e-5 equilibrated jitter consistent with the
        # pull-to-input regularizer this objective already carries.
        f64_normal_equations=use_f64,
        equilibrated_jitter=None if use_f64 else 1e-5)
    if use_f64:
        # scope x64 to this solve: trace + execution see real float64
        # (outside the context f64 requests silently truncate to f32)
        with jax.enable_x64(True):
            res = solve_sequence(fn, pf0, u0, opts)
    else:
        res = solve_sequence(fn, pf0, u0, opts)
    # NaN guard (tensor_ik.cpp:168-175 semantics): a diverged refine reverts
    # to the input motion rather than poisoning it
    pf_bad = ~jnp.all(jnp.isfinite(res.per_frame))
    u_bad = ~jnp.all(jnp.isfinite(res.universal))
    per_frame_out = jnp.where(pf_bad, pf0, res.per_frame)
    universal_out = jnp.where(u_bad, u0, res.universal)
    refined = fn.join(per_frame_out, universal_out)
    return TrackingResult(motion=refined,
                          errors=jnp.broadcast_to(res.error, (f,))), universal_out
