#!/usr/bin/env python
"""Guided tour of momentum_tpu: the framework's core workflows in one
runnable script (the user-guide walkthrough the reference's website stubs
out, written against this API).

Sections:
  1. character basics     — build, FK, skinning
  2. single IK solve      — error functions + Gauss-Newton
  3. batched IK           — batch-native solve + compacted tail refinement
  4. differentiable IK    — gradients through the solve (IFT)
  5. sequence solve       — per-frame + universal parameters
  6. IO round trip        — save/load GLB
  7. rendering            — rasterize a posed frame with a ground plane
  8. keypoint tracking    — multi-view 2D keypoint fusion

Runs on CPU by default (pass --tpu to use the accelerator when attached).
"""

# Allow running from a source checkout: `python examples/<tool>.py` puts
# examples/ (not the repo root) on sys.path
import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import dataclasses

import numpy as np


def section(title):
    print(f"\n=== {title} " + "=" * max(0, 60 - len(title)))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tpu", action="store_true",
                    help="use the attached accelerator (default: CPU)")
    ap.add_argument("--out-dir", default="/tmp",
                    help="where the tutorial writes its artifacts")
    args = ap.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # ---- 1. character basics -------------------------------------------
    section("1. character basics")
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(6)
    print(f"joints: {char.skeleton.joint_names}")
    print(f"model parameters: {char.parameter_transform.names[:6]}... "
          f"({char.num_model_parameters} total)")

    rng = np.random.default_rng(7)
    theta = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters),
                        jnp.float32)
    states = char.skeleton_states(theta)          # (nJ, 8) global skel states
    print(f"FK root position: {np.asarray(states[0, :3]).round(3)}")
    posed = char.pose_mesh(theta)                 # LBS-skinned vertices
    print(f"posed mesh: {posed.shape}")

    # ---- 2. single IK solve --------------------------------------------
    section("2. single IK solve")
    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.solver import (
        SkeletonSolverFunction, SolverOptions, solve_ik)

    targets = char.locators.world_positions(states)
    ef = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(targets))
    fn = SkeletonSolverFunction(char, (ef,))
    res = solve_ik(fn, jnp.zeros(char.num_model_parameters), None,
                   SolverOptions(max_iterations=20, regularization=1e-4),
                   method="levenberg_marquardt")
    print(f"IK from rest: energy {float(res.error):.2e} "
          f"after {int(res.iterations)} iterations")

    # ---- 3. batched IK + compacted refinement --------------------------
    section("3. batched IK + compacted tail refinement")
    from momentum_tpu.solver import solve_compacted
    from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt

    B = 32
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (B, char.num_model_parameters)),
                     jnp.float32)
    batch_targets = jax.vmap(char.locators.world_positions)(
        jax.vmap(char.skeleton_states)(gt))
    x0 = gt + jnp.asarray(rng.normal(0, 0.05, gt.shape), jnp.float32)
    opts = SolverOptions(max_iterations=6, regularization=1e-5,
                         energy_from_residual=True)

    def solve_stage(tg, x, iters, lam0):
        ef_b = dataclasses.replace(ef, target=tg)
        fn_b = SkeletonSolverFunction(char, (ef_b,), prefer_fused=True)
        o = dataclasses.replace(opts, max_iterations=iters)
        return solve_levenberg_marquardt(
            fn_b.residual, fn_b.error, x, options=o,
            jacobian_fn=fn_b.residual_and_jacobian, lambda0=lam0)

    # 4 full-batch iterations, then 2 more on only the 8 worst elements —
    # continuous batching for IK (docs/BENCHMARKS.md "Compacted tail
    # refinement"; λ state carries so results match the uncompacted solve)
    res_b = solve_compacted(solve_stage, batch_targets, x0,
                            capacity=8, k_full=4, r_refine=2)
    conv = float(jnp.mean(res_b.error < 1e-5))
    print(f"batched IK: {B} solves, conv@1e-5 = {conv:.2f}, "
          f"median energy {float(jnp.median(res_b.error)):.2e}")

    # ---- 4. differentiable IK ------------------------------------------
    section("4. differentiable IK (implicit function theorem)")
    from momentum_tpu.solver import solve_ik_ift

    def loss(tg):
        ef_d = dataclasses.replace(ef, target=tg)
        fn_d = SkeletonSolverFunction(char, (ef_d,))
        theta_star = solve_ik_ift(
            fn_d, jnp.zeros(char.num_model_parameters), None,
            SolverOptions(max_iterations=10, regularization=1e-4),
            "levenberg_marquardt")
        return jnp.sum(theta_star ** 2)

    g = jax.grad(loss)(targets)
    print(f"d(loss)/d(targets): shape {g.shape}, "
          f"|g| = {float(jnp.linalg.norm(g)):.3f} "
          "(gradients flow through the solver into constraint targets)")

    # ---- 5. sequence solve ---------------------------------------------
    section("5. sequence solve (per-frame + universal parameters)")
    from momentum_tpu.sequence import (
        ModelParametersSequenceErrorFunction, SequenceSolverFunction,
        solve_sequence, stack_frames)

    F = 8
    universal_mask = np.asarray(char.parameter_transform.scaling_parameters)
    gt_seq = rng.uniform(-0.2, 0.2,
                         (F, char.num_model_parameters)).astype(np.float32)
    gt_seq[:, universal_mask] = 0.15  # ONE shared scale across all frames
    frame_targets = jax.vmap(char.locators.world_positions)(
        jax.vmap(char.skeleton_states)(jnp.asarray(gt_seq)))
    per_frame_efs = stack_frames(
        [dataclasses.replace(ef, target=frame_targets[f]) for f in range(F)])
    smooth = ModelParametersSequenceErrorFunction.create(
        char.num_model_parameters, weight=1e-4)
    seq_fn = SequenceSolverFunction.create(
        char, F, universal=universal_mask, per_frame_errors=(per_frame_efs,),
        sequence_errors=(smooth,))
    seq_res = solve_sequence(
        seq_fn, jnp.zeros((F, seq_fn.num_per_frame)),
        jnp.zeros(seq_fn.num_universal),
        SolverOptions(max_iterations=40, regularization=1e-5))
    print(f"sequence solve: {F} frames, final energy "
          f"{float(seq_res.error):.2e}; recovered shared scale "
          f"{float(seq_res.universal[0]):.3f} (true 0.150)")

    # ---- 6. IO round trip ----------------------------------------------
    section("6. IO round trip")
    from momentum_tpu.character import Character

    out = _os.path.join(args.out_dir, "tutorial_character.glb")
    motion = np.asarray(res_b.params[:4])
    char.save_gltf(out, motion=motion, fps=30.0)
    char2, motion2, fps = Character.load_gltf_with_motion(out)
    print(f"round trip {out}: {char2.num_joints} joints, "
          f"motion {None if motion2 is None else np.asarray(motion2).shape} "
          f"@ {fps:g} fps")

    # ---- 7. rendering ---------------------------------------------------
    section("7. rendering")
    from momentum_tpu.gui.viewer import render_motion

    frames = render_motion(char, motion[:1], width=96, height=72, ground=True,
                           skeleton_overlay=True)
    print(f"rendered {frames.shape} (use examples/viewer.py for GIF export)")

    # ---- 8. multi-view keypoint tracking -------------------------------
    section("8. multi-view 2D keypoint tracking")
    from momentum_tpu.camera import Camera, PinholeIntrinsics
    from momentum_tpu.tracking import (
        CameraKeypointData, MarkerSequence, TrackingConfig,
        track_poses_batched)

    Fk = 6
    gt_k = jnp.asarray(rng.uniform(-0.2, 0.2,
                                   (Fk, char.num_model_parameters)),
                       jnp.float32)
    pos_k = jax.vmap(char.locators.world_positions)(
        jax.vmap(char.skeleton_states)(gt_k))
    mk = MarkerSequence(positions=pos_k,
                        occluded=jnp.zeros(pos_k.shape[:2], bool),
                        names=tuple(char.locators.names))
    cam_kp = Camera.create(PinholeIntrinsics.create(
        200.0, 200.0, 63.5, 47.5, image_size=(128, 96))).look_at(
        (0.0, 1.0, -8.0), (0.0, 1.0, 0.0))
    uvz_k, valid_k = jax.vmap(cam_kp.project)(pos_k)
    keypoints = CameraKeypointData(camera=cam_kp, targets=uvz_k[..., :2],
                                   confidence=valid_k.astype(jnp.float32))
    # track from 2D detections ALONE (marker constraints disabled)
    res_kp = track_poses_batched(
        char, mk,
        TrackingConfig(max_iter=20, method="levenberg_marquardt",
                       marker_weight=0.0, projection_weight=1.0),
        camera_keypoints=(keypoints,))
    uvz2, _ = jax.vmap(cam_kp.project)(
        jax.vmap(char.locators.world_positions)(
            jax.vmap(char.skeleton_states)(res_kp.motion)))
    px = float(jnp.median(jnp.linalg.norm(uvz2[..., :2] - uvz_k[..., :2],
                                          axis=-1)))
    print(f"keypoints-only tracking: median reprojection error {px:.2e} px")
    print("\ntutorial done.")


if __name__ == "__main__":
    main()
