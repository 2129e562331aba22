#!/usr/bin/env python
"""End-to-end marker-file pipeline CLI.

Mirror of the reference's process_markers_app
(momentum/examples/process_markers_app/process_markers_app.cpp:16 →
marker_tracking/process_markers.cpp:292 processMarkerFile):
  load character (+ model definition) → load markers (C3D/TRC) →
  calibrate identity → track per frame → save motion (GLB/MMO/BVH).

Usage:
  python examples/process_markers.py --markers clip.c3d --character char.glb \
      --out solved.glb [--calib-frames 60] [--max-iter 30] [--smoothing 0]
"""

from __future__ import annotations

# Allow running from a source checkout: `python examples/<tool>.py` puts
# examples/ (not the repo root) on sys.path
import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import sys
import time


def _select_backend():
    """Prefer the accelerator; fall back to CPU when the plugin can't init
    (busy tunnel, missing hardware) instead of dying. Set
    MOMENTUM_TPU_FORCE_CPU=1 to skip the accelerator entirely (the device
    probe can HANG rather than raise while another process holds the
    tunnel)."""
    import os

    import jax

    if os.environ.get("MOMENTUM_TPU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        return
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.extend.backend.clear_backends()  # drop the cached failure
        except Exception:
            pass


def main(argv=None):
    _select_backend()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", help="INI config file with option "
                    "defaults (the reference CLI's set_config('-c'), "
                    "process_markers_app.cpp:19-51)")
    ap.add_argument("--markers", required=True, help="C3D or TRC marker file")
    ap.add_argument("--character", required=True,
                    help="GLB character file, or the literal 'cmu' to "
                    "bootstrap the built-in CMU/Vicon 41-marker humanoid "
                    "(tracking/cmu.py) — lets real CMU clips like the "
                    "reference's 02_01.c3d run without a model asset")
    ap.add_argument("--model", help="optional .model/.cfg parameter definition")
    ap.add_argument("--out", required=True, help="output .glb/.mmo/.bvh motion")
    ap.add_argument("--calib-frames", type=int, default=60)
    ap.add_argument("--major-iter", type=int, default=2)
    ap.add_argument("--max-iter", type=int, default=30)
    ap.add_argument("--smoothing", type=float, default=0.0)
    ap.add_argument("--no-calibrate", action="store_true")
    ap.add_argument("--method", default=None,
                    help="per-frame solver: gauss_newton (default) or "
                    "levenberg_marquardt (robust on uncalibrated rigs)")
    ap.add_argument("--calibrate-locators", action="store_true",
                    help="also refine locator offsets against the clip "
                    "(calibrateLocators alternation)")
    import configparser

    # INI config supplies defaults; explicit CLI flags win
    # (the reference CLI's set_config("-c"), process_markers_app.cpp:19-51)
    pre, _ = ap.parse_known_args(argv)
    if getattr(pre, "config", None):
        cp = configparser.ConfigParser()
        cp.read(pre.config)
        defaults = dict(cp.defaults())
        for sec in cp.sections():
            defaults.update(dict(cp[sec]))
        known = {a.dest for a in ap._actions}
        ap.set_defaults(**{k.replace("-", "_"): v for k, v in defaults.items()
                           if k.replace("-", "_") in known})
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    import momentum_tpu.io as mio
    from momentum_tpu.io.model_definition import load_model_definition
    from momentum_tpu.tracking import (
        CalibrationConfig, TrackingConfig, calibrate_model, track_poses_per_frame,
        track_sequence,
    )

    t0 = time.time()
    bootstrap_cmu = args.character.lower() == "cmu"
    if bootstrap_cmu:
        from momentum_tpu.tracking.cmu import create_cmu_character

        character = create_cmu_character()
        if args.method is None:
            args.method = "levenberg_marquardt"  # cold-start robustness
    else:
        character, _, _ = mio.load_character_glb(args.character)
    method = args.method or "gauss_newton"
    if args.model:
        import dataclasses
        pt, limits = load_model_definition(args.model, character.skeleton)
        character = dataclasses.replace(
            character, parameter_transform=pt, limits=limits)
    print(f"character: {character.num_joints} joints, "
          f"{character.num_model_parameters} parameters")

    if args.markers.lower().endswith(".trc"):
        raw = mio.load_trc(args.markers)
    else:
        raw = mio.load_c3d(args.markers)
    markers = raw.to_marker_sequence()
    print(f"markers: {markers.num_frames} frames × {markers.num_markers} markers "
          f"@ {raw.fps:g} fps")

    identity = jnp.zeros(character.num_model_parameters)
    if bootstrap_cmu:
        # seed the free root translation at the first frame's marker centroid
        identity = identity.at[:3].set(jnp.nanmean(markers.positions[0], axis=0))
    if not args.no_calibrate:
        cfg = CalibrationConfig(calib_frames=args.calib_frames,
                                major_iter=args.major_iter,
                                max_iter=args.max_iter, method=method,
                                regularization=1e-3 if bootstrap_cmu else 0.05)
        # the returned identity includes the initial seed with the universal
        # (scale) entries replaced by their calibrated values
        identity, _ = calibrate_model(character, markers, cfg, initial=identity)
        print(f"calibrated identity: |θ_id| = {float(jnp.linalg.norm(identity)):.4f}")
        if args.calibrate_locators or bootstrap_cmu:
            import dataclasses as _dc
            cfg_loc = _dc.replace(cfg, locators_only=True,
                                  major_iter=max(1, args.major_iter - 1))
            _, _, character = calibrate_model(
                character, markers, cfg_loc, initial=identity)
            print("locator offsets refined against the clip")

    tcfg = TrackingConfig(max_iter=args.max_iter, smoothing=args.smoothing,
                          method=method,
                          regularization=1e-3 if bootstrap_cmu else 0.05)
    if args.smoothing > 0:
        result, _ = track_sequence(character, markers, tcfg, initial=None)
    else:
        result = track_poses_per_frame(character, markers, tcfg, initial=identity)
    med = float(jnp.median(result.errors))
    print(f"tracked {markers.num_frames} frames, median residual {med:.3e} "
          f"({time.time() - t0:.1f}s total)")

    motion = np.asarray(result.motion)
    if args.out.endswith(".glb"):
        mio.save_character_glb(args.out, character, motion=motion, fps=raw.fps)
    elif args.out.endswith(".mmo"):
        mio.save_mmo(args.out, motion, np.zeros(character.num_joints, np.float32),
                     list(character.parameter_transform.names),
                     list(character.skeleton.joint_names))
    elif args.out.endswith(".bvh"):
        jp = np.asarray(character.parameter_transform.apply(jnp.asarray(motion)))
        mio.save_bvh(args.out, character, jp, fps=raw.fps)
    else:
        raise SystemExit(f"unknown output format: {args.out}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
