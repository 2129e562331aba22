"""Refine an existing tracked motion against marker data.

Reference: momentum/examples/refine_motion (refine_motion.cpp →
marker_tracking::refineMotion).

    python examples/refine_motion.py --character c.glb --markers m.c3d \\
        --motion tracked.glb --out refined.glb [--smoothing 1.0]
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

import numpy as np


def main():
    import jax

    # host-side tool: force the CPU backend (the TPU plugin may be busy or
    # absent, and nothing here needs it)
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--character", required=True)
    ap.add_argument("--markers", required=True)
    ap.add_argument("--motion", default=None,
                    help="container with the initial motion (defaults to "
                         "--character's own)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-frames", type=int, default=200)
    args = ap.parse_args()

    import jax.numpy as jnp

    from examples.convert_model import load_any
    from momentum_tpu.io.gltf import save_character_glb
    from momentum_tpu.io.markers import load_c3d, load_trc
    from momentum_tpu.tracking.tracker import refine_motion

    character, motion, fps = load_any(args.character)
    if args.motion:
        _, motion, fps = load_any(args.motion)
    if motion is None:
        raise SystemExit("no motion found; pass --motion")

    raw = (load_trc if args.markers.lower().endswith(".trc")
           else load_c3d)(args.markers)
    seq = raw.to_marker_sequence()

    import dataclasses

    f = min(len(motion), int(seq.num_frames), args.max_frames)
    seq = dataclasses.replace(seq, positions=seq.positions[:f],
                              occluded=seq.occluded[:f])
    result, _scale = refine_motion(character, seq, jnp.asarray(motion[:f]))
    params = np.asarray(result.motion)
    save_character_glb(args.out, character, motion=params, fps=fps)
    print(f"refined {f} frames -> {args.out}")


if __name__ == "__main__":
    main()
