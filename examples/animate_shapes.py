"""Animate blend shapes: sweep each shape coefficient and export the meshes.

Reference: momentum/examples/animate_shapes.

    python examples/animate_shapes.py --character c.glb --out /tmp/shapes.gif
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
    ap.add_argument("--out", required=True, help=".gif output")
    ap.add_argument("--frames-per-shape", type=int, default=8)
    ap.add_argument("--amplitude", type=float, default=2.0)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from examples.convert_model import load_any

    character, _, _ = load_any(args.character)
    bs = character.blend_shape
    if bs is None:
        raise SystemExit("character has no blend shapes")
    if not character.blend_shape_param_index:
        from momentum_tpu.character.utility import add_blend_shape_parameters

        character = add_blend_shape_parameters(character, bs)

    idx = np.asarray(character.blend_shape_param_index)
    p = character.num_model_parameters
    motion = []
    for k in range(len(idx)):
        for t in range(args.frames_per_shape):
            theta = np.zeros(p, np.float32)
            phase = np.sin(2 * np.pi * t / args.frames_per_shape)
            theta[idx[k]] = args.amplitude * phase
            motion.append(theta)

    from momentum_tpu.gui import save_motion_gif

    save_motion_gif(args.out, character, np.stack(motion),
                    width=args.size, height=args.size, fps=12)
    print(f"animated {len(idx)} blend shapes "
          f"({len(motion)} frames) -> {args.out}")


if __name__ == "__main__":
    main()
