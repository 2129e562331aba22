"""Export a motion as per-frame OBJ meshes.

Reference: momentum/examples/export_objs — pose the character at every frame
of a motion and write numbered OBJ files.

    python examples/export_objs.py --character c.glb --out /tmp/frames \\
        [--motion m.glb] [--stride 5]
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


def main():
    import jax

    # host-side tool: force the CPU backend (the TPU plugin may be busy or
    # absent, and nothing here needs it)
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--character", required=True)
    ap.add_argument("--motion", default=None,
                    help="separate motion container (defaults to the "
                         "character file's own motion)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--stride", type=int, default=1)
    args = ap.parse_args()

    from examples.convert_model import load_any

    character, motion, _ = load_any(args.character)
    if args.motion:
        _, motion, _ = load_any(args.motion)
    if motion is None:
        motion = np.zeros((1, character.num_model_parameters), np.float32)
    if character.mesh is None or character.skin_weights is None:
        raise SystemExit("character has no skinned mesh")

    import jax
    import jax.numpy as jnp

    from momentum_tpu.character.skinning import skin_points
    from momentum_tpu.io.obj import save_obj

    character = character.with_inverse_bind_pose()

    @jax.jit
    def pose(theta):
        states = character.skeleton_states(theta)
        return skin_points(character.skin_weights, states,
                           character.inverse_bind_pose,
                           character.mesh.vertices)

    os.makedirs(args.out, exist_ok=True)
    frames = np.asarray(motion)[:: args.stride]
    for i, theta in enumerate(frames):
        verts = pose(jnp.asarray(theta, jnp.float32))
        save_obj(os.path.join(args.out, f"frame_{i:05d}.obj"),
                 verts, character.mesh.faces)
    print(f"wrote {len(frames)} OBJ frames to {args.out}")


if __name__ == "__main__":
    main()
