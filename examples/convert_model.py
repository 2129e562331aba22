"""Convert a character between formats.

Reference: momentum/examples/convert_model (convert_model.cpp) — load any
supported character container, write another. Formats are inferred from file
extensions.

    python examples/convert_model.py --in model.glb --out model.obj
    python examples/convert_model.py --in robot.urdf --out robot.glb
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


def load_any(path):
    """→ (Character, motion or None, fps)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".glb", ".gltf"):
        from momentum_tpu.io.gltf import load_character_glb

        return load_character_glb(path)
    if ext == ".fbx":
        from momentum_tpu.io.fbx import load_fbx_with_motion

        return load_fbx_with_motion(path)
    if ext == ".bvh":
        from momentum_tpu.io.bvh import load_bvh

        return load_bvh(path)
    if ext == ".urdf":
        from momentum_tpu.io.urdf import load_urdf

        return load_urdf(path), None, 120.0
    if ext in (".usda", ".usdc", ".usd"):
        from momentum_tpu.io.usd import load_usd

        char, motion = load_usd(path)
        if motion is not None and getattr(motion, "ndim", 0) != 2:
            motion = None  # joint-matrix motion has no model-param mapping
        return char, motion, 120.0
    if ext in (".model", ".cfg"):
        from momentum_tpu.io.model_definition import load_momentum_model

        return load_momentum_model(path), None, 120.0
    if ext == ".json":
        from momentum_tpu.io.legacy_json import load_legacy_json

        return load_legacy_json(path), None, 120.0
    raise SystemExit(f"unsupported input format: {ext}")


def save_any(path, character, motion, fps):
    ext = os.path.splitext(path)[1].lower()
    if ext in (".glb", ".gltf"):
        from momentum_tpu.io.gltf import save_character_glb

        save_character_glb(path, character, motion=motion, fps=fps)
        return
    if ext == ".bvh":
        from momentum_tpu.io.bvh import save_bvh

        jp = motion if motion is not None else None
        if jp is not None and jp.shape[-1] == character.num_model_parameters:
            import jax

            jp = jax.vmap(character.joint_parameters)(jp)
        if jp is None:
            import numpy as np

            jp = np.zeros((1, character.skeleton.num_joint_parameters))
        save_bvh(path, character, jp, fps=fps)
        return
    if ext == ".obj":
        from momentum_tpu.io.obj import save_obj

        if character.mesh is None:
            raise SystemExit("character has no mesh to export as OBJ")
        save_obj(path, character.mesh.vertices, character.mesh.faces)
        return
    if ext in (".usda", ".usdc", ".usd"):
        from momentum_tpu.io.usd import save_usd

        save_usd(path, character)
        return
    if ext == ".json":
        from momentum_tpu.io.legacy_json import save_legacy_json

        save_legacy_json(path, character)
        return
    if ext == ".fbx":
        from momentum_tpu.io.fbx_writer import save_fbx, save_fbx_with_joint_params

        if motion is not None and \
                motion.shape[-1] == character.skeleton.num_joint_parameters:
            save_fbx_with_joint_params(path, character, motion, fps=fps)
        else:
            save_fbx(path, character, motion=motion, fps=fps)
        return
    raise SystemExit(f"unsupported output format: {ext}")


def main():
    import jax

    # host-side tool: force the CPU backend (the TPU plugin may be busy or
    # absent, and nothing here needs it)
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", dest="out", required=True)
    ap.add_argument("--fps", type=float, default=None,
                    help="override output frame rate")
    args = ap.parse_args()
    character, motion, fps = load_any(args.inp)
    save_any(args.out, character, motion, args.fps or fps)
    nj = character.skeleton.num_joints
    nf = 0 if motion is None else len(motion)
    print(f"converted {args.inp} -> {args.out} ({nj} joints, {nf} frames)")


if __name__ == "__main__":
    main()
