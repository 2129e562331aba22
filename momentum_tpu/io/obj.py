"""Wavefront OBJ export (the reference's export_objs example +
rasterizer mesh dumps)."""

from __future__ import annotations

import numpy as np

__all__ = ["save_obj", "export_motion_objs"]


def save_obj(path, vertices, faces, normals=None) -> None:
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if normals is not None:
            for n in np.asarray(normals):
                f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for tri in faces + 1:
            if normals is not None:
                f.write(f"f {tri[0]}//{tri[0]} {tri[1]}//{tri[1]} {tri[2]}//{tri[2]}\n")
            else:
                f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def export_motion_objs(prefix, character, motion, stride: int = 1) -> list:
    """Write one OBJ per (strided) frame of a model-parameter motion
    (examples/export_objs equivalent). Returns written paths."""
    import jax

    from momentum_tpu.compat import skin_points_from_model_parameters

    paths = []
    posed = jax.vmap(lambda m: skin_points_from_model_parameters(character, m))(
        motion[::stride])
    for i in range(posed.shape[0]):
        p = f"{prefix}_{i * stride:05d}.obj"
        save_obj(p, np.asarray(posed[i]), np.asarray(character.mesh.faces))
        paths.append(p)
    return paths
