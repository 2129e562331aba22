"""Depth-tested 3-D overlay rasterization: lines, circles, splats.

Reference: momentum/rasterizer/rasterizer.h:229 rasterizeLines, :278
rasterizeCircles, :475 rasterizeSplats — the scene-annotation primitives
(skeleton bones, marker dots, point-cloud surfaces) drawn INTO the same
z-buffer as the mesh so they occlude and are occluded correctly.

TPU shape: each primitive family evaluates densely over the pixel grid —
a (chunk, H, W) coverage/depth tensor reduced by min-depth — instead of the
reference's per-scanline SIMD loops. Buffers follow the reference's
input/output convention: pass the z/rgb buffers from a previous pass
(e.g. render_mesh_phong's `depth`/`color`) to composite; omitted buffers
start empty (depth +inf, color black).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["rasterize_lines", "rasterize_circles", "rasterize_splats"]


def _grid(width, height, image_offset):
    dx, dy = image_offset
    px = jnp.arange(width, dtype=jnp.float32) + 0.5 - dx
    py = jnp.arange(height, dtype=jnp.float32) + 0.5 - dy
    return jnp.meshgrid(px, py)  # (H, W) each


def _buffers(z_buffer, rgb_buffer, width, height):
    z = (jnp.full((height, width), jnp.inf, jnp.float32)
         if z_buffer is None else jnp.asarray(z_buffer, jnp.float32))
    rgb = (jnp.zeros((height, width, 3), jnp.float32)
           if rgb_buffer is None else jnp.asarray(rgb_buffer, jnp.float32))
    return z, rgb


def _composite_min_depth(z, rgb, depths, colors):
    """depths (N, H, W) with +inf outside coverage; colors (N, 3) or
    (N, H, W, 3). Nearest primitive wins, then z-tests against the buffer."""
    best = jnp.argmin(depths, axis=0)  # (H, W)
    dmin = jnp.take_along_axis(depths, best[None], axis=0)[0]
    if colors.ndim == 2:
        cmin = colors[best]  # (H, W, 3)
    else:
        cmin = jnp.take_along_axis(colors, best[None, ..., None], axis=0)[0]
    hit = (dmin < z) & jnp.isfinite(dmin)
    return jnp.where(hit, dmin, z), jnp.where(hit[..., None], cmin, rgb)


def rasterize_lines(camera, positions_world, width: int, height: int,
                    color=(1.0, 1.0, 1.0), thickness: float = 1.0,
                    z_buffer=None, rgb_buffer=None, near_clip: float = 1e-3,
                    depth_offset: float = 0.0, image_offset=(0.0, 0.0),
                    chunk: int = 64):
    """Depth-tested 3-D segments (rasterizeLines, rasterizer.h:229):
    consecutive position pairs form segments, projected and drawn with
    `thickness` pixels, depth linearly interpolated along the segment.
    → (z_buffer, rgb_buffer)."""
    p = jnp.asarray(positions_world, jnp.float32).reshape(-1, 2, 3)
    uvz, _ = camera.project(p.reshape(-1, 3))
    uvz = uvz.reshape(-1, 2, 3)
    z, rgb = _buffers(z_buffer, rgb_buffer, width, height)
    px, py = _grid(width, height, image_offset)
    color = jnp.asarray(color, jnp.float32)
    half = 0.5 * max(thickness, 1.0)

    for s0 in range(0, uvz.shape[0], chunk):
        seg = uvz[s0:s0 + chunk]  # (C, 2, 3)
        a, b = seg[:, 0], seg[:, 1]  # (C, 3)
        ok = (a[:, 2] > near_clip) & (b[:, 2] > near_clip)
        d = b[:, :2] - a[:, :2]  # (C, 2)
        len2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
        # closest parameter t of each pixel on each segment
        rel_x = px[None] - a[:, 0, None, None]
        rel_y = py[None] - a[:, 1, None, None]
        t = (rel_x * d[:, 0, None, None] + rel_y * d[:, 1, None, None]) / \
            len2[:, None, None]
        t = jnp.clip(t, 0.0, 1.0)
        cx = a[:, 0, None, None] + t * d[:, 0, None, None]
        cy = a[:, 1, None, None] + t * d[:, 1, None, None]
        dist2 = (px[None] - cx) ** 2 + (py[None] - cy) ** 2
        depth = a[:, 2, None, None] + t * (b[:, 2] - a[:, 2])[:, None, None] \
            + depth_offset
        cover = (dist2 <= half * half) & ok[:, None, None] & (depth > 0)
        depths = jnp.where(cover, depth, jnp.inf)
        z, rgb = _composite_min_depth(
            z, rgb, depths, jnp.broadcast_to(color, (seg.shape[0], 3)))
    return z, rgb


def rasterize_circles(camera, positions_world, width: int, height: int,
                      radius: float = 1.0, line_color=None, fill_color=None,
                      line_thickness: float = 1.0, z_buffer=None,
                      rgb_buffer=None, near_clip: float = 1e-3,
                      depth_offset: float = 0.0, image_offset=(0.0, 0.0),
                      chunk: int = 256):
    """Depth-tested 3-D circles (rasterizeCircles, rasterizer.h:278):
    centers projected to screen, world `radius` fore-shortened by depth
    (r_px = r·f/z). Outline and/or fill, each optional.
    → (z_buffer, rgb_buffer)."""
    if line_color is None and fill_color is None:
        raise ValueError("need line_color and/or fill_color")
    c = jnp.asarray(positions_world, jnp.float32).reshape(-1, 3)
    uvz, _ = camera.project(c)
    z, rgb = _buffers(z_buffer, rgb_buffer, width, height)
    px, py = _grid(width, height, image_offset)
    f = 0.5 * (float(camera.intrinsics.fx) + float(camera.intrinsics.fy))
    half = 0.5 * max(line_thickness, 1.0)

    for s0 in range(0, uvz.shape[0], chunk):
        cc = uvz[s0:s0 + chunk]  # (C, 3)
        ok = cc[:, 2] > near_clip
        safe_z = jnp.maximum(cc[:, 2], near_clip)
        r_px = radius * f / safe_z  # (C,)
        dist = jnp.sqrt((px[None] - cc[:, 0, None, None]) ** 2
                        + (py[None] - cc[:, 1, None, None]) ** 2)
        depth = cc[:, 2, None, None] + depth_offset
        base = ok[:, None, None] & (depth > 0)
        if fill_color is not None:
            cover = base & (dist <= r_px[:, None, None])
            z, rgb = _composite_min_depth(
                z, rgb, jnp.where(cover, depth, jnp.inf),
                jnp.broadcast_to(jnp.asarray(fill_color, jnp.float32),
                                 (cc.shape[0], 3)))
        if line_color is not None:
            ring = base & (jnp.abs(dist - r_px[:, None, None]) <= half)
            # outline wins ties against its own fill
            z, rgb = _composite_min_depth(
                z, rgb, jnp.where(ring, depth - 1e-5, jnp.inf),
                jnp.broadcast_to(jnp.asarray(line_color, jnp.float32),
                                 (cc.shape[0], 3)))
    return z, rgb


def rasterize_splats(camera, positions_world, normals_world, width: int,
                     height: int, radius: float = 1.0,
                     front_material=None, back_material=None, lights=None,
                     z_buffer=None, rgb_buffer=None, near_clip: float = 1e-3,
                     depth_offset: float = 0.0, image_offset=(0.0, 0.0),
                     chunk: int = 128):
    """Oriented-disk splats (rasterizeSplats, rasterizer.h:475): each point
    becomes a world-space disk of `radius` facing its normal; per pixel the
    view ray is intersected with the disk plane and coverage tested against
    the radius, so splats tilt and fore-shorten correctly. Front/back facing
    disks shade with separate Phong materials (back normal flipped), lit in
    eye space (per-splat shading — the normal is constant across a disk).
    → (z_buffer, rgb_buffer)."""
    from momentum_tpu.math import skel_state as ss
    from momentum_tpu.rasterizer.materials import (
        PhongMaterial, default_lights, shade_phong_lights,
    )

    if front_material is None:
        front_material = PhongMaterial.create(diffuse_color=(0.8, 0.8, 0.8))
    if back_material is None:
        back_material = PhongMaterial.create(diffuse_color=(0.4, 0.4, 0.4))
    if lights is None:
        lights = default_lights(jnp.zeros(3))  # eye space: camera at origin

    p = jnp.asarray(positions_world, jnp.float32).reshape(-1, 3)
    n = jnp.asarray(normals_world, jnp.float32).reshape(-1, 3)
    c_eye = camera.world_to_eye(p)  # (S, 3)
    n_eye = ss.rotate_vectors(camera.eye_from_world, n)
    n_eye = n_eye / jnp.maximum(
        jnp.linalg.norm(n_eye, axis=-1, keepdims=True), 1e-12)

    z, rgb = _buffers(z_buffer, rgb_buffer, width, height)
    px, py = _grid(width, height, image_offset)
    # per-pixel eye-space view ray through z=1
    ray = camera.intrinsics.unproject(
        jnp.stack([px, py, jnp.ones_like(px)], axis=-1))  # (H, W, 3)

    for s0 in range(0, p.shape[0], chunk):
        ce = c_eye[s0:s0 + chunk]  # (S, 3)
        ne = n_eye[s0:s0 + chunk]
        ok = ce[:, 2] > near_clip
        # facing: ray toward splat vs normal
        facing = jnp.sum(ne * ce, axis=-1) < 0  # (S,) True = front
        n_shade = jnp.where(facing[:, None], ne, -ne)
        col_f = shade_phong_lights(ce, n_shade, jnp.zeros(3),
                                   front_material, lights)
        col_b = shade_phong_lights(ce, n_shade, jnp.zeros(3),
                                   back_material, lights)
        colors = jnp.where(facing[:, None], col_f, col_b)  # (S, 3)
        # ray-plane: t = n·c / n·d per pixel
        nd = jnp.einsum("hwi,si->shw", ray, ne)
        nc = jnp.sum(ne * ce, axis=-1)  # (S,)
        t = nc[:, None, None] / jnp.where(jnp.abs(nd) > 1e-9, nd, 1e-9)
        hit = ray[None] * t[..., None]  # (S, H, W, 3)
        inside = jnp.sum((hit - ce[:, None, None]) ** 2, axis=-1) \
            <= radius * radius
        depth = hit[..., 2] + depth_offset
        cover = inside & ok[:, None, None] & (depth > near_clip) & (t > 0)
        z, rgb = _composite_min_depth(
            z, rgb, jnp.where(cover, depth, jnp.inf), colors)
    return z, rgb
