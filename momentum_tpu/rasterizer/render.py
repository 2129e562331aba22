"""Software rasterizer — TPU-native z-buffer rendering.

Reference: momentum/rasterizer/ (~5.9k LoC DrJit SIMD scanline rasterizer
with Phong materials and shadow maps, rasterizer.h:10-50) used for RGBD-style
fitting and pymomentum.renderer. The TPU shape is completely different: no
scanlines, no per-triangle control flow — a `lax.scan` over static-size
triangle chunks, each chunk evaluating edge functions for ALL pixels × chunk
triangles as one dense tensor op and folding into a running z-buffer with
`argmin` selection. Everything is jittable and batchable over frames.

Outputs match what the fitting pipelines need: depth, face index, barycentric
coordinates, and shaded color; all intermediates are differentiable except
the discrete face selection (treated as constant, as in standard
differentiable-rendering practice).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["rasterize", "shade_lambert", "shade_phong", "render_mesh"]


def rasterize(verts_screen, faces, width: int, height: int, chunk: int = 64):
    """Z-buffer rasterization.

    verts_screen: (V, 3) — x, y in pixel coordinates, z = depth (smaller =
    closer, only z > 0 drawn). faces: (F, 3) int32.
    Returns dict with:
      depth (H, W) — inf where empty
      face  (H, W) int32 — -1 where empty
      bary  (H, W, 3)
    """
    f_count = faces.shape[0]
    pad = (-f_count) % chunk
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    valid_face = jnp.arange(f_count + pad) < f_count
    n_chunks = (f_count + pad) // chunk

    xs = jnp.arange(width, dtype=verts_screen.dtype) + 0.5
    ys = jnp.arange(height, dtype=verts_screen.dtype) + 0.5
    px, py = jnp.meshgrid(xs, ys)  # (H, W)

    tri = jnp.take(verts_screen, faces, axis=0)  # (F', 3, 3)
    tri = tri.reshape(n_chunks, chunk, 3, 3)
    valid_face = valid_face.reshape(n_chunks, chunk)
    face_ids = jnp.arange(f_count + pad, dtype=jnp.int32).reshape(n_chunks, chunk)

    big = jnp.asarray(jnp.inf, verts_screen.dtype)

    def body(carry, inp):
        depth, face, bary = carry
        t, vmask, fid = inp  # (chunk, 3, 3), (chunk,), (chunk,)
        ax, ay = t[:, 0, 0], t[:, 0, 1]
        bx, by = t[:, 1, 0], t[:, 1, 1]
        cx, cy = t[:, 2, 0], t[:, 2, 1]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)  # (chunk,)
        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)

        # edge functions for all pixels × chunk triangles: (H, W, chunk)
        w0 = ((bx - px[..., None]) * (cy - py[..., None])
              - (by - py[..., None]) * (cx - px[..., None])) * inv_area
        w1 = ((cx - px[..., None]) * (ay - py[..., None])
              - (cy - py[..., None]) * (ax - px[..., None])) * inv_area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area) > 1e-12)[None, None]
        z = w0 * t[:, 0, 2] + w1 * t[:, 1, 2] + w2 * t[:, 2, 2]
        ok = inside & (z > 0) & vmask[None, None]
        z = jnp.where(ok, z, big)

        k = jnp.argmin(z, axis=-1)  # (H, W)
        zbest = jnp.take_along_axis(z, k[..., None], axis=-1)[..., 0]
        better = zbest < depth
        take = lambda a: jnp.take_along_axis(a, k[..., None], axis=-1)[..., 0]
        depth = jnp.where(better, zbest, depth)
        face = jnp.where(better, fid[k], face)
        bary_new = jnp.stack([take(w0), take(w1), take(w2)], axis=-1)
        bary = jnp.where(better[..., None], bary_new, bary)
        return (depth, face, bary), None

    init = (
        jnp.full((height, width), big),
        jnp.full((height, width), -1, jnp.int32),
        jnp.zeros((height, width, 3), verts_screen.dtype),
    )
    (depth, face, bary), _ = jax.lax.scan(body, init, (tri, valid_face, face_ids))
    return dict(depth=depth, face=face, bary=bary)


def shade_lambert(normals, light_dir, albedo=(0.8, 0.8, 0.8), ambient=0.15):
    l = light_dir / jnp.linalg.norm(light_dir)
    lam = jnp.maximum(jnp.einsum("...i,i->...", normals, -l), 0.0)
    return jnp.asarray(albedo) * (ambient + (1 - ambient) * lam[..., None])


def shade_phong(normals, view_dir, light_dir, albedo=(0.8, 0.8, 0.8),
                specular=0.3, shininess=16.0, ambient=0.15):
    """Phong shading (rasterizer Phong materials equivalent)."""
    l = light_dir / jnp.linalg.norm(light_dir)
    v = view_dir / jnp.linalg.norm(view_dir)
    lam = jnp.maximum(jnp.einsum("...i,i->...", normals, -l), 0.0)
    r = 2.0 * jnp.einsum("...i,i->...", normals, -l)[..., None] * normals + l
    spec = jnp.maximum(jnp.einsum("...i,i->...", r, -v), 0.0) ** shininess
    col = jnp.asarray(albedo) * (ambient + (1 - ambient) * lam[..., None])
    return col + specular * spec[..., None]


def render_mesh(camera, vertices, faces, width: int, height: int,
                vertex_normals=None, light_dir=(0.3, -0.7, 0.6), chunk: int = 64):
    """Project + rasterize + Lambert-shade a mesh through a Camera.

    Returns dict with color (H, W, 3), depth, face, bary, mask.
    """
    from momentum_tpu.character.skinning import update_normals

    uvz, valid = camera.project(vertices)
    # points behind the camera: push far away so they never win the z-test
    screen = jnp.where(valid[..., None], uvz, jnp.asarray([0.0, 0.0, -1.0]))
    buf = rasterize(screen, faces, width, height, chunk)

    if vertex_normals is None:
        vertex_normals = update_normals(vertices, faces)
    face_n = (jnp.take(vertex_normals, faces[:, 0], axis=0)
              + jnp.take(vertex_normals, faces[:, 1], axis=0)
              + jnp.take(vertex_normals, faces[:, 2], axis=0))
    face_n = face_n / jnp.maximum(
        jnp.linalg.norm(face_n, axis=-1, keepdims=True), 1e-12)
    fid = jnp.maximum(buf["face"], 0)
    n_pix = jnp.take(face_n, fid, axis=0)
    color = shade_lambert(n_pix, jnp.asarray(light_dir, vertices.dtype))
    mask = buf["face"] >= 0
    color = jnp.where(mask[..., None], color, 0.0)
    return dict(color=color, mask=mask, **buf)


def interpolate_attribute(buf, faces, vertex_attr):
    """Per-pixel barycentric interpolation of a per-vertex attribute
    (texcoords, colors, normals) over a rasterization buffer."""
    fid = jnp.maximum(buf["face"], 0)
    tri = jnp.take(faces, fid, axis=0)  # (H, W, 3)
    attr = jnp.take(vertex_attr, tri, axis=0)  # (H, W, 3, K)
    out = jnp.einsum("hwc,hwck->hwk", buf["bary"], attr)
    return jnp.where(buf["face"][..., None] >= 0, out, 0.0)


def sample_texture(texture, uv):
    """Bilinear texture lookup (rasterizer texture sampling equivalent).
    texture (Th, Tw, C); uv (..., 2) in [0, 1] with v up."""
    th, tw = texture.shape[:2]
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (tw - 1)
    y = (1.0 - jnp.clip(uv[..., 1], 0.0, 1.0)) * (th - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, tw - 1)
    y1 = jnp.minimum(y0 + 1, th - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    c00 = texture[y0, x0]
    c01 = texture[y0, x1]
    c10 = texture[y1, x0]
    c11 = texture[y1, x1]
    return ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
            + (c10 * (1 - fx) + c11 * fx) * fy)


def render_mesh_textured(camera, vertices, faces, texcoords, texture,
                         width: int, height: int, light_dir=(0.3, -0.7, 0.6),
                         chunk: int = 64):
    """Textured + Lambert-lit render (texture path of the reference
    rasterizer)."""
    out = render_mesh(camera, vertices, faces, width, height,
                      light_dir=light_dir, chunk=chunk)
    uv = interpolate_attribute(out, faces, texcoords)
    albedo = sample_texture(texture, uv)
    # reuse the Lambert term stored in out["color"] (grey albedo 0.8)
    shade = out["color"][..., :1] / 0.8
    color = jnp.where(out["mask"][..., None], albedo * shade, 0.0)
    out["color"] = color
    return out


def _light_basis(light_dir):
    """Orthonormal frame whose +z looks ALONG the light direction."""
    z = light_dir / jnp.linalg.norm(light_dir)
    up = jnp.where(jnp.abs(z[1]) < 0.9, jnp.asarray([0.0, 1.0, 0.0]),
                   jnp.asarray([1.0, 0.0, 0.0]))
    x = jnp.cross(up, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z])  # (3, 3) rows


def render_shadow_map(vertices, faces, light_dir, resolution: int = 256,
                      chunk: int = 64):
    """Orthographic depth map from the light's point of view (the shadow-map
    pass of the reference rasterizer). Returns (depth (R, R), to_light fn)
    where to_light maps world points → (u, v, z) in shadow-map coordinates."""
    basis = _light_basis(jnp.asarray(light_dir, vertices.dtype))
    local = vertices @ basis.T  # x, y across the beam; z along the light
    lo = jnp.min(local, axis=0)
    hi = jnp.max(local, axis=0)
    span = jnp.maximum(hi[:2] - lo[:2], 1e-6)
    scale = (resolution - 1) / span
    # z shifted positive (rasterize draws z > 0 only)
    z0 = lo[2] - 1.0

    def to_light(points):
        l = points @ basis.T
        uv = (l[..., :2] - lo[:2]) * scale
        return jnp.concatenate([uv, (l[..., 2:] - z0)], axis=-1)

    buf = rasterize(to_light(vertices), faces, resolution, resolution, chunk)
    return buf["depth"], to_light


def shadow_factor(shadow_depth, light_uvz, bias: float = 5e-2):
    """1.0 where lit, 0.0 where occluded, from a shadow-map lookup."""
    res = shadow_depth.shape[0]
    u = jnp.clip(jnp.round(light_uvz[..., 0]).astype(jnp.int32), 0, res - 1)
    v = jnp.clip(jnp.round(light_uvz[..., 1]).astype(jnp.int32), 0, res - 1)
    occluder = shadow_depth[v, u]
    return jnp.where(light_uvz[..., 2] <= occluder + bias, 1.0, 0.0)


def render_mesh_shadowed(camera, vertices, faces, width: int, height: int,
                         light_dir=(0.3, -0.7, 0.6), shadow_resolution: int = 256,
                         shadow_bias: float = 5e-2, chunk: int = 64):
    """Lambert render with shadow mapping (rasterizer.h shadow maps): a depth
    pass from the light, then per-pixel occlusion tests on reconstructed
    world positions."""
    light = jnp.asarray(light_dir, vertices.dtype)
    out = render_mesh(camera, vertices, faces, width, height,
                      light_dir=light_dir, chunk=chunk)
    sdepth, to_light = render_shadow_map(vertices, faces, light,
                                         shadow_resolution, chunk)
    world = interpolate_attribute(out, faces, vertices)  # (H, W, 3)
    lit = shadow_factor(sdepth, to_light(world), shadow_bias)
    lit = jnp.where(out["mask"], lit, 0.0)
    ambient = 0.15
    # scale the diffuse part by the shadow factor (ambient stays)
    color = out["color"] * (ambient + (1 - ambient) * lit[..., None])
    out["color"] = jnp.where(out["mask"][..., None], color, 0.0)
    out["shadow"] = lit
    return out
