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

__all__ = ["rasterize", "rasterize_windowed", "shade_lambert",
           "shade_phong", "render_mesh"]


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


def rasterize_windowed(verts_screen, faces, width: int, height: int,
                       window: int = 32, big_capacity: int = 64):
    """Z-buffer rasterization in per-face pixel windows — the HBM-lean path.

    The dense formulation above evaluates every face against every pixel
    (O(H·W·F) HBM traffic: at 1280×960×5k faces that is ~10s of GB per
    frame). Real meshes cover a tiny fraction of that product, so this path
    rasterizes each face only inside a `window`×`window` pixel block around
    its screen bbox and resolves visibility with a single deterministic
    scatter-min of packed (quantized-depth | face-id) int32 keys — the
    TPU-native equivalent of the reference's binned scanline traversal
    (momentum/rasterizer/rasterizer.h walks only covered spans). Faces whose
    bbox exceeds the window (ground planes, close-ups) are routed to ONE
    dense pass over the `big_capacity` largest faces. Exact f32 depth and
    barycentrics are recomputed per winning pixel afterward, so quantization
    only affects tie-breaking between faces closer than ~range/2^zbits.

    Cost: O(F·window² + H·W·big_capacity) vs O(H·W·F). Deterministic
    (scatter-min of unique keys is order-free).
    """
    import numpy as np

    # a window wider than the image would let px_i/py_i escape the row and
    # wrap into the next one through the flat scatter index
    window = max(min(window, width, height), 1)
    f_count = faces.shape[0]
    dt = verts_screen.dtype
    npix = height * width
    fid_bits = max(1, int(np.ceil(np.log2(f_count + 1))))
    # cap depth bits at 23 so every quantized level is exactly representable
    # in f32 (mantissa): otherwise the clip bound itself rounds UP past
    # 2^zq_bits and the shift overflows int32 into a negative key that wins
    # every min
    zq_bits = min(31 - fid_bits, 23)
    if zq_bits < 12:
        raise ValueError(f"too many faces for packed scatter ({f_count})")
    zq_max = (1 << zq_bits) - 1
    int_max = jnp.iinfo(jnp.int32).max
    big = jnp.asarray(jnp.inf, dt)

    tri = jnp.take(verts_screen, faces, axis=0)  # (F, 3, 3)
    x, y = tri[..., 0], tri[..., 1]
    xmin, xmax = jnp.min(x, axis=1), jnp.max(x, axis=1)
    ymin, ymax = jnp.min(y, axis=1), jnp.max(y, axis=1)
    inside_img = (xmax >= 0) & (xmin <= width) & (ymax >= 0) & (ymin <= height)
    extent = jnp.maximum(xmax - xmin, ymax - ymin)
    small = inside_img & (extent <= window - 1)

    ox = jnp.clip(jnp.floor(xmin - 0.5), 0, max(width - window, 0)).astype(jnp.int32)
    oy = jnp.clip(jnp.floor(ymin - 0.5), 0, max(height - window, 0)).astype(jnp.int32)
    ii = jnp.arange(window, dtype=jnp.int32)
    py_i = oy[:, None, None] + ii[None, :, None]   # (F, K, 1)
    px_i = ox[:, None, None] + ii[None, None, :]   # (F, 1, K)
    py = py_i.astype(dt) + 0.5
    px = px_i.astype(dt) + 0.5

    ax, ay = tri[:, 0, 0, None, None], tri[:, 0, 1, None, None]
    bx, by = tri[:, 1, 0, None, None], tri[:, 1, 1, None, None]
    cx, cy = tri[:, 2, 0, None, None], tri[:, 2, 1, None, None]
    area = ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))  # (F, 1, 1)
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    w0 = ((bx - px) * (cy - py) - (by - py) * (cx - px)) * inv_area
    w1 = ((cx - px) * (ay - py) - (cy - py) * (ax - px)) * inv_area
    w2 = 1.0 - w0 - w1
    z = (w0 * tri[:, 0, 2, None, None] + w1 * tri[:, 1, 2, None, None]
         + w2 * tri[:, 2, 2, None, None])
    ok = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (z > 0)
          & (jnp.abs(area) > 1e-12) & small[:, None, None])

    # depth quantization over the face-vertex z range (only z > 0 matter)
    zpos = jnp.where(tri[..., 2] > 0, tri[..., 2], big)
    zmin = jnp.minimum(jnp.min(zpos), big - 1)
    zneg = jnp.where(tri[..., 2] > 0, tri[..., 2], -big)
    zmax = jnp.max(zneg)
    zrange = jnp.maximum(zmax - zmin, 1e-6)
    # mask non-drawn lanes BEFORE the float→int cast (inf/NaN conversion is
    # implementation-defined); zq_max ≤ 2^23-1 is f32-exact so the clip is
    # tight
    zf = jnp.where(ok, (z - zmin) / zrange * zq_max, 0.0)
    zq = jnp.clip(zf, 0, zq_max).astype(jnp.int32)
    fids = jnp.arange(f_count, dtype=jnp.int32)[:, None, None]
    packed = jnp.where(ok, (zq << fid_bits) | fids, int_max)
    flat = (py_i * width + px_i).reshape(-1)
    zbuf = jnp.full((npix,), int_max, jnp.int32).at[flat].min(packed.reshape(-1))
    zbuf = zbuf.reshape(height, width)
    hit_w = zbuf != int_max
    fid_w = jnp.where(hit_w, zbuf & ((1 << fid_bits) - 1), 0)

    # exact per-pixel recompute for the windowed winners
    xs = jnp.arange(width, dtype=dt) + 0.5
    ys = jnp.arange(height, dtype=dt) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)

    def _exact(fid_map):
        t = jnp.take(tri, fid_map, axis=0)  # (H, W, 3, 3)
        ax, ay = t[..., 0, 0], t[..., 0, 1]
        bx, by = t[..., 1, 0], t[..., 1, 1]
        cx, cy = t[..., 2, 0], t[..., 2, 1]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        inv = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        w0 = ((bx - gx) * (cy - gy) - (by - gy) * (cx - gx)) * inv
        w1 = ((cx - gx) * (ay - gy) - (cy - gy) * (ax - gx)) * inv
        w2 = 1.0 - w0 - w1
        zz = w0 * t[..., 0, 2] + w1 * t[..., 1, 2] + w2 * t[..., 2, 2]
        return jnp.stack([w0, w1, w2], axis=-1), zz

    bary_w, z_w = _exact(fid_w)
    z_w = jnp.where(hit_w, z_w, big)

    depth, face, bary = z_w, jnp.where(hit_w, fid_w, -1), bary_w

    if big_capacity > 0 and f_count > 0:
        cap = min(big_capacity, f_count)
        score = jnp.where(inside_img & ~small, extent, -big)
        _, bidx = jax.lax.top_k(score, cap)
        bt = jnp.take(tri, bidx, axis=0)  # (cap, 3, 3)
        bvalid = jnp.take(score, bidx) > -big
        ax, ay = bt[:, 0, 0], bt[:, 0, 1]
        bx, by = bt[:, 1, 0], bt[:, 1, 1]
        cx, cy = bt[:, 2, 0], bt[:, 2, 1]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        inv = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        w0 = ((bx - gx[..., None]) * (cy - gy[..., None])
              - (by - gy[..., None]) * (cx - gx[..., None])) * inv
        w1 = ((cx - gx[..., None]) * (ay - gy[..., None])
              - (cy - gy[..., None]) * (ax - gx[..., None])) * inv
        w2 = 1.0 - w0 - w1
        zb = w0 * bt[:, 0, 2] + w1 * bt[:, 1, 2] + w2 * bt[:, 2, 2]
        okb = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (zb > 0)
               & (jnp.abs(area) > 1e-12)[None, None] & bvalid[None, None])
        zb = jnp.where(okb, zb, big)
        k = jnp.argmin(zb, axis=-1)
        take = lambda a: jnp.take_along_axis(a, k[..., None], axis=-1)[..., 0]
        zbest = take(zb)
        better = zbest < depth
        depth = jnp.where(better, zbest, depth)
        face = jnp.where(better, jnp.take(bidx, k), face)
        bary_b = jnp.stack([take(w0), take(w1), take(w2)], axis=-1)
        bary = jnp.where(better[..., None], bary_b, bary)

    empty = face < 0
    return dict(depth=jnp.where(empty, big, depth), face=face,
                bary=jnp.where(empty[..., None], 0.0, bary))


def _auto_window(f_count: int, width: int, height: int) -> int:
    """Pick the per-face window size from trace-time statics.

    Two costs trade off: the windowed pass is O(F·K²) and the dense
    overflow pass is O(H·W·big_capacity) PER FRAME whether or not any face
    lands in it. Since F, H, W are static at trace time, size K so the
    windowed pass stays within ~4 full-image-equivalents of work while
    being as wide as possible — wide windows mean typical meshes (whose
    p99 screen extent is tens of pixels) overflow ZERO faces into the
    dense pass, which is where the round-3 profile showed ~80% of the
    frame time going at the reference-benchmark shape (612 faces,
    1280×960: K=32/cap=64 spent H·W·64 dense lanes on an empty set)."""
    import numpy as np

    budget = 4 * width * height
    k = np.sqrt(max(budget // max(f_count, 1), 64))
    k = 1 << int(np.floor(np.log2(k)))
    return int(np.clip(k, 8, 128))


def _rasterize_dispatch(verts_screen, faces, width: int, height: int,
                        chunk: int = 64, method: str = "auto",
                        window=None, big_capacity: int = 16,
                        vertex_attrs=None, face_attrs=None):
    """auto → the Pallas plane kernel on TPU (ops/raster_pallas.py: whole
    (pixel-tile, faces) visibility in VMEM, no scatter/gather), windowed for
    large images on other backends (the dense path's HBM traffic grows with
    H·W·F), dense for small buffers where one fused pass wins. The window
    defaults to `_auto_window`'s static-cost heuristic. vertex_attrs /
    face_attrs are fused into the kernel on the planes path and ignored
    otherwise (callers interpolate separately)."""
    from momentum_tpu.ops.raster_pallas import (
        raster_pallas_available, rasterize_planes)

    if method == "auto":
        if raster_pallas_available():
            method = "planes"
        else:
            method = "windowed" if width * height >= 64 * 64 else "dense"
    if method == "planes":
        return rasterize_planes(verts_screen, faces, width, height,
                                vertex_attrs=vertex_attrs,
                                face_attrs=face_attrs)
    if method in ("windowed", "window"):
        if window is None:
            window = _auto_window(faces.shape[0], width, height)
        return rasterize_windowed(verts_screen, faces, width, height,
                                  window=window, big_capacity=big_capacity)
    return rasterize(verts_screen, faces, width, height, chunk)


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
                vertex_normals=None, light_dir=(0.3, -0.7, 0.6), chunk: int = 64,
                method: str = "auto", extra_vertex_attrs=None):
    """Project + rasterize + Lambert-shade a mesh through a Camera.

    Returns dict with color (H, W, 3), depth, face, bary, mask. If
    `extra_vertex_attrs` (V, C) is given, its barycentric interpolation is
    returned under "extra" (H, W, C) — fused into the Pallas kernel on the
    planes path, an `interpolate_attribute` pass otherwise.

    Shading is flat (per-face normal), so on the planes path the Lambert
    color is computed once per FACE (F × a few flops) and emitted through
    the kernel's constant-attribute planes instead of per pixel — the
    shading stage drops from O(H·W) gathers+math to O(F).
    """
    from momentum_tpu.character.skinning import update_normals
    from momentum_tpu.ops.raster_pallas import raster_pallas_available

    uvz, valid = camera.project(vertices)
    # points behind the camera: push far away so they never win the z-test
    screen = jnp.where(valid[..., None], uvz, jnp.asarray([0.0, 0.0, -1.0]))

    if vertex_normals is None:
        vertex_normals = update_normals(vertices, faces)
    face_n = (jnp.take(vertex_normals, faces[:, 0], axis=0)
              + jnp.take(vertex_normals, faces[:, 1], axis=0)
              + jnp.take(vertex_normals, faces[:, 2], axis=0))
    face_n = face_n / jnp.maximum(
        jnp.linalg.norm(face_n, axis=-1, keepdims=True), 1e-12)
    light = jnp.asarray(light_dir, vertices.dtype)

    use_planes = method == "planes" or (
        method == "auto" and raster_pallas_available())
    if use_planes:
        face_color = shade_lambert(face_n, light)  # (F, 3) flat shading
        buf = _rasterize_dispatch(screen, faces, width, height, chunk,
                                  "planes", vertex_attrs=extra_vertex_attrs,
                                  face_attrs=face_color)
        attrs = buf.pop("attrs")
        ca = (0 if extra_vertex_attrs is None
              else extra_vertex_attrs.shape[-1])
        mask = buf["face"] >= 0
        color = jnp.where(mask[..., None], attrs[..., ca:ca + 3], 0.0)
        out = dict(color=color, mask=mask, **buf)
        if ca:
            out["extra"] = attrs[..., :ca]
        return out

    buf = _rasterize_dispatch(screen, faces, width, height, chunk, method)
    fid = jnp.maximum(buf["face"], 0)
    n_pix = jnp.take(face_n, fid, axis=0)
    color = shade_lambert(n_pix, light)
    mask = buf["face"] >= 0
    color = jnp.where(mask[..., None], color, 0.0)
    out = dict(color=color, mask=mask, **buf)
    if extra_vertex_attrs is not None:
        out["extra"] = interpolate_attribute(buf, faces, extra_vertex_attrs)
    return out


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
                         chunk: int = 64, method: str = "auto"):
    """Textured + Lambert-lit render (texture path of the reference
    rasterizer)."""
    out = render_mesh(camera, vertices, faces, width, height,
                      light_dir=light_dir, chunk=chunk, method=method)
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
                      chunk: int = 64, method: str = "auto"):
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

    buf = _rasterize_dispatch(to_light(vertices), faces, resolution,
                              resolution, chunk, method)
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
                         shadow_bias: float = 5e-2, chunk: int = 64,
                         method: str = "auto"):
    """Lambert render with shadow mapping (rasterizer.h shadow maps): a depth
    pass from the light, then per-pixel occlusion tests on reconstructed
    world positions."""
    light = jnp.asarray(light_dir, vertices.dtype)
    out = render_mesh(camera, vertices, faces, width, height,
                      light_dir=light_dir, chunk=chunk, method=method,
                      extra_vertex_attrs=vertices)
    sdepth, to_light = render_shadow_map(vertices, faces, light,
                                         shadow_resolution, chunk,
                                         method=method)
    world = out.pop("extra")  # (H, W, 3) fused on the planes path
    lit = shadow_factor(sdepth, to_light(world), shadow_bias)
    lit = jnp.where(out["mask"], lit, 0.0)
    ambient = 0.15
    # scale the diffuse part by the shadow factor (ambient stays)
    color = out["color"] * (ambient + (1 - ambient) * lit[..., None])
    out["color"] = jnp.where(out["mask"][..., None], color, 0.0)
    out["shadow"] = lit
    return out
