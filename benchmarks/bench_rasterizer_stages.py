"""Per-stage rasterizer timing (VERDICT r3 item #3).

Config-7 (bench_suite.py) renders a posed full-body skinned mesh (612 faces)
shadowed at 1280x960 (2x SS of 640x480) at 6.5 fps vs the reference's ~45 fps
CPU number. This script times each pipeline stage separately on the real chip
so the bottleneck is measured, not guessed:

  skin      FK + linear-blend skinning
  project   camera projection of 612 vertices
  raster    rasterize_windowed at 1280x960 (the main visibility pass)
  raster0   same with big_capacity=0 (isolates the dense big-face pass)
  scatter   JUST the packed int32 scatter-min at the same shapes
  exact     JUST the per-pixel exact recompute (gather + edge functions)
  shadow    the 256x256 shadow-map pass
  shade     interpolation + shadow lookup + Lambert + AA downsample
  e2e       the full render_mesh_shadowed frame

Timing: pipelined (N dispatches + one terminal host sync) per the
BENCHMARKS.md methodology; the tunnel RTT amortizes.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import jax
import jax.numpy as jnp

from momentum_tpu.character.skinning import skin_points
from momentum_tpu.rasterizer import render_mesh_shadowed
from momentum_tpu.rasterizer.render import (
    _auto_window, interpolate_attribute, rasterize_windowed, render_mesh,
    render_shadow_map, shadow_factor)
from momentum_tpu.rasterizer.utils import create_camera_for_body
from momentum_tpu.testing.fixtures import create_fullbody_character


def timeit(fn, *args, reps=10):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    char = create_fullbody_character().with_inverse_bind_pose()
    p = char.num_model_parameters
    rng = np.random.default_rng(0)
    theta = jnp.asarray(0.02 * rng.normal(0, 1, (p,)), jnp.float32)
    states = char.skeleton_states(theta)
    cam = create_camera_for_body(char, states[None], 960, 1280)
    W, H = 1280, 960
    faces = char.mesh.faces
    F = faces.shape[0]
    light = jnp.asarray((0.3, -0.7, 0.6), jnp.float32)

    rows = []

    def rec(name, ms, note=""):
        rows.append((name, ms, note))
        print(f"{name:10s} {ms:8.2f} ms  {note}", flush=True)

    # --- skin + project ---------------------------------------------------
    @jax.jit
    def do_skin(theta):
        st = char.skeleton_states(theta)
        return skin_points(char.skin_weights, st, char.inverse_bind_pose,
                           char.mesh.vertices)

    ms, verts = timeit(do_skin, theta)
    rec("skin", ms, f"{char.mesh.vertices.shape[0]} verts")

    @jax.jit
    def do_project(verts):
        uvz, valid = cam.project(verts)
        return jnp.where(valid[..., None], uvz, jnp.asarray([0.0, 0.0, -1.0]))

    ms, screen = timeit(do_project, verts)
    rec("project", ms)

    # --- main visibility pass --------------------------------------------
    win = _auto_window(F, W, H)

    @jax.jit
    def do_raster(screen):
        return rasterize_windowed(screen, faces, W, H, window=win,
                                  big_capacity=16)

    ms, buf = timeit(do_raster, screen)
    rec("raster", ms, f"window={win}, cap=16")

    @jax.jit
    def do_raster0(screen):
        return rasterize_windowed(screen, faces, W, H, window=win,
                                  big_capacity=0)

    ms, _ = timeit(do_raster0, screen)
    rec("raster0", ms, "big_capacity=0")

    # --- Pallas plane kernel at the same shape -----------------------------
    from momentum_tpu.ops.raster_pallas import (
        raster_pallas_available, rasterize_planes)
    if raster_pallas_available():
        @jax.jit
        def do_planes(screen):
            return rasterize_planes(screen, faces, W, H, want_bary=True)

        ms, _ = timeit(do_planes, screen)
        rec("planes", ms, "pallas visibility+bary")

        @jax.jit
        def do_planes_fused(screen, verts):
            return rasterize_planes(screen, faces, W, H, want_bary=False,
                                    vertex_attrs=verts)

        ms, _ = timeit(do_planes_fused, screen, verts)
        rec("planesF", ms, "pallas + fused world-pos attrs")

    # --- scatter-min microbench at the same shapes ------------------------
    npix = H * W
    K = win
    rng2 = np.random.default_rng(1)
    flat_idx = jnp.asarray(
        rng2.integers(0, npix - K * W - K, (F,)), jnp.int32)
    ii = jnp.arange(K, dtype=jnp.int32)
    flat = (flat_idx[:, None, None] + ii[:, None] * W + ii[None, :]).reshape(-1)
    packed0 = jnp.asarray(
        rng2.integers(0, 2**30, (F * K * K,)), jnp.int32)

    @jax.jit
    def do_scatter(packed):
        return jnp.full((npix,), np.int32(2**31 - 1),
                        jnp.int32).at[flat].min(packed)

    ms, _ = timeit(do_scatter, packed0)
    rec("scatter", ms, f"{F * K * K / 1e6:.1f}M updates -> {npix / 1e6:.1f}M px")

    # --- exact recompute microbench ---------------------------------------
    tri = jnp.take(screen, faces, axis=0)
    fid_map = jnp.asarray(rng2.integers(0, F, (H, W)), jnp.int32)

    @jax.jit
    def do_exact(fid_map):
        t = jnp.take(tri, fid_map, axis=0)
        xs = jnp.arange(W, dtype=jnp.float32) + 0.5
        ys = jnp.arange(H, dtype=jnp.float32) + 0.5
        gx, gy = jnp.meshgrid(xs, ys)
        ax, ay = t[..., 0, 0], t[..., 0, 1]
        bx, by = t[..., 1, 0], t[..., 1, 1]
        cx, cy = t[..., 2, 0], t[..., 2, 1]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        inv = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        w0 = ((bx - gx) * (cy - gy) - (by - gy) * (cx - gx)) * inv
        w1 = ((cx - gx) * (ay - gy) - (cy - gy) * (ax - gx)) * inv
        w2 = 1.0 - w0 - w1
        zz = w0 * t[..., 0, 2] + w1 * t[..., 1, 2] + w2 * t[..., 2, 2]
        return w0, w1, w2, zz

    ms, _ = timeit(do_exact, fid_map)
    rec("exact", ms, "per-pixel tri gather + edge fns")

    # --- shadow map --------------------------------------------------------
    @jax.jit
    def do_shadow(verts):
        d, _ = render_shadow_map(verts, faces, light, 256)
        return d

    ms, _ = timeit(do_shadow, verts)
    rec("shadow", ms, "256x256")

    # --- shading + AA ------------------------------------------------------
    sdepth, to_light = render_shadow_map(verts, faces, light, 256)

    @jax.jit
    def do_shade(buf, verts, sdepth):
        world = interpolate_attribute(buf, faces, verts)
        lit = shadow_factor(sdepth, to_light(world))
        from momentum_tpu.character.skinning import update_normals
        vn = update_normals(verts, faces)
        fn_ = (jnp.take(vn, faces[:, 0], axis=0)
               + jnp.take(vn, faces[:, 1], axis=0)
               + jnp.take(vn, faces[:, 2], axis=0))
        fn_ = fn_ / jnp.maximum(jnp.linalg.norm(fn_, axis=-1, keepdims=True),
                                1e-12)
        n_pix = jnp.take(fn_, jnp.maximum(buf["face"], 0), axis=0)
        from momentum_tpu.rasterizer.render import shade_lambert
        color = shade_lambert(n_pix, light)
        mask = buf["face"] >= 0
        color = jnp.where(mask[..., None], color, 0.0)
        color = color * (0.15 + 0.85 * jnp.where(mask, lit, 0.0)[..., None])
        return color.reshape(480, 2, 640, 2, 3).mean(axis=(1, 3))

    ms, _ = timeit(do_shade, buf, verts, sdepth)
    rec("shade", ms, "interp + shadow lookup + lambert + AA")

    # --- end-to-end one frame ----------------------------------------------
    @jax.jit
    def do_e2e(theta):
        st = char.skeleton_states(theta)
        verts = skin_points(char.skin_weights, st, char.inverse_bind_pose,
                            char.mesh.vertices)
        out = render_mesh_shadowed(cam, verts, faces, W, H)
        return out["color"].reshape(480, 2, 640, 2, 3).mean(axis=(1, 3))

    ms, _ = timeit(do_e2e, theta)
    rec("e2e", ms, f"-> {1000.0 / ms:.1f} fps single-frame")

    total = sum(m for n, m, _ in rows if n in
                ("skin", "project", "raster", "shadow", "shade"))
    print(f"\nsum of stages {total:.2f} ms vs e2e {rows[-1][1]:.2f} ms")


if __name__ == "__main__":
    main()
