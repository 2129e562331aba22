"""Pallas TPU kernel: plane-based z-buffer rasterization.

Reference capability: momentum/rasterizer/rasterizer.h (SIMD scanline
z-buffer with Phong/shadow shading, ~45 fps at 640x480 2xSS on an 8-core
CPU). The TPU shape is completely different: every triangle edge function
and the depth are AFFINE in screen space, w(x, y) = a*x + b*y + c, so
visibility for a tile of pixels against ALL faces is a dense broadcasted
FMA on (pixels, faces) tiles in VMEM followed by a lane min-reduction —
no scanlines, no scatter, no gather. Attribute interpolation rides the
same algebra: any screen-linear quantity (barycentrics, depth, world
position, per-face constants) is a per-face plane, and the winning face's
planes are fetched with a one-hot (pixels, faces) @ (faces, coefs) MXU
matmul instead of a per-pixel gather.

This replaces the round-3 windowed scatter-min path (render.py
rasterize_windowed) on TPU, whose profile was 113 ms of the 156 ms frame:
2.5M packed int32 scatter updates plus a dense big-face pass. The kernel
keeps the whole (tile_px, faces) working set in VMEM and writes only the
final per-pixel depth / face / barycentric / attribute images.

Grid: (H/th, W/128) pixel tiles; faces padded to a 128 multiple. The
kernels work on a FLAT (faces, th*128) faces-by-pixels layout: faces in
SUBLANES, pixels in LANES, so the visibility min is a sublane reduction
and the one-hot attribute matmul contracts the face axis on the MXU while
pixels ride the lanes end to end. Pixel coordinates are generated
directly in that flat layout from one (1, N) iota (x = col0 + n % 128,
y = row0 + n // 128) — Mosaic cannot shape-cast an (8, 128) register
block into flat form, and the transposed pixels-in-sublanes layout makes
every (N, 1) vector tile as T(8,128), wasting 128x VMEM (measured: the
same kernel OOMs the 16 MB scoped VMEM at shapes that fit in ~3 MB
lane-major). Outputs are written tile-flat ((gi, gj, 1, th*128) arrays)
and un-tiled into (H, W) images by one cheap XLA transpose after the
call.

For meshes with more faces than `bin_capacity`, a host-side XLA pass bins
faces into pixel tiles by bbox overlap (top_k keeps ids ascending so the
dense lowest-id tie-break is preserved) and the kernel evaluates only the
(K, N) gathered block per tile, falling back to a full chunked scan on
the rare overflow tile — the TPU analog of the reference's binned
scanline traversal. Measured at the 612-face/1280x960 body benchmark
shape: 5.8 ms visibility+bary (vs 16.6 ms unbinned, 113 ms windowed
scatter-min), full shadowed frame 21.8 ms = 45.9 fps — parity with the
reference's ~45 fps 8-core CPU number.

Numerics match render.rasterize (same >= 0 edge convention, z > 0 clip,
f32). Ties at equal depth resolve to the lowest face id (deterministic).
CPU/tests run the identical kernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = [
    "raster_pallas_available",
    "face_planes",
    "attr_planes_from_vertex",
    "attr_planes_from_face_const",
    "rasterize_planes",
]

_LANES = 128
_NOFACE = 1 << 30


def raster_pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _pad_axis(a, axis, mult, value):
    n = a.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=value)


def face_planes(verts_screen, faces, valid=None):
    """Per-face plane coefficients for the three barycentric edge functions
    and depth: returns (12, F) f32 rows [a0 b0 c0 a1 b1 c1 a2 b2 c2 az bz cz]
    with w_k(x, y) = a_k*x + b_k*y + c_k and z(x, y) = az*x + bz*y + cz.

    Derivation: w0 = ((bx-x)(cy-y) - (by-y)(cx-x)) / area expands to
    x*(by-cy)/area + y*(cx-bx)/area + (bx*cy-by*cx)/area; w1 analogous from
    the (c, a) edge; w2 = 1 - w0 - w1. Degenerate or masked-out faces get
    c0 = -BIG so they are outside every pixel.
    """
    tri = jnp.take(verts_screen, faces, axis=0)  # (F, 3, 3)
    ax, ay, az = tri[:, 0, 0], tri[:, 0, 1], tri[:, 0, 2]
    bx, by, bz = tri[:, 1, 0], tri[:, 1, 1], tri[:, 1, 2]
    cx, cy, cz = tri[:, 2, 0], tri[:, 2, 1], tri[:, 2, 2]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    ok = jnp.isfinite(area) & (jnp.abs(area) > 1e-12)
    # absurd screen coordinates (grazing projections divide by z ≈ 0) are
    # killed outright — same 1e7 limit as the binning's bbox cull, so the
    # binned and overflow-scan paths agree on the live face set
    lim = jnp.float32(1e7)
    for c in (ax, ay, bx, by, cx, cy):
        ok = ok & (jnp.abs(c) < lim)
    if valid is not None:
        ok = ok & valid
    inv = jnp.where(ok, 1.0 / jnp.where(ok, area, 1.0), 0.0)
    # EVERY row is where-guarded, not just c0: with grazing projections the
    # screen coords can be huge/inf, so (by − cy)·inv evaluates inf·0 = NaN
    # for killed faces — and the kernel's one-hot attribute matmul then
    # poisons whole pixel tiles with NaN·0 (matmuls, unlike selects, touch
    # every face column; the round-5 config-7 TPU capture rendered black).
    # Killed faces get a0 = b0 = 0, c0 = -1, so w0 < 0 at every pixel; a
    # -BIG sentinel would overflow to inf in the attribute plane tables.
    def g(v, fallback=0.0):
        return jnp.where(ok, jnp.where(jnp.isfinite(v), v, 0.0), fallback)

    a0 = g((by - cy) * inv)
    b0 = g((cx - bx) * inv)
    c0 = g((bx * cy - by * cx) * inv, -1.0)
    a1 = g((cy - ay) * inv)
    b1 = g((ax - cx) * inv)
    c1 = g((cx * ay - cy * ax) * inv)
    a2 = -a0 - a1
    b2 = -b0 - b1
    c2 = 1.0 - c0 - c1
    pz_a = g(a0 * az + a1 * bz + a2 * cz)
    pz_b = g(b0 * az + b1 * bz + b2 * cz)
    pz_c = g(c0 * az + c1 * bz + c2 * cz)
    return jnp.stack([a0, b0, c0, a1, b1, c1, a2, b2, c2,
                      pz_a, pz_b, pz_c]).astype(jnp.float32)


def attr_planes_from_vertex(planes, faces, vertex_attr):
    """Plane coefficients of a per-vertex attribute interpolated with the
    screen-space barycentrics: attr(x, y) = sum_k w_k(x, y) * attr[f_k].
    Returns (F, 3, C): per-face (a, b, c) rows per channel."""
    va = jnp.take(vertex_attr, faces, axis=0)  # (F, 3, C)
    p = planes.reshape(4, 3, -1)  # [w0|w1|w2|z][a|b|c][F]
    # coef_c(attr) = sum_k coef_c(w_k) * attr[f_k]
    return jnp.einsum("kcf,fkq->fcq", p[:3], va)


def attr_planes_from_face_const(num_faces, face_attr):
    """Plane coefficients of a per-face constant attribute (flat shading):
    a = b = 0, c = attr. Returns (F, 3, C)."""
    f, c = face_attr.shape
    zeros = jnp.zeros((f, 2, c), face_attr.dtype)
    return jnp.concatenate([zeros, face_attr[:, None, :]], axis=1)


def _pixel_coords(th, i, j):
    """Tile pixel coordinates in the pixels-in-LANES layout: (1, N) rows
    with n // 128 the tile-local row and n % 128 the column. Generated
    directly by one iota — Mosaic cannot shape-cast a (th, 128) register
    block into flat form, and the transposed (N, 1) layout wastes 128x
    VMEM (a (1024, 1) f32 vector tiles as 128 T(8,128) registers)."""
    npx = th * _LANES
    n = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    x = (j * _LANES + (n % _LANES)).astype(jnp.float32) + 0.5
    y = (i * th + (n // _LANES)).astype(jnp.float32) + 0.5
    return x, y


def _eval_chunk(x, y, pr, fid_vec, inf):
    """Shared visibility math for one (faces-block, pixels) tile: plane
    FMAs, inside tests, sublane min-reduction, lowest-global-id tie break.
    pr(k) -> (Kb, 1) plane row k; fid_vec (Kb, 1) int32 global face ids.
    Returns (zmin (1,N), fmin (1,N) global id or _NOFACE, oh (Kb,N) bool,
    w0, w1, w2)."""
    w0 = pr(0) * x + pr(1) * y + pr(2)
    w1 = pr(3) * x + pr(4) * y + pr(5)
    w2 = pr(6) * x + pr(7) * y + pr(8)
    z = pr(9) * x + pr(10) * y + pr(11)
    ok = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & (z > 0.0)
    zsel = jnp.where(ok, z, inf)
    zmin = jnp.min(zsel, axis=0, keepdims=True)  # (1, N)
    hit = (zsel == zmin) & ok
    fmin = jnp.min(jnp.where(hit, fid_vec, jnp.int32(_NOFACE)), axis=0,
                   keepdims=True)
    oh = (fid_vec == fmin) & hit
    return zmin, fmin, oh, w0, w1, w2


def _interp_attrs(oh, tab_t, x, y):
    """Winning-face attribute planes via one-hot MXU matmul: tab_t is the
    (3*Cp, Kb) transposed coefficient table; returns (Cp, N) values."""
    cp = tab_t.shape[0] // 3
    ohf = oh.astype(jnp.float32)
    abc = jax.lax.dot_general(tab_t, ohf, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return abc[:cp] * x + abc[cp:2 * cp] * y + abc[2 * cp:]


def _kernel(planes_ref, attr_ref, depth_ref, face_ref, bary_ref, attr_out_ref,
            *, th, n_attr, want_bary):
    x, y = _pixel_coords(th, pl.program_id(0), pl.program_id(1))
    fp = planes_ref.shape[0]
    fid_vec = jax.lax.broadcasted_iota(jnp.int32, (fp, 1), 0)
    pr = lambda k: planes_ref[:, k:k + 1]  # (Fp, 1)
    inf = jnp.float32(jnp.inf)
    zmin, fmin, oh, w0, w1, w2 = _eval_chunk(x, y, pr, fid_vec, inf)

    # lane-major tile-flat writes: out blocks are (1, 1, 1, N) /
    # (C, 1, 1, 1, N) — only leading unit axes added (layout-preserving)
    depth_ref[...] = zmin[None, None]
    face_ref[...] = jnp.where(fmin == _NOFACE, -1, fmin)[None, None]

    if want_bary:
        ohf = oh.astype(jnp.float32)
        for k, w in enumerate((w0, w1, w2)):
            bary_ref[k] = jnp.sum(ohf * w, axis=0, keepdims=True)[None, None]
    if n_attr:
        vals = _interp_attrs(oh, attr_ref[...], x, y)  # (Cp, N)
        for ch in range(n_attr):
            attr_out_ref[ch] = vals[ch:ch + 1][None, None]


def _kernel_binned(ovf_ref, tplanes_ref, tfids_ref, tattr_ref, planes_ref,
                   attr_ref, depth_ref, face_ref, bary_ref, attr_out_ref,
                   *, th, K, chunk, nc, n_attr, want_bary):
    """Tile-binned variant: one grid step per pixel tile; the host pass
    pre-gathered, per tile, the planes/ids/attribute rows of the <= K faces
    whose bboxes overlap it, so the kernel evaluates an (N, K) block instead
    of (N, F) — the TPU-shaped analog of the reference rasterizer's binned
    traversal (momentum/rasterizer/rasterizer.h covered-span walk): the
    culling decision runs once on the host side in XLA, the kernel stays
    branch-free and fully pipelined. Tiles whose face count overflows K
    (scalar-prefetched flag) fall back to a full chunked scan of the
    resident plane table, overwriting the binned result.

    Two rejected designs, measured slower than even the UNculled kernel at
    the 612-face/1280x960 body shape: face-chunk axis in the grid with
    revisiting accumulators (23 ms — 6000-step grid overhead), and an
    in-kernel fori_loop over y-sorted chunks with lax.cond skips (36 ms —
    serial loop kills the software pipeline; the camera frames the body so
    y-band culling rarely skips)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    npx = th * _LANES
    x, y = _pixel_coords(th, i, j)
    cp = attr_ref.shape[0] // 3
    inf = jnp.float32(jnp.inf)

    # binned pass: the <= K faces overlapping this tile
    fid_vec = tfids_ref[0]  # (K, 1)
    tp = tplanes_ref[0]     # (K, 12)
    pr = lambda k: tp[:, k:k + 1]
    zmin, fmin, oh, w0, w1, w2 = _eval_chunk(x, y, pr, fid_vec, inf)

    depth_ref[...] = zmin[None, None]
    face_ref[...] = jnp.where(fmin == _NOFACE, -1, fmin)[None, None]
    if want_bary:
        ohf = oh.astype(jnp.float32)
        for k, w in enumerate((w0, w1, w2)):
            bary_ref[k] = jnp.sum(ohf * w, axis=0, keepdims=True)[None, None]
    if n_attr:
        vals = _interp_attrs(oh, tattr_ref[0], x, y)  # (Cp, N)
        for ch in range(n_attr):
            attr_out_ref[ch] = vals[ch:ch + 1][None, None]

    @pl.when(ovf_ref[i, j] != 0)
    def _full_scan():
        def chunk_body(c, carry):
            depth, fid, b0, b1, b2, vals = carry
            sl = pl.ds(c * chunk, chunk)
            prc = lambda k: planes_ref[sl, k:k + 1]  # (chunk, 1)
            ids = c * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1), 0)
            czmin, cfmin, coh, cw0, cw1, cw2 = _eval_chunk(
                x, y, prc, ids, inf)
            # strict <: earlier chunk (lower ids) wins depth ties
            better = czmin < depth
            depth = jnp.where(better, czmin, depth)
            fid = jnp.where(better, cfmin, fid)
            if want_bary:
                cohf = coh.astype(jnp.float32)
                b0 = jnp.where(better,
                               jnp.sum(cohf * cw0, 0, keepdims=True), b0)
                b1 = jnp.where(better,
                               jnp.sum(cohf * cw1, 0, keepdims=True), b1)
                b2 = jnp.where(better,
                               jnp.sum(cohf * cw2, 0, keepdims=True), b2)
            if n_attr:
                v = _interp_attrs(coh, attr_ref[:, sl], x, y)
                vals = jnp.where(better, v, vals)
            return depth, fid, b0, b1, b2, vals

        init = (jnp.full((1, npx), inf, jnp.float32),
                jnp.full((1, npx), _NOFACE, jnp.int32),
                jnp.zeros((1, npx), jnp.float32),
                jnp.zeros((1, npx), jnp.float32),
                jnp.zeros((1, npx), jnp.float32),
                jnp.zeros((cp, npx), jnp.float32))
        depth, fid, b0, b1, b2, vals = jax.lax.fori_loop(
            0, nc, chunk_body, init)
        depth_ref[...] = depth[None, None]
        face_ref[...] = jnp.where(fid == _NOFACE, -1, fid)[None, None]
        if want_bary:
            for k, b in enumerate((b0, b1, b2)):
                bary_ref[k] = b[None, None]
        for ch in range(n_attr):
            attr_out_ref[ch] = vals[ch:ch + 1][None, None]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "n_attr", "want_bary", "th",
                     "chunk", "interpret"))
def _raster_call_binned(planes, attr_tab, tile_planes, tile_fids, tile_attrs,
                        overflow, width, height, n_attr, want_bary, th,
                        chunk, interpret):
    from jax.experimental.pallas import tpu as pltpu

    hp = height + ((-height) % th)
    wp = width + ((-width) % _LANES)
    gi, gj = hp // th, wp // _LANES
    npx = th * _LANES
    fp = planes.shape[0]
    nc = fp // chunk
    K = tile_fids.shape[1]
    ca = attr_tab.shape[0]

    kern = functools.partial(_kernel_binned, th=th, K=K, chunk=chunk, nc=nc,
                             n_attr=n_attr, want_bary=want_bary)
    out_shapes = [
        jax.ShapeDtypeStruct((gi, gj, 1, npx), jnp.float32),
        jax.ShapeDtypeStruct((gi, gj, 1, npx), jnp.int32),
        jax.ShapeDtypeStruct((3, gi, gj, 1, npx), jnp.float32),
        jax.ShapeDtypeStruct((max(n_attr, 1), gi, gj, 1, npx), jnp.float32),
    ]
    # index maps take the scalar-prefetch ref as a trailing arg
    px_spec = pl.BlockSpec((1, 1, 1, npx), lambda i, j, m: (i, j, 0, 0))
    ch_spec = lambda ch: pl.BlockSpec(
        (ch, 1, 1, 1, npx), lambda i, j, m: (0, i, j, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gi, gj),
        in_specs=[
            pl.BlockSpec((1, K, 12), lambda i, j, m: (i * gj + j, 0, 0)),
            pl.BlockSpec((1, K, 1), lambda i, j, m: (i * gj + j, 0, 0)),
            pl.BlockSpec((1, ca, K), lambda i, j, m: (i * gj + j, 0, 0)),
            pl.BlockSpec((fp, 12), lambda i, j, m: (0, 0)),
            pl.BlockSpec((ca, fp), lambda i, j, m: (0, 0)),
        ],
        out_specs=[px_spec, px_spec, ch_spec(3), ch_spec(max(n_attr, 1))],
    )
    depth, face, bary, attrs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(overflow, tile_planes, tile_fids, tile_attrs, planes, attr_tab)

    def untile(a):
        lead = a.shape[:-4]
        a = a.reshape(lead + (gi, gj, th, _LANES))
        a = jnp.swapaxes(a, -3, -2)
        return a.reshape(lead + (hp, wp))

    return untile(depth), untile(face), untile(bary), untile(attrs)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "n_attr", "want_bary", "th",
                     "interpret"))
def _raster_call(planes, attr_tab, width, height, n_attr, want_bary,
                 th, interpret):
    hp = height + ((-height) % th)
    wp = width + ((-width) % _LANES)
    gi, gj = hp // th, wp // _LANES
    npx = th * _LANES
    fp = planes.shape[0]

    kern = functools.partial(_kernel, th=th, n_attr=n_attr,
                             want_bary=want_bary)
    # lane-major tile-flat outputs: block (.., 1, N) keeps the kernel's
    # pixels-in-lanes layout end to end; untile() is one cheap XLA transpose
    out_shapes = [
        jax.ShapeDtypeStruct((gi, gj, 1, npx), jnp.float32),   # depth
        jax.ShapeDtypeStruct((gi, gj, 1, npx), jnp.int32),     # face
        jax.ShapeDtypeStruct((3, gi, gj, 1, npx), jnp.float32),  # bary
        jax.ShapeDtypeStruct((max(n_attr, 1), gi, gj, 1, npx), jnp.float32),
    ]
    px_spec = pl.BlockSpec((1, 1, 1, npx), lambda i, j: (i, j, 0, 0))
    ch_spec = lambda c: pl.BlockSpec((c, 1, 1, 1, npx),
                                     lambda i, j: (0, i, j, 0, 0))
    depth, face, bary, attrs = pl.pallas_call(
        kern,
        grid=(gi, gj),
        in_specs=[
            pl.BlockSpec((fp, 12), lambda i, j: (0, 0)),
            pl.BlockSpec((attr_tab.shape[0], fp), lambda i, j: (0, 0)),
        ],
        out_specs=[px_spec, px_spec, ch_spec(3), ch_spec(max(n_attr, 1))],
        out_shape=out_shapes,
        interpret=interpret,
    )(planes, attr_tab)

    def untile(a):
        lead = a.shape[:-4]
        a = a.reshape(lead + (gi, gj, th, _LANES))
        a = jnp.swapaxes(a, -3, -2)
        return a.reshape(lead + (hp, wp))

    return untile(depth), untile(face), untile(bary), untile(attrs)


def rasterize_planes(verts_screen, faces, width: int, height: int,
                     vertex_attrs=None, face_attrs=None, valid=None,
                     want_bary: bool = True, th: int | None = None,
                     cull: bool | None = None, chunk: int = 128,
                     bin_capacity: int = 128,
                     interpret: bool | None = None):
    """Plane-based rasterization (+ fused attribute interpolation).

    verts_screen: (V, 3) pixel-space x, y, depth z (z > 0 drawn).
    vertex_attrs: optional (V, Ca) per-vertex attributes, interpolated with
    screen-space barycentrics (matches render.interpolate_attribute).
    face_attrs: optional (F, Cb) per-face constants (flat shading).
    cull: bin faces into pixel tiles by bbox overlap (capacity
    `bin_capacity` per tile; overflowing tiles fall back to a full
    in-kernel scan) so the kernel evaluates (pixels, K) instead of
    (pixels, F) — defaults on when F > bin_capacity. Same winners and
    tie-breaks as the uncull path (both pick the lowest face id at equal
    depth).
    Returns dict(depth (H, W), face (H, W) int32 -1=empty, bary (H, W, 3),
    attrs (H, W, Ca+Cb)).
    """
    if interpret is None:
        # run the identical kernel everywhere: compiled on TPU, interpreter
        # mode on CPU backends (tests, reference comparisons)
        interpret = jax.default_backend() != "tpu"
    f_count = faces.shape[0]
    if cull is None:
        cull = f_count > bin_capacity
    if th is None:
        # th=16 (N=2048) with the binned K=128 working set measures 19.8 MB
        # of scoped VMEM (>16 MB limit) — the overflow fallback's buffers
        # stack on the binned pass's; th=8 fits
        th = 8 if cull else 4

    planes12 = face_planes(verts_screen, faces, valid=valid)  # (12, F)
    # kernel layout: faces in SUBLANES, pixels in lanes -> planes (Fp, 12)
    planes = _pad_axis(planes12.T, 0, chunk if cull else _LANES, 0.0)
    fp = planes.shape[0]
    # padded faces: a = b = 0 from the zero-pad, so c0 = -1 forces w0 < 0
    # at every pixel (see face_planes on why not -BIG)
    live = jnp.arange(fp) < f_count
    if fp != f_count:
        planes = planes.at[:, 2].set(jnp.where(live, planes[:, 2], -1.0))

    tabs = []
    if vertex_attrs is not None:
        tabs.append(attr_planes_from_vertex(
            planes12, faces, vertex_attrs.astype(jnp.float32)))
    if face_attrs is not None:
        tabs.append(attr_planes_from_face_const(
            f_count, face_attrs.astype(jnp.float32)))
    n_attr = sum(t.shape[2] for t in tabs)
    if n_attr:
        tab = jnp.concatenate(tabs, axis=2)  # (F, 3, C)
        cp = n_attr + ((-n_attr) % 8)
        tab = _pad_axis(tab, 2, cp if cp else 1, 0.0)
        if fp != f_count:
            tab = jnp.concatenate(
                [tab, jnp.zeros((fp - f_count, 3, cp), tab.dtype)], axis=0)
        # transposed (3*Cp, Fp) table laid out [A; B; C] rows so the
        # one-hot contraction keeps pixels in lanes
        attr_tab = tab.transpose(1, 2, 0).reshape(3 * cp, fp)
    else:
        attr_tab = jnp.zeros((3 * 8, fp), jnp.float32)

    if cull:
        hp = height + ((-height) % th)
        wp = width + ((-width) % _LANES)
        gi, gj = hp // th, wp // _LANES
        n_tiles = gi * gj
        K = min(bin_capacity, fp)
        # conservative bbox-vs-tile overlap (n_tiles, fp), then per tile the
        # <= K overlapping face ids in ascending order (score fp - fid keeps
        # the dense path's lowest-id depth tie break)
        xy = jnp.take(verts_screen, faces, axis=0)[..., :2]  # (F, 3, 2)
        xy = jnp.concatenate(
            [xy, jnp.zeros((fp - f_count, 3, 2), xy.dtype)], axis=0)
        xmin = jnp.min(xy[..., 0], axis=1) - 1.0
        xmax = jnp.max(xy[..., 0], axis=1) + 1.0
        ymin = jnp.min(xy[..., 1], axis=1) - 1.0
        ymax = jnp.max(xy[..., 1], axis=1) + 1.0
        ti0 = jnp.floor(ymin / th).astype(jnp.int32)
        ti1 = jnp.floor(ymax / th).astype(jnp.int32)
        tj0 = jnp.floor(xmin / _LANES).astype(jnp.int32)
        tj1 = jnp.floor(xmax / _LANES).astype(jnp.int32)
        ii = jnp.arange(gi, dtype=jnp.int32)
        jj = jnp.arange(gj, dtype=jnp.int32)
        # grazing projections give huge/non-finite screen coords whose
        # int-cast bboxes cover EVERY tile — they'd flood the K bin slots
        # (and, pre-guard, poisoned attribute tables with NaN; round-5
        # config-7 TPU fix). Their planes are killed anyway; drop them here.
        lim = jnp.float32(1e7)  # also catches finite-but-absurd coords
        finite = ((jnp.abs(xmin) < lim) & (jnp.abs(xmax) < lim)
                  & (jnp.abs(ymin) < lim) & (jnp.abs(ymax) < lim))
        hit_i = (ii[:, None] >= ti0[None]) & (ii[:, None] <= ti1[None])
        hit_j = (jj[:, None] >= tj0[None]) & (jj[:, None] <= tj1[None])
        hit = (hit_i[:, None, :] & hit_j[None, :, :]
               & (live & finite)[None, None, :])
        hit = hit.reshape(n_tiles, fp)
        counts = jnp.sum(hit, axis=1)
        overflow = (counts > K).astype(jnp.int32).reshape(gi, gj)
        score = jnp.where(hit, fp - jnp.arange(fp, dtype=jnp.int32)[None],
                          0)
        top, _ = jax.lax.top_k(score, K)  # descending score = ascending id
        slot_ok = top > 0
        tile_fids = jnp.where(slot_ok, fp - top, 0)
        # gather the planes of each tile's face list; empty slots become
        # killed planes (a=b=0, c0=-1 -> outside every pixel)
        tile_planes = jnp.take(planes, tile_fids, axis=0)  # (T, K, 12)
        kill = jnp.zeros((12,), jnp.float32).at[2].set(-1.0)
        tile_planes = jnp.where(slot_ok[:, :, None], tile_planes,
                                kill[None, None, :])
        tile_fids = jnp.where(slot_ok, tile_fids, _NOFACE)
        # (T, 3*Cp, K) attribute tables, gathered from the transposed tab.
        # Empty slots must gather row 0, NOT _NOFACE: jnp.take's default
        # out-of-bounds mode FILLS float gathers with NaN, and one NaN
        # column turns the kernel's one-hot matmul into NaN for every pixel
        # of the tile (round-5 TPU config-7 black-frame regression; the
        # overflow tiles' full-scan overwrite masked it in spot checks).
        tile_attrs = jnp.take(attr_tab,
                              jnp.where(slot_ok, tile_fids, 0), axis=1)
        tile_attrs = jnp.moveaxis(tile_attrs, 0, 1)
        depth, face, bary, attrs = _raster_call_binned(
            planes, attr_tab, tile_planes, tile_fids[:, :, None],
            tile_attrs, overflow, width, height, n_attr, want_bary, th,
            chunk, interpret)
    else:
        depth, face, bary, attrs = _raster_call(
            planes, attr_tab, width, height, n_attr, want_bary, th,
            interpret)
    empty = face[:height, :width] < 0
    out = dict(
        depth=jnp.where(empty, jnp.inf, depth[:height, :width]),
        face=jnp.where(empty, -1, face[:height, :width]),
    )
    if want_bary:
        b = jnp.moveaxis(bary[:, :height, :width], 0, -1)
        out["bary"] = jnp.where(empty[..., None], 0.0, b)
    if n_attr:
        a = jnp.moveaxis(attrs[:n_attr, :height, :width], 0, -1)
        out["attrs"] = jnp.where(empty[..., None], 0.0, a)
    return out
