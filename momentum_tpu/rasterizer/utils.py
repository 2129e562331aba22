"""Renderer utility surface: buffers, compositing, scene-level rasterizers,
and auto-framed cameras (pymomentum.renderer parity —
renderer_pybind.cpp:217-893, momentum_render.cpp:36-360,
rasterizer_primitives.cpp:139-650, momentum/rasterizer/image.h:16).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from momentum_tpu.math import skel_state as ss

__all__ = [
    "create_z_buffer",
    "create_rgb_buffer",
    "create_index_buffer",
    "alpha_matte",
    "triangulate",
    "rasterize_mesh",
    "rasterize_checkerboard",
    "rasterize_grid",
    "rasterize_camera_frustum",
    "rasterize_transforms",
    "create_shadow_projection_matrix",
    "create_camera_for_body",
    "create_camera_for_hand",
]


# ---- buffers (pymomentum.renderer create_*_buffer) ----


def create_z_buffer(width: int, height: int) -> jnp.ndarray:
    """(H, W) float32 depth buffer initialized to +inf (empty)."""
    return jnp.full((height, width), jnp.inf, jnp.float32)


def create_rgb_buffer(width: int, height: int) -> jnp.ndarray:
    """(H, W, 3) float32 color buffer initialized to black."""
    return jnp.zeros((height, width, 3), jnp.float32)


def create_index_buffer(width: int, height: int) -> jnp.ndarray:
    """(H, W) int32 triangle-index buffer initialized to -1 (empty) — the
    rasterize() 'face' output uses the same convention."""
    return jnp.full((height, width), -1, jnp.int32)


def alpha_matte(z_buffer, rgb_buffer, tgt_image, alpha: float = 1.0):
    """Composite rendered pixels over a target image (image.h:16 alphaMatte):
    wherever the z-buffer is finite (covered), tgt = alpha·rgb + (1−alpha)·tgt.
    Returns the composited image (the reference mutates tgt in place)."""
    z = jnp.asarray(z_buffer, jnp.float32)
    rgb = jnp.asarray(rgb_buffer, jnp.float32)
    tgt = jnp.asarray(tgt_image, jnp.float32)
    covered = jnp.isfinite(z)[..., None]
    blended = alpha * rgb + (1.0 - alpha) * tgt
    return jnp.where(covered, blended, tgt)


def triangulate(face_indices, face_offsets) -> np.ndarray:
    """Fan-triangulate a polygon soup (momentum_render.cpp:297-327
    triangulate): face i spans face_indices[face_offsets[i]:face_offsets[i+1]];
    → (T, 3) int32 triangles."""
    face_indices = np.asarray(face_indices, np.int64).reshape(-1)
    face_offsets = np.asarray(face_offsets, np.int64).reshape(-1)
    tris = []
    for i in range(len(face_offsets) - 1):
        beg, end = face_offsets[i], face_offsets[i + 1]
        nv = end - beg
        if nv < 3:
            raise ValueError(f"invalid face with {nv} indices; expected >= 3")
        for j in range(1, nv - 1):
            tris.append((face_indices[beg], face_indices[beg + j],
                         face_indices[beg + j + 1]))
    return np.asarray(tris, np.int32).reshape(-1, 3)


# ---- scene-level rasterizers ----


def rasterize_mesh(camera, vertices, faces, width: int, height: int,
                   z_buffer=None, rgb_buffer=None, **kwargs):
    """Render a mesh into (z, rgb) buffers, z-testing against existing
    content (the renderer_pybind rasterize_mesh surface; shading is
    Lambert — use render_mesh_phong for materials)."""
    from momentum_tpu.rasterizer.render import render_mesh

    out = render_mesh(camera, jnp.asarray(vertices, jnp.float32),
                      jnp.asarray(faces, jnp.int32), width, height, **kwargs)
    if z_buffer is None and rgb_buffer is None:
        return out["depth"], out["color"]
    z = create_z_buffer(width, height) if z_buffer is None else \
        jnp.asarray(z_buffer, jnp.float32)
    rgb = create_rgb_buffer(width, height) if rgb_buffer is None else \
        jnp.asarray(rgb_buffer, jnp.float32)
    win = out["depth"] < z
    return (jnp.where(win, out["depth"], z),
            jnp.where(win[..., None], out["color"], rgb))


def rasterize_checkerboard(camera, width: int, height: int,
                           half_extent: float = 200.0, squares: int = 20,
                           z_buffer=None, rgb_buffer=None,
                           colors=((0.8, 0.8, 0.8), (0.4, 0.4, 0.4))):
    """Checkerboard floor in the x-z plane, y up
    (renderer_pybind.cpp:670-708). → (z, rgb)."""
    from momentum_tpu.rasterizer.primitives import make_checkerboard
    from momentum_tpu.rasterizer.render import rasterize

    verts, faces, face_shade = make_checkerboard(half_extent, squares)
    uvz, valid = camera.project(jnp.asarray(verts, jnp.float32))
    screen = jnp.where(valid[..., None], uvz, jnp.asarray([0.0, 0.0, -1.0]))
    out = rasterize(screen, jnp.asarray(faces, jnp.int32), width, height)
    ca = jnp.asarray(colors[0], jnp.float32)
    cb = jnp.asarray(colors[1], jnp.float32)
    shade = jnp.asarray(face_shade, jnp.float32)[:, 0]  # (F,) from (F, 3) grey
    # make_checkerboard emits 0.8/0.4 per face; map to the two user colors
    face_rgb = jnp.where((shade >= 0.6)[:, None], ca, cb)
    face_rgb = jnp.concatenate([face_rgb, jnp.zeros((1, 3))], axis=0)
    color = face_rgb[out["face"]]
    z = create_z_buffer(width, height) if z_buffer is None else \
        jnp.asarray(z_buffer, jnp.float32)
    rgb = create_rgb_buffer(width, height) if rgb_buffer is None else \
        jnp.asarray(rgb_buffer, jnp.float32)
    win = out["depth"] < z
    return jnp.where(win, out["depth"], z), \
        jnp.where(win[..., None], color, rgb)


def rasterize_grid(camera, width: int, height: int,
                   half_extent: float = 200.0, step: float = 20.0,
                   color=(0.6, 0.6, 0.6), thickness: float = 1.0,
                   z_buffer=None, rgb_buffer=None):
    """Grid lines on the x-z ground plane (renderer_pybind.cpp:710-713 —
    rasterize_checkerboard's line-only sibling). → (z, rgb)."""
    from momentum_tpu.rasterizer.overlays import rasterize_lines
    from momentum_tpu.rasterizer.primitives import make_grid_lines

    segs = make_grid_lines(half_extent, step)
    return rasterize_lines(camera, segs.reshape(-1, 3), width, height,
                           color=color, thickness=thickness,
                           z_buffer=z_buffer, rgb_buffer=rgb_buffer)


def rasterize_camera_frustum(viewer_camera, shown_camera, width: int,
                             height: int, depth: float = 50.0,
                             color=(1.0, 1.0, 0.0), thickness: float = 1.0,
                             z_buffer=None, rgb_buffer=None):
    """Draw `shown_camera`'s frustum wireframe as seen from `viewer_camera`
    (renderer_pybind rasterize_camera_frustum). → (z, rgb)."""
    from momentum_tpu.rasterizer.overlays import rasterize_lines
    from momentum_tpu.rasterizer.primitives import make_camera_frustum

    sw = shown_camera.intrinsics.image_width or width
    sh = shown_camera.intrinsics.image_height or height
    segs = np.asarray(make_camera_frustum(shown_camera, sw, sh, depth))
    return rasterize_lines(viewer_camera, segs.reshape(-1, 3), width, height,
                           color=color, thickness=thickness,
                           z_buffer=z_buffer, rgb_buffer=rgb_buffer)


def rasterize_transforms(camera, transforms, width: int, height: int,
                         scale: float = 5.0, thickness: float = 1.5,
                         z_buffer=None, rgb_buffer=None):
    """Draw coordinate-axis triads for a batch of transforms
    (rasterizer_primitives.cpp:608 rasterizeTransforms): +x red, +y green,
    +z blue. `transforms` is (N, 8) skel_states or (N, 4, 4) matrices.
    → (z, rgb)."""
    from momentum_tpu.rasterizer.overlays import rasterize_lines

    t = jnp.asarray(transforms, jnp.float32)
    if t.ndim == 3 and t.shape[-2:] == (4, 4):
        origins = np.asarray(t[:, :3, 3])
        axes = np.asarray(t[:, :3, :3])  # columns are the axes
    elif t.ndim == 2 and t.shape[-1] == 8:
        from momentum_tpu.math import quaternion as quat

        _, q, s = ss.split(t)
        origins = np.asarray(t[:, :3])
        axes = np.asarray(quat.to_rotation_matrix(q)) * \
            np.asarray(s).reshape(-1)[:, None, None]
    else:
        raise ValueError(f"expected (N, 8) skel_states or (N, 4, 4), got {t.shape}")

    z = z_buffer
    rgb = rgb_buffer
    colors = ((1.0, 0.2, 0.2), (0.2, 1.0, 0.2), (0.2, 0.4, 1.0))
    for axis in range(3):
        ends = origins + scale * axes[:, :, axis]
        segs = np.stack([origins, ends], axis=1)  # (N, 2, 3)
        z, rgb = rasterize_lines(camera, segs.reshape(-1, 3), width, height,
                                 color=colors[axis], thickness=thickness,
                                 z_buffer=z, rgb_buffer=rgb)
    if z is None:
        z = create_z_buffer(width, height)
        rgb = create_rgb_buffer(width, height)
    return z, rgb


def create_shadow_projection_matrix(light_dir, plane_normal=(0.0, 1.0, 0.0),
                                    plane_offset: float = 0.0) -> jnp.ndarray:
    """(4, 4) matrix flattening geometry onto the plane n·p = offset along
    the (directional) light direction — the planar-shadow projection the
    reference's create_shadow_projection_matrix builds for ground shadows."""
    light = np.asarray(light_dir, np.float64)
    n = np.asarray(plane_normal, np.float64)
    d = -float(plane_offset)
    ndotl = float(n @ light)
    if abs(ndotl) < 1e-12:
        raise ValueError("light direction is parallel to the shadow plane")
    m = np.empty((4, 4), np.float64)
    m[:3, :3] = ndotl * np.eye(3) - np.outer(light, n)
    m[:3, 3] = -d * light
    m[3, :3] = 0.0
    m[3, 3] = ndotl
    return jnp.asarray(m, jnp.float32)


# ---- auto-framed cameras (momentum_render.cpp:36-360) ----


def _make_outside_in_camera(up_world, look_world, aim_center, distance,
                            image_height: int, image_width: int,
                            focal_length_mm: float = 50.0):
    """Eye basis from (up, look): x right, y down, z forward
    (momentum_render.cpp:36-80); 35mm-equivalent focal length."""
    from momentum_tpu.camera import Camera, PinholeIntrinsics
    from momentum_tpu.math import quaternion as quat

    up = np.asarray(up_world, np.float64)
    look = np.asarray(look_world, np.float64)
    aim = np.asarray(aim_center, np.float64)
    side = np.cross(look, up)
    up_ortho = np.cross(side, look)
    r = np.zeros((3, 3))
    r[:, 1] = -up_ortho / np.linalg.norm(up_ortho)
    r[:, 2] = look / np.linalg.norm(look)
    r[:, 0] = np.cross(r[:, 1], r[:, 2])
    assert np.linalg.det(r) > 0

    # world→eye: translate aim to origin, rotate by Rᵀ, push back along +z
    r_we = r.T
    t_we = distance * np.asarray([0.0, 0.0, 1.0]) - r_we @ aim
    focal_px = (focal_length_mm / 36.0) * image_width
    intr = PinholeIntrinsics.create(
        focal_px, focal_px, (image_width - 1) / 2.0, (image_height - 1) / 2.0,
        image_size=(image_width, image_height))
    q = quat.from_rotation_matrix(jnp.asarray(r_we, jnp.float32))
    state = jnp.concatenate([jnp.asarray(t_we, jnp.float32),
                             jnp.asarray(q, jnp.float32),
                             jnp.ones(1, jnp.float32)])
    return Camera.create(intr, state)


def _frame_character(camera, character, skel_states, min_z: float = 5.0):
    """Adjust the camera so every skinned vertex (or joint) across the given
    states is visible (momentum_render.cpp:82-101 frameMesh)."""
    from momentum_tpu.character.skinning import skin_points

    states = jnp.asarray(skel_states, jnp.float32)
    if states.ndim == 2:
        states = states[None]
    pts = []
    for i in range(states.shape[0]):
        if character.mesh is not None and character.skin_weights is not None:
            char = character.with_inverse_bind_pose() \
                if character.inverse_bind_pose is None else character
            pts.append(np.asarray(skin_points(
                char.skin_weights, states[i], char.inverse_bind_pose,
                char.mesh.vertices)))
        else:
            pts.append(np.asarray(states[i][:, :3]))
    return camera.frame(np.concatenate(pts, axis=0), min_z=min_z,
                        edge_padding=0.05)


def create_camera_for_body(character, skeleton_states, image_height: int,
                           image_width: int, focal_length_mm: float = 50.0,
                           horizontal: bool = False,
                           camera_angle: float = 0.0):
    """Camera that faces the body's front across all given frames
    (momentum_render.cpp:103-196 makeOutsideInCameraForBody +
    create_camera_for_body binding): centered on the mid-spine (or wrist for
    hands), 2.5 m out, then dollied so every frame is in view.
    skeleton_states: (nJoints, 8) or (nFrames, nJoints, 8)."""
    states = jnp.asarray(skeleton_states, jnp.float32)
    if states.ndim == 2:
        states = states[None]
    names = character.skeleton.joint_names
    for cand in ("b_spine3", "c_spine3", "spineUpper_joint",
                 "b_l_wrist", "b_r_wrist", "l_wrist", "r_wrist"):
        if cand in names:
            spine = names.index(cand)
            break
    else:
        # fall back to the middle joint of the chain rather than failing on
        # non-standard rigs (the reference throws)
        spine = character.skeleton.num_joints // 2

    spine_states = states[:, spine]  # (F, 8)
    blended = ss.blend(spine_states)
    center = np.asarray(blended[:3], np.float64)
    from momentum_tpu.math import quaternion as quat

    r = np.asarray(quat.to_rotation_matrix(blended[3:7]), np.float64)

    # spine-local: x up, y forward, z body-left (momentum_render.cpp:151-154)
    body_forward = r @ np.asarray([0.0, 1.0, 0.0])
    cam_forward = -body_forward
    if horizontal:
        cam_up = np.asarray([0.0, 1.0, 0.0])
        cam_forward = cam_forward.copy()
        cam_forward[1] = 0.0
        nrm = np.linalg.norm(cam_forward)
        if nrm < 1e-5:
            cam_forward = -body_forward
            cam_up = r @ np.asarray([1.0, 0.0, 0.0])
            cam_up /= np.linalg.norm(cam_up)
        else:
            cam_forward /= nrm
    else:
        cam_up = r @ np.asarray([1.0, 0.0, 0.0])
        cam_up /= np.linalg.norm(cam_up)

    if camera_angle != 0.0:
        c, s = np.cos(camera_angle), np.sin(camera_angle)
        k = cam_up / np.linalg.norm(cam_up)
        cam_forward = (cam_forward * c + np.cross(k, cam_forward) * s
                       + k * (k @ cam_forward) * (1.0 - c))

    cam = _make_outside_in_camera(cam_up, cam_forward, center, 250.0,
                                  image_height, image_width, focal_length_mm)
    return _frame_character(cam, character, states)


def create_camera_for_hand(wrist_transformation, image_height: int,
                           image_width: int):
    """Camera looking inward at a hand from 0.5 m (momentum_render.cpp:328-360
    create_camera_for_hand). wrist_transformation: (4, 4), translation in mm."""
    m = np.asarray(wrist_transformation, np.float64)
    if m.shape != (4, 4):
        raise ValueError(f"wrist_transformation must be 4x4, got {m.shape}")
    center_cm = m[:3, 3] * 0.1
    return _make_outside_in_camera(
        (0.0, 1.0, 0.0), (0.0, 0.0, 1.0), center_cm, 50.0,
        image_height, image_width)
