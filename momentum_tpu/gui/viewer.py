"""Offline motion viewer: render posed characters to image sequences.

Reference surface: momentum/gui/ (rerun log helpers: logCharacter, logMesh,
logMarkers, glb_viewer app). Without a live-viewer runtime the equivalent is
batch rendering: FK + skinning + z-buffer rasterizer per frame, with optional
skeleton/marker overlays, exported as frames or an animated GIF.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "auto_camera",
    "render_motion",
    "draw_skeleton",
    "draw_markers",
    "save_motion_gif",
]


def auto_camera(points, width: int, height: int, fov_scale: float = 1.2):
    """Frame a point cloud: camera on +z looking at the bbox center."""
    from momentum_tpu.camera import Camera, PinholeIntrinsics
    from momentum_tpu.math import skel_state as ss

    pts = np.asarray(points).reshape(-1, 3)
    lo, hi = pts.min(0), pts.max(0)
    center = (lo + hi) / 2
    radius = max(float(np.linalg.norm(hi - lo)) / 2, 1e-3)
    f = 0.5 * min(width, height)
    dist = fov_scale * radius * 2.0
    # world→camera with identity rotation: the bbox center lands at
    # camera-space (0, 0, dist), in front of the camera (+z forward)
    t = np.asarray([0.0, 0.0, dist]) - center
    intr = PinholeIntrinsics.create(f, f, width / 2.0, height / 2.0)
    pose = ss.join(jnp.asarray(t, jnp.float32),
                   jnp.asarray([0.0, 0.0, 0.0, 1.0]), jnp.ones(1))
    return Camera.create(intr, pose)


def _posed_vertices(character, model_params):
    if character.mesh is None or character.skin_weights is None:
        return None, character.skeleton_states(model_params)
    from momentum_tpu.character.character_state import character_state

    st = character_state(character.with_inverse_bind_pose(), model_params,
                         update_collision=False)
    return st.mesh_vertices, st.skeleton_state


def render_motion(character, motion, width: int = 256, height: int = 256,
                  camera=None, light_dir=(0.3, -0.7, 0.6),
                  skeleton_overlay: bool = False, ground: bool = False):
    """Render a (F, P) model-parameter motion → (F, H, W, 3) float colors.

    Frames render sequentially on the host loop (each frame is one jitted
    rasterizer call); the camera is auto-framed from the first frame unless
    given. `ground` draws the reference viewer's checkerboard floor under
    the character (rasterize_checkerboard)."""
    from momentum_tpu.rasterizer import render_mesh

    motion = jnp.asarray(motion)
    if motion.ndim == 1:
        motion = motion[None]
    frames = []
    cam = camera
    ground_buffers = None
    for i in range(motion.shape[0]):
        verts, states = _posed_vertices(character, motion[i])
        joints = np.asarray(states[..., :3])
        if cam is None:
            ref = np.asarray(verts) if verts is not None else joints
            cam = auto_camera(ref, width, height)
        if ground and ground_buffers is None:
            from momentum_tpu.rasterizer import rasterize_checkerboard

            ref = np.asarray(verts) if verts is not None else joints
            extent = float(np.abs(ref[:, [0, 2]]).max()) * 3.0 + 1.0
            ground_buffers = rasterize_checkerboard(
                cam, width, height, half_extent=extent, squares=10)
        if verts is not None:
            out = render_mesh(cam, verts, character.mesh.faces, width, height,
                              light_dir=light_dir)
            img = np.asarray(out["color"])
            if ground_buffers is not None:
                gz, gc = ground_buffers
                win = np.asarray(out["depth"]) < np.asarray(gz)
                img = np.where(win[..., None], img, np.asarray(gc))
        else:
            img = (np.asarray(ground_buffers[1]).copy()
                   if ground_buffers is not None
                   else np.zeros((height, width, 3), np.float32))
        if skeleton_overlay or verts is None:
            img = draw_skeleton(img, cam, character.skeleton, states)
        frames.append(img)
    return np.stack(frames)


def _draw_line(img, x0, y0, x1, y1, color):
    """Host-side Bresenham segment."""
    h, w = img.shape[:2]
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1))
    xs = np.round(np.linspace(x0, x1, n + 1)).astype(int)
    ys = np.round(np.linspace(y0, y1, n + 1)).astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = color
    return img


def draw_skeleton(img, camera, skeleton, states, color=(1.0, 0.3, 0.1)):
    """Overlay bone segments (parent→child) on a rendered frame."""
    img = np.array(img, copy=True)
    pts = jnp.asarray(states[..., :3])
    uvz, valid = camera.project(pts)
    uvz = np.asarray(uvz)
    valid = np.asarray(valid)
    parents = np.asarray(skeleton.joint_parent)
    for j, p in enumerate(parents):
        if p < 0 or not (valid[j] and valid[p]):
            continue
        img = _draw_line(img, uvz[p, 0], uvz[p, 1], uvz[j, 0], uvz[j, 1],
                         np.asarray(color, img.dtype))
    return img


def draw_markers(img, camera, positions, color=(0.2, 1.0, 0.2), size: int = 1):
    """Overlay marker points (logMarkers equivalent)."""
    img = np.array(img, copy=True)
    uvz, valid = camera.project(jnp.asarray(positions, jnp.float32))
    uvz = np.asarray(uvz)
    valid = np.asarray(valid)
    h, w = img.shape[:2]
    for i in range(uvz.shape[0]):
        if not valid[i]:
            continue
        x, y = int(round(uvz[i, 0])), int(round(uvz[i, 1]))
        x0, x1 = max(x - size, 0), min(x + size + 1, w)
        y0, y1 = max(y - size, 0), min(y + size + 1, h)
        if x0 < x1 and y0 < y1:
            img[y0:y1, x0:x1] = np.asarray(color, img.dtype)
    return img


def save_motion_gif(path, character, motion, width: int = 256,
                    height: int = 256, fps: float = 15.0, **kw) -> None:
    """Render + export a motion as an animated GIF (glb_viewer equivalent)."""
    from momentum_tpu.gui.gif import save_gif

    frames = render_motion(character, motion, width, height, **kw)
    save_gif(path, frames, fps=fps)


def create_camera_for_body(character, model_params, width: int, height: int,
                           fov_scale: float = 1.2):
    """Auto-framed camera for a posed character (pymomentum renderer
    create_camera_for_body)."""
    import jax.numpy as jnp

    verts, states = _posed_vertices(character, jnp.asarray(model_params))
    ref = np.asarray(verts) if verts is not None else np.asarray(states[..., :3])
    return auto_camera(ref, width, height, fov_scale)


def create_camera_for_hand(character, model_params, width: int, height: int,
                           wrist_joint: str = "l_wrist",
                           fov_scale: float = 0.8):
    """Auto-framed close-up on the subtree under a wrist joint
    (create_camera_for_hand)."""
    import jax.numpy as jnp

    names = character.skeleton.joint_names
    if wrist_joint not in names:
        return create_camera_for_body(character, model_params, width, height)
    wi = names.index(wrist_joint)
    parents = np.asarray(character.skeleton.joint_parent)
    sub = [wi]
    for j in range(wi + 1, len(parents)):
        if parents[j] in sub:
            sub.append(j)
    states = character.skeleton_states(jnp.asarray(model_params))
    pts = np.asarray(states[..., :3])[sub]
    return auto_camera(pts, width, height, fov_scale)
