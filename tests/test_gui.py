"""Offline viewer + GIF export (reference: momentum/gui/ rerun viewers)."""

import os

import jax.numpy as jnp
import numpy as np

from momentum_tpu.gui import (
    auto_camera,
    draw_markers,
    draw_skeleton,
    render_motion,
    save_gif,
    save_motion_gif,
)
from momentum_tpu.testing.fixtures import create_test_character


def test_render_motion_frames():
    char = create_test_character(4)
    p = char.num_model_parameters
    motion = np.zeros((3, p), np.float32)
    motion[1, 0] = 0.3
    motion[2, 0] = 0.6
    frames = render_motion(char, motion, 64, 64, skeleton_overlay=True)
    assert frames.shape == (3, 64, 64, 3)
    assert np.isfinite(frames).all()
    assert frames.max() > 0.05  # something rendered
    # motion changes the image
    assert np.abs(frames[0] - frames[2]).max() > 1e-3


def test_marker_overlay():
    char = create_test_character(4)
    frames = render_motion(char, np.zeros((1, char.num_model_parameters)),
                           64, 64)
    cam = auto_camera(np.asarray(char.skeleton_states(
        jnp.zeros(char.num_model_parameters)))[:, :3], 64, 64)
    pts = np.asarray([[0.0, 1.0, 0.0]], np.float32)
    out = draw_markers(frames[0], cam, pts)
    assert np.abs(out - frames[0]).max() > 0.1  # marker drawn


def test_save_gif(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (4, 32, 48, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "out.gif")
    save_gif(path, frames, fps=10)
    data = open(path, "rb").read()
    assert data[:6] == b"GIF89a"
    assert data[-1:] == b"\x3B"
    import struct
    w, h = struct.unpack("<HH", data[6:10])
    assert (w, h) == (48, 32)
    # 4 image descriptors
    assert data.count(b"\x21\xF9\x04") == 4


def test_save_motion_gif(tmp_path):
    char = create_test_character(3)
    path = os.path.join(tmp_path, "motion.gif")
    save_motion_gif(path, char,
                    np.zeros((2, char.num_model_parameters), np.float32),
                    width=48, height=48, fps=5)
    assert os.path.getsize(path) > 100


def test_native_gif_matches_python():
    """C++ encoder output must be byte-identical to the Python fallback."""
    import momentum_tpu.native as nat
    if not nat.available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    frames = rng.uniform(0, 255, (3, 40, 56, 3)).astype(np.uint8)
    import tempfile, os as _os
    d = tempfile.mkdtemp()
    pa, pb = _os.path.join(d, "a.gif"), _os.path.join(d, "b.gif")
    save_gif(pa, frames, fps=12)
    # force the python path
    _os.environ["MOMENTUM_TPU_NO_NATIVE"] = "1"
    nat._TRIED = False
    nat._LIB = None
    try:
        save_gif(pb, frames, fps=12)
    finally:
        del _os.environ["MOMENTUM_TPU_NO_NATIVE"]
        nat._TRIED = False
        nat._LIB = None
    assert open(pa, "rb").read() == open(pb, "rb").read()


def test_render_motion_ground_checkerboard():
    import numpy as np

    from momentum_tpu.gui.viewer import render_motion
    from momentum_tpu.testing.fixtures import create_test_character

    c = create_test_character(4)
    motion = np.zeros((2, c.num_model_parameters), np.float32)
    frames = render_motion(c, motion, width=64, height=48, ground=True)
    assert frames.shape == (2, 48, 64, 3)
    g = frames[0].reshape(-1, 3)
    # both checker greys visible somewhere
    assert (np.abs(g[:, 0] - 0.8) < 1e-3).any()
    assert (np.abs(g[:, 0] - 0.4) < 1e-3).any()
