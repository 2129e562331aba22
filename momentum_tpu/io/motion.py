"""Binary momentum motion files (.mmo).

Reference layout (momentum/io/motion/mmo_io.cpp:142-171 save, :269-330 load):
  [nParams u64][nJoints u64][nFrames u64]
  nParams × ([len u64][name bytes])
  nJoints × ([len u64][name bytes])
  scale:  nJoints floats  (joint "offsets")
  poses:  nParams × nFrames floats, Eigen column-major (frame-contiguous)
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["save_mmo", "load_mmo"]


def save_mmo(path, poses, scale, parameter_names, joint_names) -> None:
    poses = np.asarray(poses, np.float32)  # (F, P) convention here
    scale = np.asarray(scale, np.float32)
    f_cnt, p_cnt = poses.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<QQQ", p_cnt, len(joint_names), f_cnt))
        for name in parameter_names:
            b = name.encode()
            f.write(struct.pack("<Q", len(b)) + b)
        for name in joint_names:
            b = name.encode()
            f.write(struct.pack("<Q", len(b)) + b)
        f.write(scale.astype("<f4").tobytes())
        # Eigen (params × frames) column-major == (F, P) row-major
        f.write(poses.astype("<f4").tobytes())


def load_mmo(path):
    """→ (poses (F, P) float32, scale (nJoints,), parameter_names, joint_names)."""
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    p_cnt, j_cnt, f_cnt = struct.unpack_from("<QQQ", data, off)
    off += 24

    def read_names(n, off):
        names = []
        for _ in range(n):
            (ln,) = struct.unpack_from("<Q", data, off)
            off += 8
            names.append(data[off: off + ln].decode())
            off += ln
        return names, off

    parameter_names, off = read_names(p_cnt, off)
    joint_names, off = read_names(j_cnt, off)
    scale = np.frombuffer(data, "<f4", j_cnt, off).copy()
    off += 4 * j_cnt
    poses = np.frombuffer(data, "<f4", p_cnt * f_cnt, off).reshape(f_cnt, p_cnt).copy()
    return poses, scale, parameter_names, joint_names
