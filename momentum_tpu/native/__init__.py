"""Native (C++) IO runtime, loaded via ctypes.

Compiled on demand from src/momentum_io.cpp (g++ -O3); every entry point has
a pure-Python fallback in momentum_tpu.io, so the library being unavailable
never breaks functionality — it only slows host-side parsing. Set
MOMENTUM_TPU_NO_NATIVE=1 to disable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "c3d_read_points", "mmo_read", "gif_encode"]

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MOMENTUM_TPU_NO_NATIVE"):
        return None
    here = os.path.dirname(__file__)
    src = os.path.join(here, "src", "momentum_io.cpp")
    out = os.path.join(here, "libmomentum_io.so")
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", out],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(out)
    except Exception:
        return None
    lib.c3d_query.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_float)]
    lib.c3d_read_points.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    lib.mmo_query.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_longlong)] * 3
    lib.mmo_read.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_char_p, ctypes.c_longlong,
    ]
    lib.gif_encode.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def c3d_read_points(path):
    """Native C3D point decode → (positions (F,M,3) f32, occluded (F,M) bool,
    fps) or None if the native library is unavailable / parsing failed."""
    lib = _build_and_load()
    if lib is None:
        return None
    nf = ctypes.c_int()
    npts = ctypes.c_int()
    rate = ctypes.c_float()
    if lib.c3d_query(path.encode(), ctypes.byref(nf), ctypes.byref(npts),
                     ctypes.byref(rate)) != 0:
        return None
    positions = np.zeros((nf.value, npts.value, 3), np.float32)
    occluded = np.zeros((nf.value, npts.value), np.uint8)
    if lib.c3d_read_points(path.encode(), positions.reshape(-1), occluded.reshape(-1)) != 0:
        return None
    return positions, occluded.astype(bool), float(rate.value)


def mmo_read(path):
    """Native .mmo read → (poses (F,P), scale (J,), param_names, joint_names)
    or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    p = ctypes.c_longlong()
    j = ctypes.c_longlong()
    f = ctypes.c_longlong()
    if lib.mmo_query(path.encode(), ctypes.byref(p), ctypes.byref(j),
                     ctypes.byref(f)) != 0:
        return None
    poses = np.zeros((f.value, p.value), np.float32)
    scale = np.zeros(j.value, np.float32)
    cap = 1 << 20
    pn = ctypes.create_string_buffer(cap)
    jn = ctypes.create_string_buffer(cap)
    if lib.mmo_read(path.encode(), poses.reshape(-1), scale, pn, cap, jn, cap) != 0:
        return None
    param_names = pn.value.decode().split("\n") if pn.value else []
    joint_names = jn.value.decode().split("\n") if jn.value else []
    return poses, scale, param_names, joint_names


def gif_encode(path, frames, delay_cs: int, loop: int = 0):
    """Native GIF89a encode of (F, H, W, 3) uint8 frames. True on success."""
    lib = _build_and_load()
    if lib is None:
        return False
    frames = np.ascontiguousarray(frames, np.uint8)
    f, h, w, _ = frames.shape
    return lib.gif_encode(frames.reshape(-1), f, h, w, int(delay_cs),
                          int(loop), path.encode()) == 0
