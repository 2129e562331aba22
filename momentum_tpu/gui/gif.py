"""Dependency-free animated GIF writer (GIF89a, LZW-compressed).

Backs the offline viewers (gui/viewer.py) — the image is quantized to a
6×7×6 uniform RGB cube (252 colors), which is plenty for shaded renders.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["save_gif"]

_LEVELS = (6, 7, 6)


def _palette() -> np.ndarray:
    r, g, b = np.meshgrid(
        np.linspace(0, 255, _LEVELS[0]),
        np.linspace(0, 255, _LEVELS[1]),
        np.linspace(0, 255, _LEVELS[2]), indexing="ij")
    pal = np.stack([r, g, b], axis=-1).reshape(-1, 3)
    pad = np.zeros((256 - pal.shape[0], 3))
    return np.concatenate([pal, pad]).astype(np.uint8)


def _quantize(frame: np.ndarray) -> np.ndarray:
    f = np.clip(frame, 0, 255).astype(np.float64)
    idx = 0
    for c, levels in enumerate(_LEVELS):
        q = np.round(f[..., c] / 255.0 * (levels - 1)).astype(np.int32)
        idx = idx * levels + q
    return idx.astype(np.uint16)


def _lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """Standard GIF LZW with code-table resets."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code, size):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += size
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    prefix = ()
    for px in indices.ravel():
        px = int(px)
        cand = prefix + (px,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code >= 4096:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        prefix = (px,)
    if prefix:
        emit(table[prefix], code_size)
    emit(eoi, code_size)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def save_gif(path: str, frames, fps: float = 15.0, loop: int = 0) -> None:
    """Write frames (F, H, W, 3) uint8 (or float in [0,1]) as animated GIF."""
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0.0, 1.0) * 255).astype(np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    f, h, w, _ = frames.shape
    delay = max(int(round(100.0 / fps)), 2)  # hundredths of a second

    from momentum_tpu import native

    if native.gif_encode(path, frames, delay, loop):
        return  # C++ fast path (identical palette/quantization)
    pal = _palette()

    with open(path, "wb") as fh:
        fh.write(b"GIF89a")
        fh.write(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))  # GCT 256, 8bpp
        fh.write(pal.tobytes())
        # netscape loop extension
        fh.write(b"\x21\xFF\x0BNETSCAPE2.0\x03\x01" + struct.pack("<H", loop)
                 + b"\x00")
        for i in range(f):
            fh.write(b"\x21\xF9\x04\x04" + struct.pack("<H", delay)
                     + b"\x00\x00")  # graphic control
            fh.write(b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0))
            fh.write(bytes([8]))  # LZW min code size
            data = _lzw_encode(_quantize(frames[i]))
            for off in range(0, len(data), 255):
                chunk = data[off:off + 255]
                fh.write(bytes([len(chunk)]) + chunk)
            fh.write(b"\x00")
        fh.write(b"\x3B")
