"""MPPCA pose-prior files (.mppca).

Reference layout (momentum/io/skeleton/mppca_io.cpp:37-145):
  [d u64][p u64]
  d × ([len u64][name bytes])           — parameter names per data dimension
  Rpre: p floats
  Cinv: p × (d×d floats, column-major)  — symmetric, so order is moot
  mu:   p×d floats, Eigen column-major
L is recomputed on load as chol(Cinv) with LᵀL = Cinv (mppca_io.cpp:102).
"""

from __future__ import annotations

import struct

import numpy as np

from momentum_tpu.errors.pose_prior import Mppca

__all__ = ["load_mppca", "save_mppca"]


def load_mppca(path) -> Mppca:
    import jax.numpy as jnp

    with open(path, "rb") as f:
        data = f.read()
    off = 0
    d, p = struct.unpack_from("<QQ", data, off)
    off += 16
    names = []
    for _ in range(d):
        (ln,) = struct.unpack_from("<Q", data, off)
        off += 8
        names.append(data[off: off + ln].decode())
        off += ln
    rpre = np.frombuffer(data, "<f4", p, off).copy()
    off += 4 * p
    cinv = np.zeros((p, d, d), np.float32)
    for c in range(p):
        cinv[c] = np.frombuffer(data, "<f4", d * d, off).reshape(d, d, order="F")
        off += 4 * d * d
    mu = np.frombuffer(data, "<f4", p * d, off).reshape(p, d, order="F").copy()

    l = np.zeros_like(cinv)
    for c in range(p):
        g = np.linalg.cholesky(cinv[c].astype(np.float64))
        l[c] = g.T.astype(np.float32)
    return Mppca(
        mu=jnp.asarray(mu),
        cinv=jnp.asarray(cinv),
        l=jnp.asarray(l),
        rpre=jnp.asarray(rpre),
        names=tuple(names),
    )


def save_mppca(path, mppca: Mppca) -> None:
    d = mppca.dim
    p = mppca.num_components
    with open(path, "wb") as f:
        f.write(struct.pack("<QQ", d, p))
        names = mppca.names or tuple(f"p{i}" for i in range(d))
        for n in names[:d]:
            b = n.encode()
            f.write(struct.pack("<Q", len(b)) + b)
        f.write(np.asarray(mppca.rpre, "<f4").tobytes())
        cinv = np.asarray(mppca.cinv)
        for c in range(p):
            f.write(np.asarray(cinv[c], "<f4").T.tobytes())  # column-major
        f.write(np.asarray(mppca.mu, "<f4").T.tobytes())  # column-major (p, d)
