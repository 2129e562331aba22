"""Pallas TPU kernel: fused batched forward kinematics.

The XLA FK (character/fk.py) is bandwidth-bound: every binary-lifting level
materializes (B, nJ+1, 8) intermediates in HBM (~40 elementwise ops × 2
round-trips per level). This kernel runs the whole ladder in VMEM: one grid
step loads a 128-wide batch tile, performs all log₂(depth) levels — parent
selection as a one-hot (nJ+1)×(nJ+1) matmul per state component (MXU) and
the skel_state compose as elementwise math on (nJ+1, 128) tiles (VPU) — and
writes only the final global states.

Layout: states are carried component-major as (8, nJ+1, TILE) so the last
dimension is the 128-lane axis and each component is a clean (nJ+1, 128)
tile.

The kernel is numerically identical to global_skel_states_lifted (same
compose order). CPU/tests run it in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fk_pallas", "fk_pallas_available"]

_TILE = 128


def fk_pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _compose(pa, pb):
    """Compose two skel_states given as 8-tuples of (nJ+1, TILE) blocks:
    (A·B).t = A.t + A.R·(A.s·B.t); (A·B).q = A.q∘B.q; (A·B).s = A.s·B.s."""
    tax, tay, taz, qax, qay, qaz, qaw, sa = pa
    tbx, tby, tbz, qbx, qby, qbz, qbw, sb = pb
    # v = sa * tb
    vx, vy, vz = sa * tbx, sa * tby, sa * tbz
    # rotate v by qa: v + 2*qaw*(qv×v) + 2*qv×(qv×v)
    cx1 = qay * vz - qaz * vy
    cy1 = qaz * vx - qax * vz
    cz1 = qax * vy - qay * vx
    cx2 = qay * cz1 - qaz * cy1
    cy2 = qaz * cx1 - qax * cz1
    cz2 = qax * cy1 - qay * cx1
    rx = vx + 2.0 * (qaw * cx1 + cx2)
    ry = vy + 2.0 * (qaw * cy1 + cy2)
    rz = vz + 2.0 * (qaw * cz1 + cz2)
    tx, ty, tz = tax + rx, tay + ry, taz + rz
    # quaternion product qa ∘ qb
    qx = qaw * qbx + qax * qbw + qay * qbz - qaz * qby
    qy = qaw * qby - qax * qbz + qay * qbw + qaz * qbx
    qz = qaw * qbz + qax * qby - qay * qbx + qaz * qbw
    qw = qaw * qbw - qax * qbx - qay * qby - qaz * qbz
    return (tx, ty, tz, qx, qy, qz, qw, sa * sb)


def _fk_kernel(n_levels, perm_ref, local_ref, out_ref):
    g = [local_ref[c] for c in range(8)]
    for lev in range(n_levels):
        perm = perm_ref[lev]
        parent = [
            jnp.dot(perm, g[c], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) for c in range(8)
        ]
        g = list(_compose(parent, g))
    for c in range(8):
        out_ref[c] = g[c]


@functools.partial(jax.jit, static_argnames=("schedule",))
def _fk_pallas_impl(local_cm: jnp.ndarray, schedule) -> jnp.ndarray:
    """local_cm: (8, nJ+1, B) component-major local states (B multiple of TILE)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1 = local_cm.shape[1]
    b = local_cm.shape[2]
    perms = jnp.stack([
        jnp.asarray(np.eye(n1, dtype=np.float32)[np.asarray(p)]) for p in schedule
    ])  # (L, n1, n1)

    kernel = functools.partial(_fk_kernel, len(schedule))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, n1, b), jnp.float32),
        grid=(b // _TILE,),
        in_specs=[
            pl.BlockSpec((len(schedule), n1, n1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n1, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, n1, _TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(perms, local_cm)


def fk_pallas(skeleton, local_states: jnp.ndarray) -> jnp.ndarray:
    """(B, nJ, 8) local → (B, nJ, 8) global states via the fused kernel.

    Pads the batch to a multiple of 128 lanes. Falls back to interpreter mode
    off-TPU (slow — use only for testing there).
    """
    b, nj, _ = local_states.shape
    ident = jnp.zeros((b, 1, 8), local_states.dtype).at[..., 6].set(1.0).at[..., 7].set(1.0)
    g = jnp.concatenate([local_states, ident], axis=1)  # (B, nJ+1, 8)
    pad = (-b) % _TILE
    if pad:
        g = jnp.concatenate([g, jnp.broadcast_to(g[:1], (pad,) + g.shape[1:])])
    local_cm = jnp.transpose(g, (2, 1, 0))  # (8, nJ+1, B')
    schedule = skeleton.prefix_schedule or tuple(
        tuple(int(x) for x in lev) for lev in skeleton.prefix_levels())
    out_cm = _fk_pallas_impl(local_cm, schedule)
    out = jnp.transpose(out_cm, (2, 1, 0))[:b, :nj]
    return out


# Differentiable wrapper: primal through the Pallas kernel, tangents through
# the XLA lifted FK (Pallas kernels have no AD rules; the two are numerically
# identical so mixing is sound).
def make_differentiable_fk(skeleton):
    from momentum_tpu.character import fk as _fk

    @jax.custom_jvp
    def fk_fn(local_states):
        return fk_pallas(skeleton, local_states)

    @fk_fn.defjvp
    def fk_fn_jvp(primals, tangents):
        (local,) = primals
        (dlocal,) = tangents
        out, dout = jax.jvp(
            lambda l: _fk.global_skel_states_lifted(skeleton, l), (local,), (dlocal,))
        return out, dout

    return fk_fn
