"""Parameter limits as padded per-type arrays (static shapes, weight-0 padding).

The reference stores limits as a tagged-union list (parameter_limits.h:20-138,
types: MinMax, MinMaxJoint(+Passive), Linear, LinearJoint, Ellipsoid,
HalfPlane). The TPU layout groups records by type into fixed arrays; absent
records are padded with weight 0 so every evaluation is dense masked math.

Residual/penalty semantics (used by LimitErrorFunction,
character_solver/limit_error_function.cpp): for each record the violation
v(θ) is 0 inside the feasible region and linear outside; the error term is
w_rec · v² (scaled by the error function's global weight).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ParameterLimits", "make_empty_limits"]


def _f(x, dtype=jnp.float32):
    return jnp.asarray(x, dtype)


def _i(x):
    return jnp.asarray(x, jnp.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParameterLimits:
    """Padded per-type limit tables. All arrays have a static leading count.

    minmax:        over model parameters — index (M,), bounds (M,2), weight (M,)
    minmax_joint:  over joint parameters — flat joint-param index (MJ,), bounds
                   (MJ,2), weight (MJ,), passive flag (MJ,) (passive records are
                   clamped pre-FK, not penalized: parameter_limits.h:141-144)
    linear:        p_ref = s·p_tgt − o, applies when p_tgt ∈ [range_min, range_max)
                   (parameter_limits.h:46-57): ref_idx, tgt_idx (L,), scale,
                   offset, range_min, range_max, weight (L,)
    linear_joint:  same over flat joint-param indices (LJ,)
    halfplane:     (p1, p2)·n − o ≥ 0 (parameter_limits.h:86-92): idx1, idx2
                   (H,), normal (H,2), offset (H,), weight (H,)
    ellipsoid:     point (offset in `parent` frame) constrained to an ellipsoid
                   surface in `ellipsoid_parent` frame (parameter_limits.h:75-84):
                   parent (E,), ellipsoid_parent (E,), offset (E,3),
                   ellipsoid (E,4,4), ellipsoid_inv (E,4,4), weight (E,)
    """

    minmax_index: jnp.ndarray
    minmax_bounds: jnp.ndarray
    minmax_weight: jnp.ndarray

    minmax_joint_index: jnp.ndarray
    minmax_joint_bounds: jnp.ndarray
    minmax_joint_weight: jnp.ndarray
    minmax_joint_passive: jnp.ndarray

    linear_ref: jnp.ndarray
    linear_tgt: jnp.ndarray
    linear_scale: jnp.ndarray
    linear_offset: jnp.ndarray
    linear_range: jnp.ndarray  # (L, 2) [min, max)
    linear_weight: jnp.ndarray

    linear_joint_ref: jnp.ndarray
    linear_joint_tgt: jnp.ndarray
    linear_joint_scale: jnp.ndarray
    linear_joint_offset: jnp.ndarray
    linear_joint_range: jnp.ndarray
    linear_joint_weight: jnp.ndarray

    halfplane_idx1: jnp.ndarray
    halfplane_idx2: jnp.ndarray
    halfplane_normal: jnp.ndarray
    halfplane_offset: jnp.ndarray
    halfplane_weight: jnp.ndarray

    ellipsoid_parent: jnp.ndarray
    ellipsoid_frame_parent: jnp.ndarray
    ellipsoid_point_offset: jnp.ndarray
    ellipsoid_mat: jnp.ndarray
    ellipsoid_inv: jnp.ndarray
    ellipsoid_weight: jnp.ndarray

    @property
    def counts(self):
        return dict(
            minmax=self.minmax_index.shape[0],
            minmax_joint=self.minmax_joint_index.shape[0],
            linear=self.linear_ref.shape[0],
            linear_joint=self.linear_joint_ref.shape[0],
            halfplane=self.halfplane_idx1.shape[0],
            ellipsoid=self.ellipsoid_parent.shape[0],
        )

    def apply_passive(self, joint_params: jnp.ndarray) -> jnp.ndarray:
        """Clamp joint params for passive MinMaxJoint records
        (applyPassiveJointParameterLimits, parameter_limits.h:141-144)."""
        if self.minmax_joint_index.shape[0] == 0:
            return joint_params
        idx = self.minmax_joint_index
        vals = jnp.take(joint_params, idx, axis=-1)
        lo = self.minmax_joint_bounds[:, 0]
        hi = self.minmax_joint_bounds[:, 1]
        active = (self.minmax_joint_passive > 0) & (self.minmax_joint_weight > 0)
        clamped = jnp.where(active, jnp.clip(vals, lo, hi), vals)
        # scatter back (duplicate indices: last write wins; the reference's
        # sequential clamp has the same property)
        return joint_params.at[..., idx].set(clamped)


def make_limits(
    minmax=None,  # list of (param_index, lo, hi, weight)
    minmax_joint=None,  # list of (joint_index, joint_param, lo, hi, weight, passive)
    linear=None,  # list of (ref_idx, tgt_idx, scale, offset, range_min, range_max, weight)
    linear_joint=None,  # list of (ref_flat_idx, tgt_flat_idx, scale, offset, rmin, rmax, weight)
    halfplane=None,  # list of (idx1, idx2, nx, ny, offset, weight)
    ellipsoid=None,  # list of (parent, ellipsoid_parent, offset3, mat4x4, weight)
) -> ParameterLimits:
    minmax = minmax or []
    minmax_joint = minmax_joint or []
    linear = linear or []
    linear_joint = linear_joint or []
    halfplane = halfplane or []
    ellipsoid = ellipsoid or []

    def arr(rows, cols, dtype=np.float32):
        return np.asarray(rows, dtype).reshape(len(rows), cols) if rows else np.zeros((0, cols), dtype)

    mm = arr(minmax, 4)
    mj = arr(minmax_joint, 6)
    li = arr(linear, 7)
    lj = arr(linear_joint, 7)
    hp = arr(halfplane, 6)

    e_parent = _i([e[0] for e in ellipsoid]) if ellipsoid else _i(np.zeros(0))
    e_eparent = _i([e[1] for e in ellipsoid]) if ellipsoid else _i(np.zeros(0))
    e_off = _f([e[2] for e in ellipsoid]) if ellipsoid else _f(np.zeros((0, 3)))
    e_mat = _f([e[3] for e in ellipsoid]) if ellipsoid else _f(np.zeros((0, 4, 4)))
    e_inv = _f([np.linalg.inv(np.asarray(e[3])) for e in ellipsoid]) if ellipsoid else _f(np.zeros((0, 4, 4)))
    e_w = _f([e[4] for e in ellipsoid]) if ellipsoid else _f(np.zeros(0))

    jp_flat = lambda j, p: int(j) * 7 + int(p)  # noqa: E731

    return ParameterLimits(
        minmax_index=_i(mm[:, 0]),
        minmax_bounds=_f(mm[:, 1:3]),
        minmax_weight=_f(mm[:, 3]),
        minmax_joint_index=_i([jp_flat(r[0], r[1]) for r in minmax_joint] if minmax_joint else np.zeros(0)),
        minmax_joint_bounds=_f(mj[:, 2:4]),
        minmax_joint_weight=_f(mj[:, 4]),
        minmax_joint_passive=_f(mj[:, 5]),
        linear_ref=_i(li[:, 0]),
        linear_tgt=_i(li[:, 1]),
        linear_scale=_f(li[:, 2]),
        linear_offset=_f(li[:, 3]),
        linear_range=_f(li[:, 4:6]),
        linear_weight=_f(li[:, 6]),
        linear_joint_ref=_i(lj[:, 0]),
        linear_joint_tgt=_i(lj[:, 1]),
        linear_joint_scale=_f(lj[:, 2]),
        linear_joint_offset=_f(lj[:, 3]),
        linear_joint_range=_f(lj[:, 4:6]),
        linear_joint_weight=_f(lj[:, 6]),
        halfplane_idx1=_i(hp[:, 0]),
        halfplane_idx2=_i(hp[:, 1]),
        halfplane_normal=_f(hp[:, 2:4]),
        halfplane_offset=_f(hp[:, 4]),
        halfplane_weight=_f(hp[:, 5]),
        ellipsoid_parent=e_parent,
        ellipsoid_frame_parent=e_eparent,
        ellipsoid_point_offset=e_off,
        ellipsoid_mat=e_mat,
        ellipsoid_inv=e_inv,
        ellipsoid_weight=e_w,
    )


def make_empty_limits() -> ParameterLimits:
    return make_limits()


def remap_limits_model_parameters(limits: ParameterLimits, keep) -> ParameterLimits:
    """Remap model-parameter-indexed limit records after a parameter subset
    (parameter_transform.cpp subsetParameterTransform's limit remap): records
    whose parameters were dropped get weight 0; kept indices are renumbered."""
    import dataclasses as _dc

    import numpy as np

    keep = np.asarray(keep, bool)
    old_to_new = np.full(keep.shape[0], 0, np.int64)
    old_to_new[keep] = np.arange(int(keep.sum()))

    def remap(idx, *weights):
        idx = np.asarray(idx)
        ok = keep[np.clip(idx, 0, keep.shape[0] - 1)]
        new_idx = old_to_new[np.clip(idx, 0, keep.shape[0] - 1)]
        outs = [np.where(ok, new_idx, 0).astype(np.int32)]
        for w in weights:
            outs.append(np.where(ok, np.asarray(w), 0.0).astype(np.float32))
        return outs

    mm_idx, mm_w = remap(limits.minmax_index, limits.minmax_weight)
    lr, lw = remap(limits.linear_ref, limits.linear_weight)
    lt, lw2 = remap(limits.linear_tgt, lw)
    h1, hw = remap(limits.halfplane_idx1, limits.halfplane_weight)
    h2, hw2 = remap(limits.halfplane_idx2, hw)
    return _dc.replace(
        limits,
        minmax_index=jnp.asarray(mm_idx), minmax_weight=jnp.asarray(mm_w),
        linear_ref=jnp.asarray(lr), linear_tgt=jnp.asarray(lt),
        linear_weight=jnp.asarray(lw2),
        halfplane_idx1=jnp.asarray(h1), halfplane_idx2=jnp.asarray(h2),
        halfplane_weight=jnp.asarray(hw2),
    )


def map_limits(limits: ParameterLimits, joint_map, param_map) -> ParameterLimits:
    """Remap limit records through a joint mapping and a model-parameter
    mapping, dropping records whose indices map to nothing — the reference's
    mapParameterLimits (character_utility.cpp:193-254). `joint_map` and
    `param_map` are old→new index arrays with -1 for dropped entries.
    MinMaxJoint/LinearJoint flat joint-param indices remap through
    `joint_map` on their joint part (the reference routes LinearJoint through
    the parameter mapping, which its own storage contradicts; we remap the
    joint index the record actually holds)."""
    import numpy as np

    joint_map = np.asarray(joint_map, np.int64)
    param_map = np.asarray(param_map, np.int64)

    def _np(x):
        return np.asarray(x)

    def filt(keep, **named):
        return {k: v[keep] for k, v in named.items()}

    out = {}

    # minmax: model-parameter indexed
    mm = _np(limits.minmax_index)
    mapped = param_map[mm] if mm.size else mm
    keep = mapped >= 0 if mm.size else np.zeros(0, bool)
    out.update(
        minmax_index=mapped[keep].astype(np.int32),
        minmax_bounds=_np(limits.minmax_bounds)[keep],
        minmax_weight=_np(limits.minmax_weight)[keep])

    # minmax_joint: flat joint-param indexed
    mj = _np(limits.minmax_joint_index)
    jmapped = (joint_map[mj // 7] * 7 + mj % 7) if mj.size else mj
    keep = (joint_map[mj // 7] >= 0) if mj.size else np.zeros(0, bool)
    out.update(
        minmax_joint_index=jmapped[keep].astype(np.int32),
        minmax_joint_bounds=_np(limits.minmax_joint_bounds)[keep],
        minmax_joint_weight=_np(limits.minmax_joint_weight)[keep],
        minmax_joint_passive=_np(limits.minmax_joint_passive)[keep])

    # linear: model-parameter indexed pair
    lr, lt = _np(limits.linear_ref), _np(limits.linear_tgt)
    if lr.size:
        mr, mt2 = param_map[lr], param_map[lt]
        keep = (mr >= 0) & (mt2 >= 0)
    else:
        mr = mt2 = lr
        keep = np.zeros(0, bool)
    out.update(
        linear_ref=mr[keep].astype(np.int32),
        linear_tgt=mt2[keep].astype(np.int32),
        linear_scale=_np(limits.linear_scale)[keep],
        linear_offset=_np(limits.linear_offset)[keep],
        linear_range=_np(limits.linear_range)[keep],
        linear_weight=_np(limits.linear_weight)[keep])

    # linear_joint: flat joint-param indexed pair
    ljr, ljt = _np(limits.linear_joint_ref), _np(limits.linear_joint_tgt)
    if ljr.size:
        mjr = joint_map[ljr // 7] * 7 + ljr % 7
        mjt = joint_map[ljt // 7] * 7 + ljt % 7
        keep = (joint_map[ljr // 7] >= 0) & (joint_map[ljt // 7] >= 0)
    else:
        mjr = mjt = ljr
        keep = np.zeros(0, bool)
    out.update(
        linear_joint_ref=mjr[keep].astype(np.int32),
        linear_joint_tgt=mjt[keep].astype(np.int32),
        linear_joint_scale=_np(limits.linear_joint_scale)[keep],
        linear_joint_offset=_np(limits.linear_joint_offset)[keep],
        linear_joint_range=_np(limits.linear_joint_range)[keep],
        linear_joint_weight=_np(limits.linear_joint_weight)[keep])

    # halfplane: model-parameter indexed pair
    h1, h2 = _np(limits.halfplane_idx1), _np(limits.halfplane_idx2)
    if h1.size:
        m1, m2 = param_map[h1], param_map[h2]
        keep = (m1 >= 0) & (m2 >= 0)
    else:
        m1 = m2 = h1
        keep = np.zeros(0, bool)
    out.update(
        halfplane_idx1=m1[keep].astype(np.int32),
        halfplane_idx2=m2[keep].astype(np.int32),
        halfplane_normal=_np(limits.halfplane_normal)[keep],
        halfplane_offset=_np(limits.halfplane_offset)[keep],
        halfplane_weight=_np(limits.halfplane_weight)[keep])

    # ellipsoid: joint indexed pair
    ep, ef = _np(limits.ellipsoid_parent), _np(limits.ellipsoid_frame_parent)
    if ep.size:
        mp_, mf = joint_map[ep], joint_map[ef]
        keep = (mp_ >= 0) & (mf >= 0)
    else:
        mp_ = mf = ep
        keep = np.zeros(0, bool)
    out.update(
        ellipsoid_parent=mp_[keep].astype(np.int32),
        ellipsoid_frame_parent=mf[keep].astype(np.int32),
        ellipsoid_point_offset=_np(limits.ellipsoid_point_offset)[keep],
        ellipsoid_mat=_np(limits.ellipsoid_mat)[keep],
        ellipsoid_inv=_np(limits.ellipsoid_inv)[keep],
        ellipsoid_weight=_np(limits.ellipsoid_weight)[keep])

    import dataclasses as _dc

    return _dc.replace(limits, **{k: jnp.asarray(v) for k, v in out.items()})


def concat_limits(a: ParameterLimits, b: ParameterLimits) -> ParameterLimits:
    """Concatenate two limit tables record-wise (the reference's mergeVectors
    over ParameterLimits, character_utility.cpp:274-280)."""
    import dataclasses as _dc

    import numpy as np

    out = {}
    for f in _dc.fields(ParameterLimits):
        va, vb = np.asarray(getattr(a, f.name)), np.asarray(getattr(b, f.name))
        out[f.name] = jnp.asarray(np.concatenate([va, vb], axis=0))
    return ParameterLimits(**out)


# ---- single-record constructors (pymomentum ParameterLimit.create_*
# static methods, limit_pybind.cpp:165-336). Each returns a one-record
# ParameterLimits table; combine with concat_limits. ----

_FMAX = 3.0e38


def create_minmax(model_parameter_index: int, min: float, max: float,
                  weight: float = 1.0) -> ParameterLimits:
    return make_limits(minmax=[(model_parameter_index, min, max, weight)])


def create_minmax_joint(joint_index: int, joint_parameter: int, min: float,
                        max: float, weight: float = 1.0,
                        passive: bool = False) -> ParameterLimits:
    return make_limits(minmax_joint=[
        (joint_index, joint_parameter, min, max, weight, float(passive))])


def create_linear(reference_model_parameter_index: int,
                  target_model_parameter_index: int, scale: float,
                  offset: float, weight: float = 1.0,
                  range_min: float | None = None,
                  range_max: float | None = None) -> ParameterLimits:
    """p_ref = scale·p_tgt − offset over [range_min, range_max)
    (limit_pybind.cpp:208-241)."""
    return make_limits(linear=[(
        reference_model_parameter_index, target_model_parameter_index,
        scale, offset,
        -_FMAX if range_min is None else range_min,
        _FMAX if range_max is None else range_max, weight)])


def create_linear_joint(reference_joint_index: int,
                        reference_joint_parameter: int,
                        target_joint_index: int,
                        target_joint_parameter: int, scale: float,
                        offset: float, weight: float = 1.0) -> ParameterLimits:
    ref = reference_joint_index * 7 + reference_joint_parameter
    tgt = target_joint_index * 7 + target_joint_parameter
    return make_limits(linear_joint=[
        (ref, tgt, scale, offset, -_FMAX, _FMAX, weight)])


def create_halfplane(param1_index: int, param2_index: int, normal,
                     offset: float = 0.0, weight: float = 1.0) -> ParameterLimits:
    import numpy as np

    n = np.asarray(normal, np.float32).reshape(2)
    return make_limits(halfplane=[
        (param1_index, param2_index, n[0], n[1], offset, weight)])


def create_ellipsoid(ellipsoid_parent: int, parent: int, offset, ellipsoid,
                     weight: float = 1.0) -> ParameterLimits:
    return make_limits(ellipsoid=[
        (parent, ellipsoid_parent, offset, ellipsoid, weight)])
