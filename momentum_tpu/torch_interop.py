"""PyTorch interop — the pymomentum.torch / tensor_momentum parity layer.

The reference exposes torch autograd ops (FK, skinning, parameter transform;
pymomentum/torch/character.py:28-828, tensor_*.cpp). Here the same surface is
backed by the JAX implementations: forward runs the jitted function on
dlpack-shared memory, backward routes through `jax.vjp` inside a
`torch.autograd.Function`, so torch training loops get exact gradients from
the TPU-native kernels without a separate torch implementation.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Skeleton", "LinearBlendSkinning", "ParameterTransformModule",
           "InverseParameterTransformModule", "solve_ik_torch",
           "BlendShapeModule", "ParameterLimitsModule", "SdfColliderModule"]


def _to_jax(t):
    import jax.numpy as jnp

    return jnp.asarray(t.detach().cpu().numpy())


def _to_torch(x, like=None):
    import torch

    out = torch.from_numpy(np.asarray(x).copy())
    if like is not None:
        out = out.to(like.device, like.dtype)
    return out


def _autograd_wrap(jax_fn):
    """Build a torch.autograd.Function around a unary jax function."""
    import jax
    import torch

    class _Fn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, x):
            xj = _to_jax(x)
            y, vjp = jax.vjp(jax_fn, xj)
            ctx.vjp = vjp
            ctx.like = x
            return _to_torch(y, like=x)

        @staticmethod
        def backward(ctx, g):
            (gx,) = ctx.vjp(_to_jax(g))
            return _to_torch(gx, like=ctx.like)

    return _Fn.apply


def _autograd_wrap_n(jax_fn):
    """n-ary variant: every positional arg is a differentiable tensor."""
    import jax
    import torch

    class _Fn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *args):
            aj = tuple(_to_jax(a) for a in args)
            y, vjp = jax.vjp(jax_fn, *aj)
            ctx.vjp = vjp
            ctx.like = args
            return _to_torch(y, like=args[0])

        @staticmethod
        def backward(ctx, g):
            grads = ctx.vjp(_to_jax(g))
            return tuple(_to_torch(gx, like=a)
                         for gx, a in zip(grads, ctx.like))

    return _Fn.apply


class Skeleton:
    """FK module: model or joint parameters → skeleton states (torch in/out).
    Mirrors pymomentum.torch.character.Skeleton (character.py:28-440)."""

    def __init__(self, character):
        import jax

        self.character = character
        self._fk_model = _autograd_wrap(
            jax.jit(lambda mp: character.skeleton_states(mp)))
        from momentum_tpu.character import fk

        self._fk_joint = _autograd_wrap(
            jax.jit(lambda jp: fk.global_skel_states(character.skeleton, jp)))

    def forward(self, model_parameters):
        return self._fk_model(model_parameters)

    __call__ = forward

    def joint_parameters_to_skeleton_state(self, joint_parameters):
        return self._fk_joint(joint_parameters)


class LinearBlendSkinning:
    """Posed mesh vertices from model parameters (torch in/out). Mirrors
    pymomentum.torch.character.LinearBlendSkinning (character.py:442-628)."""

    def __init__(self, character):
        import jax

        from momentum_tpu.compat import skin_points_from_model_parameters

        char = character.with_inverse_bind_pose()
        self.character = char
        self._fn = _autograd_wrap(
            jax.jit(lambda mp: skin_points_from_model_parameters(char, mp)))

    def forward(self, model_parameters):
        return self._fn(model_parameters)

    __call__ = forward


class ParameterTransformModule:
    """model → joint parameters (torch in/out). Mirrors
    pymomentum.torch.character.ParameterTransform (character.py:704)."""

    def __init__(self, character):
        import jax

        self.character = character
        self._fn = _autograd_wrap(
            jax.jit(lambda mp: character.parameter_transform.apply(mp)))

    def forward(self, model_parameters):
        return self._fn(model_parameters)

    __call__ = forward


def solve_ik_torch(build_solver_fn, x0, inputs, options=None,
                   method: str = "gauss_newton"):
    """Torch-autograd IK (tensor_ik parity, tensor_ik.h:20-100 /
    solver_pybind.cpp solve_ik): forward runs the batched IFT solve; backward
    routes dLoss/dθ* into the error-function inputs (targets, weights,
    offsets, ...) via the implicit function theorem.

    build_solver_fn: callable(dict name → jax array) → SkeletonSolverFunction.
    x0: (..., P) torch tensor initial parameters.
    inputs: dict name → torch tensor (the differentiable inputs).
    Returns θ* as a torch tensor; gradients flow to `inputs` and x0.
    """
    import jax
    import torch

    from momentum_tpu.solver.diff_ik import solve_ik_ift
    from momentum_tpu.solver.gauss_newton import SolverOptions

    opts = options or SolverOptions()
    keys = sorted(inputs.keys())

    def jax_solve(x0_j, *vals):
        fn = build_solver_fn(dict(zip(keys, vals)))
        return solve_ik_ift(fn, x0_j, None, opts, method)

    class _SolveIK(torch.autograd.Function):
        @staticmethod
        def forward(ctx, x0_t, *vals_t):
            args = (_to_jax(x0_t),) + tuple(_to_jax(v) for v in vals_t)
            theta, vjp = jax.vjp(jax_solve, *args)
            ctx.vjp = vjp
            ctx.like = (x0_t,) + tuple(vals_t)
            return _to_torch(theta, like=x0_t)

        @staticmethod
        def backward(ctx, g):
            grads = ctx.vjp(_to_jax(g))
            return tuple(_to_torch(gx, like=t)
                         for gx, t in zip(grads, ctx.like))

    return _SolveIK.apply(x0, *(inputs[k] for k in keys))


class InverseParameterTransformModule:
    """joint parameters → model parameters via the pseudo-inverse
    (pymomentum.torch InverseParameterTransform, character.py:759-828;
    inverse_parameter_transform.h)."""

    def __init__(self, character):
        import jax

        pt = character.parameter_transform
        pinv = pt.pinv()
        offsets = pt.offsets

        self._fn = _autograd_wrap(jax.jit(
            lambda jp: (jp - offsets) @ pinv.T))

    def forward(self, joint_parameters):
        return self._fn(joint_parameters)

    __call__ = forward


class BlendShapeModule:
    """Blend-shape coefficients → vertices (torch in/out). Mirrors
    pymomentum.torch.character.BlendShape."""

    def __init__(self, blend_shape):
        import jax

        self.blend_shape = blend_shape
        self._fn = _autograd_wrap(jax.jit(lambda c: blend_shape.apply(c)))

    def forward(self, coefficients):
        return self._fn(coefficients)

    __call__ = forward


class ParameterLimitsModule:
    """Differentiable parameter-limit penalties (torch in/out). Mirrors
    pymomentum/torch/parameter_limits.py: forward() returns the total limit
    error; evaluate_by_type() splits it per record type in the same fixed
    order as the reference's evaluate_*_error methods."""

    _TYPE_ORDER = ("minmax", "minmax_joint", "linear", "linear_joint",
                   "halfplane", "ellipsoid")

    def __init__(self, character, weight: float = 1.0):
        import jax

        from momentum_tpu.errors import LimitErrorFunction
        from momentum_tpu.solver import SkeletonSolverFunction

        self.character = character
        ef = LimitErrorFunction.create(weight=weight)
        fn = SkeletonSolverFunction(character, (ef,))
        self._error = _autograd_wrap(jax.jit(fn.error))

        lim = character.limits
        present = []
        if lim is not None:
            if lim.minmax_index.shape[0]:
                present.append("minmax")
            if lim.minmax_joint_index.shape[0]:
                present.append("minmax_joint")
            if lim.linear_ref.shape[0]:
                present.append("linear")
            if lim.linear_joint_ref.shape[0]:
                present.append("linear_joint")
            if lim.halfplane_idx1.shape[0]:
                present.append("halfplane")
            if lim.ellipsoid_parent.shape[0]:
                present.append("ellipsoid")
        self._present = tuple(present)

        def by_type(mp):
            import jax.numpy as jnp

            from momentum_tpu.errors.limit import K_LIMIT_WEIGHT

            ctx = fn.context(mp)
            pieces = ef._pieces(character, ctx)
            # same scaling as LimitErrorFunction.error: kLimitWeight · weight
            # · Σ w_rec · loss(‖f‖²) (limit_error_function.h:91)
            return jnp.stack([
                K_LIMIT_WEIGHT * ef.weight
                * jnp.sum(w * ef.loss.value(jnp.sum(f * f, axis=-1)), axis=-1)
                for f, w in pieces])

        self._by_type = _autograd_wrap(jax.jit(by_type)) if present else None

    def forward(self, model_parameters):
        return self._error(model_parameters)

    __call__ = forward

    def evaluate_by_type(self, model_parameters) -> dict:
        """dict type-name → weighted squared-residual sum (torch tensors)."""
        if self._by_type is None:
            return {}
        vals = self._by_type(model_parameters)
        return {name: vals[i] for i, name in enumerate(self._present)}


class SdfColliderModule:
    """Differentiable SDF evaluation of world points against a collider
    rigidly attached to a joint (torch in/out). Mirrors
    pymomentum/torch/sdf_collision.py SDFCollider: points are mapped into
    the collider's joint-local frame through the skeleton state, then
    trilinearly sampled; fully autograd-capable through both inputs."""

    def __init__(self, sdf, parent: int = -1):
        import jax

        from momentum_tpu.math import skel_state as _ss

        self.sdf = sdf
        self.parent = parent

        def evaluate(skel_states, points):
            if parent >= 0:
                local = _ss.transform_points(
                    _ss.inverse(skel_states[..., parent, :]), points)
            else:
                local = points
            return sdf.sample(local)

        self._fn = _autograd_wrap_n(jax.jit(evaluate))

    def evaluate(self, skel_states, points):
        return self._fn(skel_states, points)

    __call__ = evaluate


# ---- pymomentum.solver module-level surface (solver_pybind.cpp:158-520) ----

solve_ik = solve_ik_torch  # binding-name alias

_stats = {
    "n_solve_ik": 0, "n_solve_ik_batch": 0,
    "n_gradient": 0, "n_gradient_batch": 0,
}


def residual(build_solver_fn, params, inputs):
    """Weighted residual rows of an IK problem at `params` (torch)
    (solver_pybind.cpp residual)."""
    import torch

    fn = build_solver_fn({k: _to_jax(v) for k, v in inputs.items()})
    return torch.from_numpy(np.asarray(fn.residual(_to_jax(params))).copy())


def gradient(build_solver_fn, params, inputs):
    """dE/dθ of an IK problem at `params` (torch) (solver_pybind gradient)."""
    import jax
    import torch

    fn = build_solver_fn({k: _to_jax(v) for k, v in inputs.items()})
    g = jax.grad(lambda x: fn.error(x).sum())(_to_jax(params))
    _stats["n_gradient"] += 1
    _stats["n_gradient_batch"] += int(np.prod(params.shape[:-1]) or 1)
    return torch.from_numpy(np.asarray(g).copy())


def jacobian(build_solver_fn, params, inputs):
    """(residual, d residual/dθ) of an IK problem at `params` (torch)
    (solver_pybind jacobian)."""
    import torch

    fn = build_solver_fn({k: _to_jax(v) for k, v in inputs.items()})
    rows, j = fn.residual_and_jacobian(_to_jax(params))
    return (torch.from_numpy(np.asarray(rows).copy()),
            torch.from_numpy(np.asarray(j).copy()))


def transform_pose(character, model_params, xform):
    """Rigidly retarget model parameters by a world transform (torch in/out)
    (solver_pybind transform_pose → transform_pose.h:19). `xform` is an
    8-param skel_state or a 4x4 matrix."""
    import torch

    from momentum_tpu.character.transform_pose import (
        transform_pose as _transform_pose)
    from momentum_tpu.math import skel_state as _ss

    xf = _to_jax(xform)
    if xf.shape[-2:] == (4, 4):
        xf = _ss.from_matrix(xf)
    out = _transform_pose(character, _to_jax(model_params), xf)
    return torch.from_numpy(np.asarray(out).copy())


def solve_sequence_ik(build_sequence_fn, per_frame_params, universal_params,
                      inputs, options=None):
    """Sequence IK for torch callers (solver_pybind solve_sequence_ik):
    forward = the banded sequence solve; no backward (matching the
    reference, whose sequence solve is forward-only)."""
    import torch

    from momentum_tpu.sequence.solver import solve_sequence

    fn = build_sequence_fn({k: _to_jax(v) for k, v in inputs.items()})
    res = solve_sequence(fn, _to_jax(per_frame_params),
                         _to_jax(universal_params),
                         options=options) if options is not None else \
        solve_sequence(fn, _to_jax(per_frame_params),
                       _to_jax(universal_params))
    return (torch.from_numpy(np.asarray(res.per_frame).copy()),
            torch.from_numpy(np.asarray(res.universal).copy()))


def get_solve_ik_statistics() -> dict:
    """Global IK call counters (tensor_ik.cpp:178-180 nTotalSolveIK /
    nTotalSolveIKIter analog)."""
    from momentum_tpu.solver.ik import get_solve_counters

    out = dict(get_solve_counters())
    out.update({k: v for k, v in _stats.items() if k.startswith("n_solve")})
    return out


def reset_solve_ik_statistics() -> None:
    from momentum_tpu.solver.ik import reset_solve_counters

    reset_solve_counters()
    _stats["n_solve_ik"] = _stats["n_solve_ik_batch"] = 0


def get_gradient_statistics() -> dict:
    return {k: v for k, v in _stats.items() if "gradient" in k}


def reset_gradient_statistics() -> None:
    _stats["n_gradient"] = _stats["n_gradient_batch"] = 0


def set_num_threads(n: int) -> None:
    """No-op for API parity: the reference sizes its dispenso CPU pool
    (solver_pybind set_num_threads); XLA owns threading here."""
    del n
