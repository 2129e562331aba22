"""momentum_tpu — a TPU-native (JAX/XLA/Pallas/pjit) batched human-kinematics and
nonlinear-least-squares IK framework with the capabilities of
facebookresearch/momentum (reference: /root/reference).

Design: frozen pytree dataclasses for the character model, pure jittable
functions for FK/LBS/residuals, fused Gauss-Newton/Levenberg-Marquardt loops
under `lax.while_loop`, `vmap` for batch IK, `shard_map` over a device mesh for
sequence solves, `custom_vjp` (implicit function theorem) for differentiable IK.
Static shapes with validity masks replace the reference's dynamic sparsity
(bitsets, per-joint constraint lists).
"""

__version__ = "0.1.0"

from momentum_tpu.math import quaternion, skel_state  # noqa: F401
