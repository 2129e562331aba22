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

import os as _os

import jax as _jax

# IK demands f32-accurate linear algebra: on TPU the default matmul precision
# is bf16 (1 MXU pass), which stalls Gauss-Newton convergence around 1e-2 and
# can NaN the Cholesky. The reference solves in full f32/f64 (Eigen);
# measurements on v5e show "highest" costs little here because solver matmuls
# are small and latency-bound. Override with MOMENTUM_TPU_MATMUL_PRECISION.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("MOMENTUM_TPU_MATMUL_PRECISION", "highest"),
)

# Persistent compilation cache (opt-in): TPU solver programs take minutes to
# compile, and a cache makes repeat runs near-instant — but XLA:CPU AOT
# artifacts are machine-feature-specific (a cache written on one host can
# SIGILL on another), and remote-compile TPU plugins bypass the cache anyway.
# Enable explicitly with MOMENTUM_TPU_COMPILE_CACHE=1 or the standard
# JAX_COMPILATION_CACHE_DIR.
if _os.environ.get("MOMENTUM_TPU_COMPILE_CACHE") and \
        not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache = _os.path.expanduser("~/.cache/momentum_tpu_jax")
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from momentum_tpu.math import quaternion, skel_state  # noqa: F401
