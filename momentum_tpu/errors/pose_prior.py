"""MPPCA pose prior (math/mppca.h) and its error function
(character_solver/pose_prior_error_function.{h,cpp}).

Mixture of probabilistic PCA: p(x) = Σ_c π_c N(x | μ_c, C_c) with
C_c = W_c·W_cᵀ + σ_c²·I. Precomputed per component (mppca.h:40-59):
    Cinv_c, Rpre_c = log π_c − ½ log|C_c| − (d/2) log 2π, and a factor L_c
    with L_cᵀ·L_c = C_c⁻¹ used for GN whitening.

The error function follows the reference's best-component approximation
(pose_prior_error_function.cpp:111-114,218-249): pick the component maximizing
R_c = Rpre_c − ½ d_cᵀ·Cinv_c·d_c; then
    error     = weight · kPosePriorWeight · ½ d*ᵀ·Cinv*·d*       (.cpp:179)
    residual  = sqrt(½·weight·kPosePriorWeight) · L*·d*          (.cpp:181-187)
with kPosePriorWeight = 1e-3 (pose_prior_error_function.h:73). The argmax is
trace-safe (jnp.argmax + take); AD flows only through the selected component,
matching the reference's frozen-selection Jacobian.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import ErrorFunction, EvalContext

__all__ = ["Mppca", "PosePriorErrorFunction", "K_POSE_PRIOR_WEIGHT"]

K_POSE_PRIOR_WEIGHT = 1e-3  # pose_prior_error_function.h:73


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Mppca:
    """Precomputed MPPCA mixture (K components over d dims)."""

    mu: jnp.ndarray  # (K, d)
    cinv: jnp.ndarray  # (K, d, d)
    l: jnp.ndarray  # (K, d, d), LᵀL = Cinv
    rpre: jnp.ndarray  # (K,)
    names: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def num_components(self) -> int:
        return self.mu.shape[0]

    @property
    def dim(self) -> int:
        return self.mu.shape[1]

    @classmethod
    def from_components(cls, pi, mu, w_list, sigma2, names=()):
        """Build from raw mixture parameters (mppca.h set(), mppca.cpp)."""
        pi = np.asarray(pi, np.float64)
        mu = np.asarray(mu, np.float64)
        sigma2 = np.asarray(sigma2, np.float64)
        k, d = mu.shape
        cinv = np.zeros((k, d, d))
        l = np.zeros((k, d, d))
        rpre = np.zeros(k)
        for c in range(k):
            w = np.asarray(w_list[c], np.float64).reshape(d, -1)
            cov = w @ w.T + sigma2[c] * np.eye(d)
            cinv[c] = np.linalg.inv(cov)
            # lower Cholesky of Cinv: Cinv = G·Gᵀ; rows L = Gᵀ give LᵀL = ... use L = Gᵀ
            g = np.linalg.cholesky(cinv[c])
            l[c] = g.T  # L·x whitening; LᵀL = G·Gᵀ = Cinv
            sign, logdet = np.linalg.slogdet(cov)
            rpre[c] = math.log(max(pi[c], 1e-300)) - 0.5 * logdet - 0.5 * d * math.log(2 * math.pi)
        return cls(
            mu=jnp.asarray(mu, jnp.float32),
            cinv=jnp.asarray(cinv, jnp.float32),
            l=jnp.asarray(l, jnp.float32),
            rpre=jnp.asarray(rpre, jnp.float32),
            names=tuple(names),
        )

    def log_probability(self, x: jnp.ndarray) -> jnp.ndarray:
        """Best-component log-likelihood R* (reference logProbability returns
        −minDist, i.e. without the Rpre constant; this returns max_c R_c)."""
        diff = x[..., None, :] - self.mu
        sq = 0.5 * jnp.einsum("...kd,kde,...ke->...k", diff, self.cinv, diff)
        return jnp.max(self.rpre - sq, axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PosePriorErrorFunction(ErrorFunction):
    prior: Mppca
    weight: jnp.ndarray
    # pose-prior dim -> model parameter index (−1 = unmapped, reads 0.0);
    # mirrors ppMap_ built by name matching (pose_prior_error_function.cpp:41-54)
    param_index: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # Precomputed Sᵀ·Cinv_k·S (K, P, P) for the normal-equation fast path:
    # the Jacobian J = coef·L_k·S is CONSTANT per selected mode, so JᵀJ is a
    # gather instead of a (rows × P) contraction. Built by create(); None when
    # constructed directly (falls back to dense rows).
    sub_jtj: jnp.ndarray | None = None

    def _sub_params(self, model_params: jnp.ndarray) -> jnp.ndarray:
        idx = np.asarray(self.param_index, np.int64)
        gathered = jnp.take(model_params, jnp.asarray(np.maximum(idx, 0)), axis=-1)
        return jnp.where(jnp.asarray(idx >= 0), gathered, 0.0)

    def _best(self, model_params):
        x = self._sub_params(model_params)
        diff = x[..., None, :] - self.prior.mu  # (K, d)
        sq = 0.5 * jnp.einsum("...kd,kde,...ke->...k", diff, self.prior.cinv, diff)
        best = jnp.argmax(self.prior.rpre - sq, axis=-1)
        d_best = jnp.take_along_axis(diff, best[..., None, None], axis=-2)[..., 0, :]
        sq_best = jnp.take_along_axis(sq, best[..., None], axis=-1)[..., 0]
        return best, d_best, sq_best

    def error(self, character, ctx: EvalContext) -> jnp.ndarray:
        _, _, sq_best = self._best(ctx.model_params)
        return self.weight * K_POSE_PRIOR_WEIGHT * sq_best

    def residual(self, character, ctx: EvalContext) -> jnp.ndarray:
        best, d_best, _ = self._best(ctx.model_params)
        l_best = jnp.take(self.prior.l, best, axis=0)
        rows = jnp.einsum("...de,...e->...d", l_best, d_best)
        return jnp.sqrt(0.5 * K_POSE_PRIOR_WEIGHT * self.weight) * rows

    def num_rows(self) -> int:
        return self.prior.dim

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """rows = √(½kW·w)·L*·d*, J_model = √(½kW·w)·L*·S with S the
        static dim→parameter selection (pose_prior_error_function.cpp:181-195)."""
        best, d_best, _ = self._best(ctx.model_params)
        l_best = jnp.take(self.prior.l, best, axis=0)
        coef = jnp.sqrt(0.5 * K_POSE_PRIOR_WEIGHT * self.weight)
        rows = coef * jnp.einsum("...de,...e->...d", l_best, d_best)
        idx = np.asarray(self.param_index, np.int64)
        sel = np.zeros((self.prior.dim, ctx.model_params.shape[-1]), np.float32)
        valid = idx >= 0
        sel[np.arange(self.prior.dim)[valid], idx[valid]] = 1.0
        j_model = coef * jnp.einsum("...de,ep->...dp", l_best, jnp.asarray(sel))
        return rows, None, j_model

    @property
    def has_normal_contrib(self) -> bool:
        return self.sub_jtj is not None

    def accumulate_normal(self, character, ctx: EvalContext, jc, pt_mat, acc,
                          mxu_dtype=None):
        """Direct JᵀJ/Jᵀr/Σr² contribution: with J = coef·L*·S constant per
        selected mode, JᵀJ = coef²·SᵀCinv*S is one gather from the precomputed
        per-mode table and Jᵀr = coef²·Sᵀ(Cinv*·d*) a (d→P) scatter — no
        prior rows ever enter the dense Jacobian."""
        jtj, jtr, sq = acc
        best, d_best, sq_best = self._best(ctx.model_params)
        coef2 = 0.5 * K_POSE_PRIOR_WEIGHT * self.weight
        jtj = jtj + coef2 * jnp.take(self.sub_jtj, best, axis=0)
        cinv_best = jnp.take(self.prior.cinv, best, axis=0)
        cinvd = jnp.einsum("...de,...e->...d", cinv_best, d_best)
        idx = np.asarray(self.param_index, np.int64)
        sel = np.zeros((self.prior.dim, ctx.model_params.shape[-1]), np.float32)
        valid = idx >= 0
        sel[np.arange(self.prior.dim)[valid], idx[valid]] = 1.0
        jtr = jtr + coef2 * jnp.einsum("...d,dp->...p", cinvd, jnp.asarray(sel))
        # Σ rows² = coef²·d*ᵀCinv*d* = 2·coef²·sq_best (== the exact energy)
        sq = sq + 2.0 * coef2 * sq_best
        return jtj, jtr, sq

    @classmethod
    def create(cls, prior: Mppca, parameter_names, weight=1.0):
        """Map prior dims onto model parameters by name (loadInternal,
        pose_prior_error_function.cpp:41-54)."""
        name_to_idx = {n: i for i, n in enumerate(parameter_names)}
        idx = tuple(name_to_idx.get(n, -1) for n in prior.names) if prior.names else \
            tuple(range(prior.dim))
        p = len(parameter_names)
        idx_np = np.asarray(idx, np.int64)
        sel = np.zeros((prior.dim, p), np.float32)
        valid = idx_np >= 0
        sel[np.arange(prior.dim)[valid], idx_np[valid]] = 1.0
        cinv = np.asarray(prior.cinv, np.float64)
        sub_jtj = np.einsum("dp,kde,eq->kpq", sel, cinv, sel)
        return cls(prior=prior, weight=jnp.asarray(weight, jnp.float32),
                   param_index=idx,
                   sub_jtj=jnp.asarray(sub_jtj, jnp.float32))


def _mppca_get_mixture(self, i_model: int):
    """Recover the raw mixture parameters (pi, mu, W, sigma2) of component
    `i_model` from the stored covariance (pymomentum Mppca.get_mixture,
    momentum_geometry.cpp:526-583): eigendecompose Cinv, read sigma² off the
    smallest covariance eigenvalue, rebuild W columns from the remainder,
    and invert the Rpre precomputation for pi."""
    if not (0 <= i_model < self.num_components):
        raise IndexError(f"component {i_model} out of range")
    cinv = np.asarray(self.cinv[i_model], np.float64)
    d = cinv.shape[0]
    evals_inv, evecs = np.linalg.eigh(cinv)  # ascending in Cinv
    c_eigs = 1.0 / evals_inv  # descending covariance eigenvalues
    sigma2 = float(c_eigs[-1])
    lam = c_eigs - sigma2
    rank = d
    for k in range(d):
        if lam[k] < 1e-4:
            rank = k
            break
    w = evecs[:, :rank] * np.sqrt(np.maximum(lam[:rank], 0.0))[None, :]
    c_logdet = float(-np.sum(np.log(evals_inv)))
    log_pi = (float(self.rpre[i_model]) + 0.5 * c_logdet
              + 0.5 * d * np.log(2.0 * np.pi))
    return float(np.exp(log_pi)), np.asarray(self.mu[i_model]), w, sigma2


def _mppca_save(self, path) -> None:
    """Write the .mppca binary (pymomentum Mppca.save)."""
    from momentum_tpu.io.pose_prior import save_mppca

    save_mppca(path, self)


def _mppca_to_bytes(self) -> bytes:
    import os
    import tempfile

    from momentum_tpu.io.pose_prior import save_mppca

    fd, tmp = tempfile.mkstemp(suffix=".mppca")
    os.close(fd)
    try:
        save_mppca(tmp, self)
        with open(tmp, "rb") as f:
            return f.read()
    finally:
        os.unlink(tmp)


def _mppca_load(cls, path) -> "Mppca":
    from momentum_tpu.io.pose_prior import load_mppca

    return load_mppca(path)


def _mppca_from_bytes(cls, data: bytes) -> "Mppca":
    import os
    import tempfile

    from momentum_tpu.io.pose_prior import load_mppca

    fd, tmp = tempfile.mkstemp(suffix=".mppca")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            f.write(bytes(data))
        return load_mppca(tmp)
    finally:
        os.unlink(tmp)


Mppca.get_mixture = _mppca_get_mixture
Mppca.save = _mppca_save
Mppca.to_bytes = _mppca_to_bytes
Mppca.load = classmethod(_mppca_load)
Mppca.from_bytes = classmethod(_mppca_from_bytes)
