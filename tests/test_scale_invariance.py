"""Unit-scale invariance of the sequence/refine solver (VERDICT r3 #4).

The round-3 equilibration guards were sized against one mm-scale clip; this
test proves the refine solve is invariant to the DATA's length unit: the same
synthetic clip expressed in meters, millimeters, and kilometers (character
geometry, marker positions, and translational parameters all scaled) must
converge to the same marker error after un-scaling. The f64 default makes
this hold tightly; the f32 fallback (equilibrated jitter) is checked at a
looser bar on the well-conditioned synthetic clip.

Reference semantics: sequence_cholesky_solver.h:31-33 (double-precision
normal equations); character_utility.cpp scaleCharacter.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.character.utility import scale_character
from momentum_tpu.testing.fixtures import create_test_character
from momentum_tpu.tracking import MarkerSequence, refine_motion
from momentum_tpu.tracking.config import RefineConfig

TRANS_PARAMS = (0, 1, 2)  # root_tx/ty/tz in the fixture's transform
FRAMES = 6


def _base_problem(rng):
    char = create_test_character(6)
    p = char.num_model_parameters
    t = np.linspace(0, 1, FRAMES)[:, None]
    phase = rng.uniform(0, 2 * np.pi, p)
    amp = rng.uniform(0.05, 0.3, p)
    thetas = amp * np.sin(2 * np.pi * t + phase)
    thetas[:, 0] = np.clip(thetas[:, 0], -0.09, 0.09)
    thetas[:, char.parameter_transform.parameter_index("scale_global")] = 0.0
    noise = rng.normal(0, 0.05, thetas.shape)
    return char, thetas.astype(np.float32), noise.astype(np.float32)


def _unit_convert(char, sigma):
    """Fully unit-convert a character: geometry via scale_character (which,
    matching the reference, scales only world-space lengths — ellipsoid
    limits, offsets, mesh), plus the model-parameter-space pieces the
    reference leaves to the config owner: MinMax bounds on translational
    parameters (character_utility.cpp:69-80 deliberately skips these)."""
    char_s = scale_character(char, sigma)
    lim = char_s.limits
    if lim is not None and lim.minmax_index.shape[0] > 0:
        idx = np.asarray(lim.minmax_index)
        is_trans = np.isin(idx, TRANS_PARAMS)
        # unit-converting the whole objective multiplies every ENERGY term
        # by sigma² (marker residuals are lengths). Translational bound
        # violations are lengths too — scale the bounds, keep the weight;
        # rotational violations are radians (invariant) — scale the weight
        # by sigma² so the limit/marker tradeoff is unchanged.
        char_s = dataclasses.replace(char_s, limits=dataclasses.replace(
            lim,
            minmax_bounds=lim.minmax_bounds
            * np.where(is_trans, sigma, 1.0)[:, None],
            minmax_weight=lim.minmax_weight
            * np.where(is_trans, 1.0, sigma ** 2)))
    return char_s


def _scaled_run(char, thetas, noise, sigma, f64):
    """Express the problem in units scaled by `sigma` and refine."""
    char_s = _unit_convert(char, sigma)
    thetas_s = thetas.copy()
    noise_s = noise.copy()
    for i in TRANS_PARAMS:
        thetas_s[:, i] *= sigma
        noise_s[:, i] *= sigma
    thetas_s = jnp.asarray(thetas_s)
    states = jax.vmap(char_s.skeleton_states)(thetas_s)
    positions = jax.vmap(char_s.locators.world_positions)(states)
    markers = MarkerSequence(
        positions=positions,
        occluded=jnp.zeros(positions.shape[:2], bool),
        names=tuple(char_s.locators.names))
    noisy = thetas_s + jnp.asarray(noise_s)
    # unit-consistent smoothing: marker residuals scale by sigma, so every
    # smoothing residual (pweight·Δparam) must too. Translational Δparam
    # already carries sigma (pweight 1); rotational Δparam is radians, so
    # its pweight carries sigma explicitly.
    pweight = np.full(char.num_model_parameters, sigma, np.float32)
    pweight[list(TRANS_PARAMS)] = 1.0
    # Tikhonov energy is reg·‖Δp‖²; for the sigma²-scaled objective the
    # reg follows sigma² too (exact for the rotation block that dominates
    # conditioning; the invariant-diag translation block sees reg as a
    # ≤1e-8-relative perturbation at every tested scale)
    cfg = RefineConfig(max_iter=15, regularization=1e-7 * sigma ** 2,
                       regularizer=0.0, smoothing=1e-6,
                       smoothing_weights=tuple(pweight), f64=f64)
    refined, _ = refine_motion(char_s, markers, noisy, cfg)
    st = jax.vmap(char_s.skeleton_states)(refined.motion)
    pos = jax.vmap(char_s.locators.world_positions)(st)
    # RMS marker error expressed back in the BASE unit
    return float(jnp.sqrt(jnp.mean(jnp.sum(
        (pos - markers.positions) ** 2, axis=-1)))) / sigma


def test_marker_positions_scale_exactly():
    """FK itself is unit-covariant: scaling geometry + translations by sigma
    scales every marker position by sigma."""
    rng = np.random.default_rng(12345)
    char, thetas, _ = _base_problem(rng)
    base = jax.vmap(char.skeleton_states)(jnp.asarray(thetas))
    base_pos = jax.vmap(char.locators.world_positions)(base)
    sigma = 1000.0
    char_s = scale_character(char, sigma)
    th = thetas.copy()
    for i in TRANS_PARAMS:
        th[:, i] *= sigma
    st = jax.vmap(char_s.skeleton_states)(jnp.asarray(th))
    pos = jax.vmap(char_s.locators.world_positions)(st)
    np.testing.assert_allclose(np.asarray(pos) / sigma, np.asarray(base_pos),
                               rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("f64", [True, False], ids=["f64", "f32_fallback"])
def test_refine_error_unit_invariant(f64):
    rng = np.random.default_rng(12345)
    char, thetas, noise = _base_problem(rng)
    # mm-as-base, m (sigma 1e-3), km (sigma 1e3... relative to base)
    errs = {s: _scaled_run(char, thetas, noise, s, f64)
            for s in (0.001, 1.0, 1000.0)}
    # At every unit scale the refine must reach the f32 FK roundoff floor
    # (markers are O(1) in base units; the f32 forward pass itself carries
    # ~3e-7 RMS noise, so "converged" means ~1e-6, and relative agreement
    # tighter than the floor is not a meaningful ask). This is the guard
    # the equilibration constants must satisfy off-clip: no scale may
    # stall at a plateau above roundoff (the pre-fix failure mode was
    # 3.8e-4 at sigma=0.001 from the unscaled absolute Tikhonov term).
    for s, e in errs.items():
        assert e < 2e-6, (s, errs)
