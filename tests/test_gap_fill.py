"""Marker gap filling (reference: marker_tracking/marker_gap_fill)."""

import jax.numpy as jnp
import numpy as np

from momentum_tpu.tracking import MarkerSequence, fill_marker_gaps


def _seq(pos, occ):
    return MarkerSequence(positions=jnp.asarray(pos, jnp.float32),
                          occluded=jnp.asarray(occ),
                          names=("m0",))


def test_interior_gap_linearly_interpolated():
    f = 7
    pos = np.zeros((f, 1, 3), np.float32)
    pos[:, 0, 0] = np.arange(f)
    occ = np.zeros((f, 1), bool)
    occ[2:5, 0] = True  # frames 2-4 occluded between visible 1 and 5
    pos[2:5] = np.nan
    out = fill_marker_gaps(_seq(pos, occ), max_gap=5)
    o = np.asarray(out.occluded)
    p = np.asarray(out.positions)
    assert not o.any()
    np.testing.assert_allclose(p[:, 0, 0], np.arange(f), atol=1e-5)


def test_gap_longer_than_max_stays_occluded():
    f = 12
    pos = np.zeros((f, 1, 3), np.float32)
    occ = np.zeros((f, 1), bool)
    occ[1:10, 0] = True  # 9-frame gap
    out = fill_marker_gaps(_seq(pos, occ), max_gap=5)
    assert np.asarray(out.occluded)[1:10, 0].all()


def test_leading_trailing_occlusion_untouched():
    f = 6
    pos = np.zeros((f, 1, 3), np.float32)
    occ = np.zeros((f, 1), bool)
    occ[0, 0] = True
    occ[-1, 0] = True
    out = fill_marker_gaps(_seq(pos, occ))
    o = np.asarray(out.occluded)
    assert o[0, 0] and o[-1, 0]
    assert not o[1:-1, 0].any()
