"""Marker gap filling — interpolate occluded marker samples.

Reference: momentum/marker_tracking/marker_gap_fill.{h,cpp} (fill gaps in
occluded marker trajectories before tracking; processMarkerFile runs it
first, process_markers.cpp:311). Host-side numpy: per marker, linear
interpolation across interior gaps up to `max_gap` frames; leading/trailing
occlusions stay occluded. Returns a new MarkerSequence with filled samples
marked visible (optionally down-weighted by the caller)."""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["fill_marker_gaps"]


def fill_marker_gaps(markers, max_gap: int = 10):
    import jax.numpy as jnp

    pos = np.array(markers.positions)
    occ = np.array(markers.occluded)
    f, m = occ.shape
    for mi in range(m):
        vis = np.nonzero(~occ[:, mi])[0]
        if len(vis) < 2:
            continue
        for a, b in zip(vis[:-1], vis[1:]):
            gap = b - a - 1
            if 0 < gap <= max_gap:
                t = (np.arange(a + 1, b) - a) / (b - a)
                pos[a + 1: b, mi] = (1 - t)[:, None] * pos[a, mi] \
                    + t[:, None] * pos[b, mi]
                occ[a + 1: b, mi] = False
    return dataclasses.replace(
        markers,
        positions=jnp.asarray(pos),
        occluded=jnp.asarray(occ),
    )
