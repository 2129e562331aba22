"""Offline visualization (reference: momentum/gui/ rerun-based viewers).

The reference streams characters/markers to a rerun or viser live viewer;
neither runtime exists in this environment, so the equivalent surface here is
offline: render motion through the TPU rasterizer and export animated GIFs /
image sequences that serve the same inspection workflows
(glb_viewer, marker/tracking debug views).
"""

from momentum_tpu.gui.gif import save_gif  # noqa: F401
from momentum_tpu.gui.viewer import (  # noqa: F401
    auto_camera,
    create_camera_for_body,
    create_camera_for_hand,
    draw_markers,
    draw_skeleton,
    render_motion,
    save_motion_gif,
)
