"""Visualization (reference: momentum/gui/ + pymomentum rerun/viser viewers).

Three tiers:
  * `rerun_vis` — rerun.io logging surface (logCharacter/logMarkers/
    logModelParams/log_animation, gui/rerun/logger.h:96-163). Optional
    import: logs real archetypes when the SDK is present, otherwise records
    the identical stream in-process (testable headless, replayable later).
  * `viser_vis` — viser live-scene surface (show/update/animate) against an
    injected scene; a FallbackScene recorder stands in without a server.
  * offline: render motion through the TPU rasterizer and export animated
    GIFs / image sequences (glb_viewer-style inspection with zero runtime
    dependencies).
"""

from momentum_tpu.gui import rerun_vis, viser_vis  # noqa: F401
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
