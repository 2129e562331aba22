from momentum_tpu.tracking.config import (  # noqa: F401
    BaseConfig,
    CalibrationConfig,
    RefineConfig,
    TrackingConfig,
)
from momentum_tpu.tracking.tracker import (  # noqa: F401
    MarkerSequence,
    TrackingResult,
    calibrate_locators,
    calibrate_model,
    refine_motion,
    track_poses_batched,
    track_poses_per_frame,
    track_sequence,
)
from momentum_tpu.tracking.gap_fill import fill_marker_gaps  # noqa: F401
from momentum_tpu.tracking.app_utils import load_character, load_character_with_identity  # noqa: F401
from momentum_tpu.tracking import glove_utils  # noqa: F401
