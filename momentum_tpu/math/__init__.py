from momentum_tpu.math import euler, generalized_loss, quaternion, skel_state  # noqa: F401
from momentum_tpu.math import support_polygon  # noqa: F401
from momentum_tpu.math.support_polygon import (  # noqa: F401
    SupportPlane,
    convex_hull_2d,
    cross2d,
    support_polygon_from_world_points,
)
