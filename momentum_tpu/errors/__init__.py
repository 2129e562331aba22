from momentum_tpu.errors.base import (  # noqa: F401
    ErrorFunction,
    EvalContext,
    UnionErrorFunction,
)
from momentum_tpu.errors.position import (  # noqa: F401
    ModelParametersErrorFunction,
    OrientationErrorFunction,
    PositionErrorFunction,
)
from momentum_tpu.errors.limit import LimitErrorFunction  # noqa: F401
from momentum_tpu.errors.geometric import (  # noqa: F401
    AimDirErrorFunction,
    AimDistErrorFunction,
    DistanceErrorFunction,
    FixedAxisAngleErrorFunction,
    FixedAxisCosErrorFunction,
    FixedAxisDiffErrorFunction,
    NormalErrorFunction,
    PlaneErrorFunction,
    ProjectionErrorFunction,
)
from momentum_tpu.errors.joint_pair import (  # noqa: F401
    JointToJointDistanceErrorFunction,
    JointToJointOrientationErrorFunction,
    JointToJointPositionErrorFunction,
)
from momentum_tpu.errors.pose_prior import Mppca, PosePriorErrorFunction  # noqa: F401
from momentum_tpu.errors.state import StateErrorFunction  # noqa: F401
from momentum_tpu.errors.vertex import (  # noqa: F401
    CameraVertexProjectionErrorFunction,
    PointTriangleVertexErrorFunction,
    VertexNormalErrorFunction,
    VertexPlaneErrorFunction,
    VertexPositionErrorFunction,
    VertexProjectionErrorFunction,
    VertexVertexDistanceErrorFunction,
)
from momentum_tpu.errors.collision import (  # noqa: F401
    CollisionErrorFunction,
    PlaneCollisionErrorFunction,
    compute_valid_pairs,
)
from momentum_tpu.errors.body import (  # noqa: F401
    CenterOfMassErrorFunction,
    FloorErrorFunction,
    HeightErrorFunction,
)
from momentum_tpu.errors.skinned_locator import (  # noqa: F401
    SkinnedLocatorErrorFunction,
    SkinnedLocatorTriangleErrorFunction,
)
from momentum_tpu.errors.sdf import (  # noqa: F401
    SdfCollisionErrorFunction,
    VertexSdfErrorFunction,
)
from momentum_tpu.errors.camera_projection import (  # noqa: F401
    CameraProjectionErrorFunction,
)
