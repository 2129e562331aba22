from momentum_tpu.character.skeleton import (  # noqa: F401
    INVALID_INDEX,
    PARAMS_PER_JOINT,
    Skeleton,
    make_skeleton,
)
from momentum_tpu.character import fk  # noqa: F401
from momentum_tpu.character.parameter_transform import (  # noqa: F401
    ParameterTransform,
    make_identity_transform,
)
from momentum_tpu.character.limits import ParameterLimits, make_limits, make_empty_limits  # noqa: F401
from momentum_tpu.character.skinning import MAX_SKIN_JOINTS, SkinWeights, apply_ssd, skin_points  # noqa: F401
from momentum_tpu.character.blend_shape import BlendShape  # noqa: F401
from momentum_tpu.character.character import (  # noqa: F401
    Character,
    CollisionGeometry,
    Locators,
    PhysicalProperties,
    SkinnedLocators,
    Mesh,
)
