from momentum_tpu.camera.models import (  # noqa: F401
    Camera,
    OpenCVFisheyeIntrinsics,
    OpenCVIntrinsics,
    PinholeIntrinsics,
)
