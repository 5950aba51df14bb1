from relativepose_tpu.core import (  # noqa: F401
    horn,
    masking,
    overlap,
    quaternion,
    rotation,
    skybox,
    warp,
)
