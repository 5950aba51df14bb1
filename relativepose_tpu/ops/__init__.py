from relativepose_tpu.ops import eig4x4, interpolate, sampling  # noqa: F401
