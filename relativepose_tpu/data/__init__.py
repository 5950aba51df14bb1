from relativepose_tpu.data import synthetic  # noqa: F401
