from relativepose_tpu.tune import sigma  # noqa: F401
