from relativepose_tpu.eval import harness  # noqa: F401
