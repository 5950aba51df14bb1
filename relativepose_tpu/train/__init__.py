from relativepose_tpu.train import completion, feature, losses, mesh  # noqa: F401
