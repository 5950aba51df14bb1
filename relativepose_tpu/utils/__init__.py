from relativepose_tpu.utils import (  # noqa: F401
    callbacks,
    checkpoint,
    experiment,
    log,
    profiling,
    trainer,
)
