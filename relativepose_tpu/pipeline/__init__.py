from relativepose_tpu.pipeline.recurrent import (  # noqa: F401
    PipelineConfig,
    batched_pose_estimator,
    estimate_pose_via_completion,
    make_view,
)
