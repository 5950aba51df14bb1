from relativepose_tpu.match import solver  # noqa: F401
from relativepose_tpu.match.solver import (  # noqa: F401
    SolverHyperParams,
    SolverStaticConfig,
    estimate_relative_pose,
)
