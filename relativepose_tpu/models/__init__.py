from relativepose_tpu.models.resnet import Resnet18_8s, SegmentationHead  # noqa: F401
from relativepose_tpu.models.scnet import SCNet  # noqa: F401
