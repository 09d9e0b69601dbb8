from .nms import fused_sigmoid_nms  # noqa: F401
