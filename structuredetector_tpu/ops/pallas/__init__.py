from .nms import fused_sigmoid_nms  # noqa: F401
from .topk import fused_sigmoid_nms_topk  # noqa: F401
