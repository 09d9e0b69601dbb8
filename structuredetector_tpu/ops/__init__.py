from .tensor import (  # noqa: F401
    clamp_in_0_1,
    clamped_sigmoid,
    gather_features,
    plateau_nms,
    topk_per_class,
)
from .encode import encode_targets, EncodedTargets  # noqa: F401
from .losses import (  # noqa: F401
    focal_loss,
    masked_l1_loss,
    masked_l2_loss,
    masked_smooth_l1_loss,
    mse_loss,
    sdnet_loss,
)
from .decode import decode_feature_maps, split_head_output  # noqa: F401
