from .network import SDNet, init_model, load_params, save_params  # noqa: F401
from .resnet import ResNet34Encoder  # noqa: F401
