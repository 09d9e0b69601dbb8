from .state import TrainState, create_train_state  # noqa: F401
from .steps import make_eval_step, make_train_step  # noqa: F401
from .trainer import Trainer  # noqa: F401
