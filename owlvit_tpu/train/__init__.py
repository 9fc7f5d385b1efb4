from .state import TrainState, partition_params, combine_params  # noqa: F401
from .trainer import Trainer, TrainConfig  # noqa: F401
