from .optimizer import OPTIMIZER_NAMES, create as create_optimizer  # noqa: F401
from .engine import TrainState, TrainingEngine  # noqa: F401
