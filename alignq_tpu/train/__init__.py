from alignq_tpu.train.config import TrainConfig
from alignq_tpu.train.state import TrainState, create_train_state
from alignq_tpu.train.steps import make_train_step, make_eval_step, cross_entropy_loss

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "cross_entropy_loss",
]
