from mrfp_tpu.train.losses import cross_entropy, instance_whitening_loss
from mrfp_tpu.train.state import (
    TrainState,
    create_train_state,
    lr_schedule,
    make_optimizer,
)
from mrfp_tpu.train.step import eval_step, make_jitted_steps, train_step

__all__ = [
    "cross_entropy", "instance_whitening_loss",
    "TrainState", "create_train_state", "lr_schedule", "make_optimizer",
    "eval_step", "make_jitted_steps", "train_step",
]
