"""Training subsystem: jitted steps, schedules, checkpointing, trainer."""

from .checkpoint import Checkpointer
from .losses import cross_entropy, soft_target_cross_entropy
from .metrics_logger import MetricsLogger
from .mixing import cutmix, mix_or_cutmix, mixup
from .schedules import warmup_cosine, warmup_cosine_min_lr
from .steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from .trainer import TrainConfig, Trainer

__all__ = [
    "Checkpointer",
    "cross_entropy",
    "soft_target_cross_entropy",
    "MetricsLogger",
    "cutmix",
    "mix_or_cutmix",
    "mixup",
    "warmup_cosine",
    "warmup_cosine_min_lr",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "TrainConfig",
    "Trainer",
]
