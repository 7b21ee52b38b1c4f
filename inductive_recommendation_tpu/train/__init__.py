"""Training: losses, trainers, checkpointing, meters."""

from inductive_recommendation_tpu.train.losses import (
    bpr_loss,
    bce_losses,
    info_nce,
    multinomial_ll_loss,
)
from inductive_recommendation_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
)
from inductive_recommendation_tpu.train.meters import AverageMeter
from inductive_recommendation_tpu.train.trainer import (
    BasicTrainer,
    BPRTrainer,
    TRAINERS,
    get_trainer,
)

__all__ = [
    "bpr_loss",
    "bce_losses",
    "info_nce",
    "multinomial_ll_loss",
    "save_checkpoint",
    "load_checkpoint",
    "AverageMeter",
    "BasicTrainer",
    "BPRTrainer",
    "TRAINERS",
    "get_trainer",
]
