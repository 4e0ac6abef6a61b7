"""L4 training layer: jitted steps, losses, metrics, optimizer, checkpoints."""

from pointnet12_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from pointnet12_tpu.train.optim import make_optimizer
from pointnet12_tpu.train import losses, metrics
from pointnet12_tpu.train.checkpoint import CheckpointManager
from pointnet12_tpu.train.precise_bn import recompute_batch_stats

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
    "losses",
    "metrics",
    "CheckpointManager",
    "recompute_batch_stats",
]
