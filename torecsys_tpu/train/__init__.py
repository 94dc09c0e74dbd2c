"""Training orchestration: pipeline builder, jitted steps, trainer loop,
optimizers, checkpointing.

Parity with ``/root/reference/torecsys/trainer/`` (SURVEY.md §2.8) plus what
the reference lacks: a real checkpoint/resume path and mesh-aware execution.
"""

from torecsys_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from torecsys_tpu.train.optimizers import available_optimizers, get_optimizer
from torecsys_tpu.train.pipeline import OBJECTIVES, Pipeline
from torecsys_tpu.train.state import TrainState
from torecsys_tpu.train.steps import interleave_pos_neg, make_eval_step, make_train_step
from torecsys_tpu.train.trainer import Trainer

__all__ = [
    "OBJECTIVES",
    "Pipeline",
    "TrainState",
    "Trainer",
    "available_optimizers",
    "get_optimizer",
    "interleave_pos_neg",
    "latest_checkpoint",
    "make_eval_step",
    "make_train_step",
    "restore_checkpoint",
    "save_checkpoint",
]
