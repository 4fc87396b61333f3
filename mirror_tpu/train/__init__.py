from .checkpoint import (
    CheckpointSaver,
    load_checkpoint_file,
    load_pretrained,
    merge_params,
    resume_checkpoint,
    save_checkpoint_file,
)
from .harness import (
    TrainHarness,
    common_setup,
    gather_eval_outputs,
    update_summary,
)
from .optim import (
    PlateauController,
    make_optimizer,
    make_schedule,
    scheduled_epochs,
)
from .state import TrainState, create_train_state
from . import metrics, steps

__all__ = [
    "CheckpointSaver",
    "TrainHarness",
    "gather_eval_outputs",
    "TrainState",
    "common_setup",
    "create_train_state",
    "load_checkpoint_file",
    "load_pretrained",
    "PlateauController",
    "make_optimizer",
    "make_schedule",
    "scheduled_epochs",
    "merge_params",
    "metrics",
    "resume_checkpoint",
    "save_checkpoint_file",
    "steps",
    "update_summary",
]
