"""Training loop machinery: LR schedules, optimizer/train step, checkpoints."""

from .lr import lr_schedule  # noqa: F401
from .step import TrainState, create_train_state, make_train_step, make_eval_step  # noqa: F401
