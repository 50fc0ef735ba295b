from .schedule import warmup_multistep_schedule, parse_lr_epochs
from .metrics import (
    thres_metrics,
    abs_depth_error_metrics,
    DictAverageMeter,
)
from .state import TrainState, create_train_state, save_checkpoint, restore_checkpoint
from .loop import make_train_step, make_eval_step, Trainer
