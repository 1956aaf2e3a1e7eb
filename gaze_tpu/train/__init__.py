from gaze_tpu.train.at import build_weight_sequences, create_at_state, make_at_train_step
from gaze_tpu.train.common import (
    TrainState,
    jit_dp_step,
    make_lr_schedule,
    make_optimizer,
    make_state,
    microbatch_value_and_grad,
)
from gaze_tpu.train.lf import create_lf_state, make_lf_eval_step, make_lf_train_step
from gaze_tpu.train.sp import (
    create_sp_state,
    extract_fixation_weights,
    make_sp_eval_step,
    make_sp_train_step,
)

__all__ = [
    "TrainState",
    "build_weight_sequences",
    "create_at_state",
    "create_lf_state",
    "create_sp_state",
    "extract_fixation_weights",
    "jit_dp_step",
    "make_at_train_step",
    "make_lf_eval_step",
    "make_lf_train_step",
    "make_lr_schedule",
    "make_optimizer",
    "microbatch_value_and_grad",
    "make_sp_eval_step",
    "make_sp_train_step",
    "make_state",
]
