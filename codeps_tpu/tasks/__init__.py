from codeps_tpu.tasks.state import (AdaptState, TrainState,
                                    make_adapt_state)
from codeps_tpu.tasks.train import make_loss_fn, make_train_step
from codeps_tpu.tasks.optim import (build_optimizer, build_schedule,
                                    step_lr_schedule, warmup_poly_schedule)

__all__ = [
    "AdaptState", "TrainState", "make_adapt_state", "make_loss_fn", "make_train_step",
    "build_optimizer", "build_schedule", "step_lr_schedule",
    "warmup_poly_schedule",
]
