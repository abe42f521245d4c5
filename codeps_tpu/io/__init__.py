from codeps_tpu.io.checkpoint import (load_checkpoint, make_modules_list,
                                      pretrained_from_checkpoints,
                                      restore_meters, restore_opt_state,
                                      restore_rng, resume_from_checkpoint,
                                      save_checkpoint)
from codeps_tpu.io.logging import (Timer, WandbLogger, init_logging,
                                   log_info, log_iter)

__all__ = [
    "load_checkpoint", "make_modules_list", "pretrained_from_checkpoints",
    "restore_meters", "restore_opt_state", "restore_rng",
    "resume_from_checkpoint", "save_checkpoint", "Timer", "WandbLogger",
    "init_logging", "log_info", "log_iter",
]
