from lct_gan_tpu.train.state import (
    GanTrainState,
    TrainConfig,
    build_models,
    create_state,
)
from lct_gan_tpu.train.step import (
    align_tf_targets,
    make_eval_step,
    make_train_step,
)
from lct_gan_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    state_from_torch_checkpoint,
)
from lct_gan_tpu.train.loop import DataConfig, run_training, validate

__all__ = [
    "GanTrainState",
    "TrainConfig",
    "build_models",
    "create_state",
    "align_tf_targets",
    "make_eval_step",
    "make_train_step",
    "latest_checkpoint",
    "restore_checkpoint",
    "save_checkpoint",
    "state_from_torch_checkpoint",
    "DataConfig",
    "run_training",
    "validate",
]
