from crnn_ocr_tpu.train.checkpoint import (
    CheckpointManager,
    load_codec,
    load_model_config,
)
from crnn_ocr_tpu.train.loop import FitConfig, evaluate, fit
from crnn_ocr_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    param_count,
)
from crnn_ocr_tpu.train.step import make_eval_step, make_train_step

__all__ = [
    "CheckpointManager",
    "FitConfig",
    "TrainState",
    "create_train_state",
    "evaluate",
    "fit",
    "load_codec",
    "load_model_config",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "param_count",
]
