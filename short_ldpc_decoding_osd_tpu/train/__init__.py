from .optim import clip_each_by_norm, staircase_adam
from .nms_train import NMSTrainConfig, train_nms
from .dia_train import DIATrainConfig, pattern_statistics_sweep, train_dia
from .stopper_train import (
    StopperTrainConfig,
    generate_stopper_samples,
    reform_windows,
    train_stopper,
)

__all__ = [
    "clip_each_by_norm",
    "staircase_adam",
    "NMSTrainConfig",
    "train_nms",
    "DIATrainConfig",
    "train_dia",
    "pattern_statistics_sweep",
    "StopperTrainConfig",
    "generate_stopper_samples",
    "reform_windows",
    "train_stopper",
]
