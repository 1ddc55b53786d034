from . import extras
from .dia import (
    DIA_MODELS,
    ConvBitwise,
    RnnOne,
    RnnTwo,
    StopperFcn,
    dia_loss,
    make_dia,
    stopper_engine_params,
)

__all__ = [
    "extras",
    "DIA_MODELS",
    "ConvBitwise",
    "RnnOne",
    "RnnTwo",
    "StopperFcn",
    "dia_loss",
    "make_dia",
    "stopper_engine_params",
]
