from . import checkpoint, metrics
from .dtypes import count_dtype
from .metrics import DecodeStats, wilson_interval

__all__ = ["checkpoint", "metrics", "DecodeStats", "wilson_interval",
           "count_dtype"]
