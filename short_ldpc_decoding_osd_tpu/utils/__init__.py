from . import checkpoint, metrics
from .metrics import DecodeStats, wilson_interval

__all__ = ["checkpoint", "metrics", "DecodeStats", "wilson_interval"]
