from . import gf2ops, nms, nms_pallas

__all__ = ["gf2ops", "nms", "nms_pallas"]
