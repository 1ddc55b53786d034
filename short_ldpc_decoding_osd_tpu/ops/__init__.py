from . import gf2ops, nms, nms_edge_xla, nms_pallas

__all__ = ["gf2ops", "nms", "nms_edge_xla", "nms_pallas"]
