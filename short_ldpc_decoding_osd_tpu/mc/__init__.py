from .harness import FailureBatch, build_nms_mc_step, iteration_ce_list, run_nms_mc

__all__ = ["FailureBatch", "build_nms_mc_step", "iteration_ce_list", "run_nms_mc"]
