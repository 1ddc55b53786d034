from .mesh import make_mesh
from .data_parallel import (
    sharded_nms_mc_step,
    sharded_nms_train_step,
)

__all__ = ["make_mesh", "sharded_nms_mc_step", "sharded_nms_train_step"]
