from rtgs_tpu.train.loss import l1_loss, ssim, render_loss
from rtgs_tpu.train.solver import (
    SceneParams,
    Solver,
    activate,
    init_params,
    make_optimizer,
)

__all__ = [
    "l1_loss",
    "ssim",
    "render_loss",
    "SceneParams",
    "Solver",
    "activate",
    "init_params",
    "make_optimizer",
]
