from uncrtaints_tpu.losses.losses import (
    get_loss, calc_loss, gaussian_nll_loss, multi_gaussian_nll_loss,
    l1_loss, l2_loss,
)

__all__ = ["get_loss", "calc_loss", "gaussian_nll_loss",
           "multi_gaussian_nll_loss", "l1_loss", "l2_loss"]
