from uncrtaints_tpu.metrics.image import img_metrics, AvgImgMetrics
from uncrtaints_tpu.metrics.calibration import (
    compute_ece, compute_uce_auce, binarize,
)

__all__ = ["img_metrics", "AvgImgMetrics", "compute_ece",
           "compute_uce_auce", "binarize"]
