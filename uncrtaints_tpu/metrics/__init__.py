from uncrtaints_tpu.metrics.image import (
    img_metrics, img_metrics_batch, AvgImgMetrics,
)
from uncrtaints_tpu.metrics.calibration import (
    compute_ece, compute_uce_auce, binarize,
)

__all__ = ["img_metrics", "img_metrics_batch", "AvgImgMetrics",
           "compute_ece", "compute_uce_auce", "binarize"]
