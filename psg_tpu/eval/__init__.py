from psg_tpu.eval.metrics import (
    color_histogram_similarity,
    conditioning_report,
    downsampled_l1,
    pairwise_conditioning_scores,
    silhouette_iou,
)

__all__ = [
    "color_histogram_similarity",
    "conditioning_report",
    "downsampled_l1",
    "pairwise_conditioning_scores",
    "silhouette_iou",
]
