"""Kernel layer: XLA segment primitives + Pallas TPU kernels."""
from .segment import (scatter_nodes_to_dense, segment_count, segment_max,
                      segment_mean, segment_softmax, segment_sum,
                      segment_topk_by_channel)

__all__ = [
    "segment_sum", "segment_mean", "segment_max", "segment_count",
    "segment_softmax", "scatter_nodes_to_dense",
    "segment_topk_by_channel",
]
