from .srcnn import (
    center_crop,
    forward,
    loss_sum,
    luma_mse_metrics,
    relu_backprop_gate,
    squared_error_sum,
)

__all__ = [
    "forward",
    "center_crop",
    "loss_sum",
    "squared_error_sum",
    "luma_mse_metrics",
    "relu_backprop_gate",
]
