"""Neural network models (layer L2 of SURVEY.md §1)."""

from tpu2048.models.dqn import (
    DQNCNN,
    MultiKernelConvBlock,
    create_model,
    init_params,
    param_count,
)

__all__ = [
    "DQNCNN",
    "MultiKernelConvBlock",
    "create_model",
    "init_params",
    "param_count",
]
