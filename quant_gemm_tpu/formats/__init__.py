from .blocks import (
    QK,
    SPECS,
    QuantSpec,
    Q4_0Tensor,
    Q4_1Tensor,
    Q5_0Tensor,
    Q5_1Tensor,
    Q8_0Tensor,
    Q8_1Tensor,
)
from . import numpy_ref, gguf

__all__ = [
    "QK",
    "SPECS",
    "QuantSpec",
    "Q4_0Tensor",
    "Q4_1Tensor",
    "Q5_0Tensor",
    "Q5_1Tensor",
    "Q8_0Tensor",
    "Q8_1Tensor",
    "numpy_ref",
    "gguf",
]
