"""quant_gemm_tpu: TPU-native quantized-GEMM inference engine.

Brand-new JAX/Pallas implementation of llama.cpp's 32-element block
quantization formats and the W4A8 sum-compensation GEMM, with a kernel
ladder, element-op library, multi-chip tensor parallelism, and a quantized
Llama serving runtime.  See README.md and docs/.
"""

__version__ = "0.1.0"

from . import api  # noqa: F401
from .formats.blocks import QK, SPECS  # noqa: F401

__all__ = ["api", "QK", "SPECS", "__version__"]
