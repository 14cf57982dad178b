from .gemm_pallas import PreparedWeight, prepare, gemm as gemm_pallas_call, supports
from .gemm_exact import gemm_exact, gemm_exact_fused
from .registry import KERNELS, dispatch
from . import gemm_xla

__all__ = [
    "PreparedWeight",
    "prepare",
    "gemm_pallas_call",
    "supports",
    "gemm_exact",
    "gemm_exact_fused",
    "KERNELS",
    "dispatch",
    "gemm_xla",
]
