from .gemm_pallas import PreparedWeight, prepare, gemm as gemm_pallas_call, supports
from .gemm_exact import gemm_exact
from .registry import KERNELS, dispatch
from . import gemm_xla

__all__ = [
    "PreparedWeight",
    "prepare",
    "gemm_pallas_call",
    "supports",
    "gemm_exact",
    "KERNELS",
    "dispatch",
    "gemm_xla",
]
