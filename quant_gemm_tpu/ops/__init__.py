from .activations import silu, silu_mul, gelu, gelu_quick
from .elementwise import add, mul, scale, add_scale
from .rms_norm import rms_norm, rms_norm_pallas
from .rope import rope, rope_cache, apply_rope
from .softmax import softmax, softmax_causal, softmax_pallas

__all__ = [
    "silu",
    "silu_mul",
    "gelu",
    "gelu_quick",
    "add",
    "mul",
    "scale",
    "add_scale",
    "rms_norm",
    "rms_norm_pallas",
    "rope",
    "rope_cache",
    "apply_rope",
    "softmax",
    "softmax_causal",
    "softmax_pallas",
]
