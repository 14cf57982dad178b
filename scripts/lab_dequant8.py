import sys
sys.path.insert(0, ".")
import jax, functools
import jax.numpy as jnp
import numpy as np
from quant_gemm_tpu.formats import jax_quant
from quant_gemm_tpu.harness import benchmark as bm
from quant_gemm_tpu.kernels import gemm_pallas
from quant_gemm_tpu.kernels.gemm_exact import gemm_exact
from quant_gemm_tpu.models import llama

print(f"device: {jax.devices()[0]}", flush=True)
cfg = llama.LlamaConfig(vocab=32000, dim=2048, n_layers=1, n_heads=16,
                        n_kv_heads=16, d_ff=8192, max_seq=64)
qp = llama.init_qparams_device(cfg, "q4_0", seed=0)
lyr = qp["layers"][0]
rng = np.random.default_rng(0)
b = 8
shapes = [("wqkv", lyr["wqkv"], 2048), ("wo", lyr["wo"], 2048),
          ("wgu", lyr["wgu"], 2048), ("w_down", lyr["w_down"], 8192),
          ("lm_head", qp["lm_head"], 2048)]
cases = []
for name, w, kk in shapes:
    xf = jnp.asarray(rng.normal(0, 1, (b, kk)), jnp.bfloat16)
    def ex(w, x):
        return gemm_exact(w, jax_quant.quantize_q8_1(x.astype(jnp.float32)))
    def dq(w, x):
        return gemm_pallas.gemm(w, x)  # W4A16 dequant-bf16 rung
    def dq8(w, x):
        return gemm_pallas.gemm(w, jax_quant.quantize_q8_1(x.astype(jnp.float32)))
    by = bm.weight_bytes("q4_0", w.n, w.k)
    cases += [(f"{name} exact", ex, (w, xf), by),
              (f"{name} dequant-a16", dq, (w, xf), by),
              (f"{name} dequant-a8", dq8, (w, xf), by)]
med = bm.interleaved_medians(cases, reps=5)
print("\nmedians:", flush=True)
for name, _f, _a, by in cases:
    if name in med:
        print(f"  {name:<22s} {med[name]*1e6:8.1f} us {by/med[name]/1e9:7.1f} GB/s", flush=True)
