"""Rotary position embeddings (reference kernels/attention/rope.cuh).

Semantics preserved:

* ``theta_i = pos * freq_scale / base^(2i / head_dim)``, base default 10000
  (rope.cuh:33-48);
* **split layout** (default, llama): pair ``(x[i], x[i + d/2])``
  (rope.cuh:57-85);
* **interleaved layout**: pair ``(x[2i], x[2i+1])`` (rope.cuh:88-117);
* rotation: ``x0' = x0 c - x1 s``, ``x1' = x0 s + x1 c``;
* precomputed cos/sin cache + cached-apply (rope.cuh:223-365) maps to
  :func:`rope_cache` + :func:`apply_rope`, the jit-friendly form (compute
  the cache once per model, gather rows by position).

Shapes: ``x[..., n_heads, head_dim]``; ``pos`` scalar or ``[...]`` batch of
positions (the reference's batched-sequence kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BASE = 10000.0


def rope_cache(max_pos: int, head_dim: int, base: float = DEFAULT_BASE,
               freq_scale: float = 1.0, dtype=jnp.float32, inv_freq=None):
    """cos/sin tables [max_pos, head_dim/2] (rope.cuh:223-250).

    ``inv_freq``: optional per-dimension inverse frequencies [head_dim/2]
    overriding the standard ``base**(-2i/d)`` spectrum — the hook for
    Llama-3.1-style frequency-dependent scaling (:func:`llama3_inv_freq`)
    or a GGUF ``rope_freqs.weight`` factor tensor.  May be a traced jnp
    array (the math below is jnp so it works under jit).
    """
    if inv_freq is None:
        inv_freq = 1.0 / (
            base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
        )
    if not isinstance(inv_freq, jax.core.Tracer):
        # concrete spectrum: compute the phases in f64 (an f32 product
        # rounds by up to ~4e-3 rad at position ~1e5) and cast the tables
        iv = np.asarray(inv_freq, np.float64)
        t = np.arange(max_pos, dtype=np.float64)[:, None] * iv[None, :] * freq_scale
        return jnp.asarray(np.cos(t), dtype), jnp.asarray(np.sin(t), dtype)
    # traced spectrum (jit operand): jnp math, f32
    t = (jnp.arange(max_pos, dtype=jnp.float32)[:, None]
         * jnp.asarray(inv_freq, jnp.float32)[None, :] * freq_scale)
    return jnp.cos(t).astype(dtype), jnp.sin(t).astype(dtype)


def llama3_inv_freq(head_dim: int, base: float, factor: float,
                    low_freq_factor: float, high_freq_factor: float,
                    original_max_pos: int) -> np.ndarray:
    """Llama-3.1 frequency-dependent RoPE scaling (HF rope_type='llama3').

    Long wavelengths (low frequencies) divide by ``factor``, short ones
    stay, the band between interpolates smoothly — matching transformers'
    ``_compute_llama3_parameters`` / llama.cpp's baked ``rope_freqs``.
    """
    inv_freq = 1.0 / (
        base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    wavelen = 2.0 * np.pi / inv_freq
    low_wl = original_max_pos / low_freq_factor
    high_wl = original_max_pos / high_freq_factor
    smooth = (original_max_pos / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    interp = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = np.where(wavelen > low_wl, inv_freq / factor,
                   np.where(wavelen < high_wl, inv_freq, interp))
    return out.astype(np.float32)


def apply_rope(x, pos, cache, interleaved: bool = False):
    """Rotate ``x[..., H, D]`` by position(s) ``pos`` using a rope_cache."""
    cos_t, sin_t = cache
    pos = jnp.asarray(pos)
    cos = cos_t[pos][..., None, :]  # [..., 1, D/2]
    sin = sin_t[pos][..., None, :]
    d = x.shape[-1]
    x32 = x.astype(jnp.float32)
    if interleaved:
        x0 = x32[..., 0::2]
        x1 = x32[..., 1::2]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        out = jnp.stack([r0, r1], axis=-1).reshape(x.shape)
    else:
        x0 = x32[..., : d // 2]
        x1 = x32[..., d // 2 :]
        out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.astype(x.dtype)


def rope(x, pos, base: float = DEFAULT_BASE, freq_scale: float = 1.0,
         interleaved: bool = False):
    """One-shot RoPE without a cache (single-pos kernels, rope.cuh:124-186)."""
    max_pos = int(np.max(np.asarray(pos))) + 1
    return apply_rope(x, pos, rope_cache(max_pos, x.shape[-1], base, freq_scale),
                      interleaved=interleaved)


def rope_ref(x, pos, base: float = DEFAULT_BASE, freq_scale: float = 1.0,
             interleaved: bool = False):
    """Scalar-loop reference transcription of rope_cpu_f32 (rope.cuh:57-117)."""
    x = np.asarray(x, np.float32).copy()
    lead = x.shape[:-2]
    pos = np.broadcast_to(np.asarray(pos), lead)
    h, d = x.shape[-2], x.shape[-1]
    for r in np.ndindex(lead):
        p = float(pos[r])
        for hh in range(h):
            head = x[r + (hh,)]
            for i in range(d // 2):
                freq = 1.0 / (base ** (2.0 * i / d))
                th = p * freq * freq_scale
                c, s = np.cos(th), np.sin(th)
                if interleaved:
                    i0, i1 = 2 * i, 2 * i + 1
                else:
                    i0, i1 = i, i + d // 2
                x0, x1 = head[i0], head[i1]
                head[i0] = x0 * c - x1 * s
                head[i1] = x0 * s + x1 * c
    return x


__all__ = ["rope_cache", "apply_rope", "rope", "rope_ref", "DEFAULT_BASE"]
