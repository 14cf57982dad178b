"""Multi-chip tensor/data parallelism for packed quantized weights.

The reference is single-GPU (SURVEY §2.9); this layer is the TPU-native
extension required by BASELINE.json's north star: packed-INT4 weights stay
packed in HBM and are **tensor-sharded over ICI**, activations are
replicated (column-parallel) or K-sharded with an f32 partial-sum
reduction (row-parallel), composed under ``shard_map`` over a
``jax.sharding.Mesh`` so XLA schedules the collectives.

Sharding strategy for packed data: a weight is split on the host into
per-device chunks *before* planar packing concerns arise — each chunk is
prepared independently, so every device holds a self-contained K-major
planar PreparedWeight for its shard.  Chunks are stacked on a leading
device axis and sharded there (``P('tp')``), which keeps XLA from ever
re-laying-out the packed uint8 payload.

* **Column parallel** (out-features sharded): local GEMM per device,
  outputs concatenated on N — used for attention QKV and FFN up/gate.
* **Row parallel** (K sharded): activations arrive K-sharded from a
  previous column-parallel layer (or are split), local GEMMs produce
  full-[M, N] partials, combined with ``psum`` (or ``psum_scatter``) —
  used for attention out-proj and FFN down.

The per-block Q8_1 structure makes the all-gather cheap (36 B per 32
elements) exactly as the north star prescribes; with f32 scaled activations
the payload is the bf16/f32 activation tile instead.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..formats.blocks import Q8_1Tensor
from ..kernels import gemm_pallas


def make_mesh(axis_sizes: dict[str, int], devices: Sequence | None = None) -> Mesh:
    """Build a Mesh, e.g. make_mesh({'dp': 2, 'tp': 4})."""
    if devices is None:
        devices = jax.devices()
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    assert len(devices) >= n, (len(devices), n)
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, tuple(axis_sizes))


def _split_container(w_q, axis_n: bool, parts: int):
    """Split a row-major SoA container into `parts` chunks (list).

    N splits slice every field on dim 0.  K splits must happen in *unpacked*
    natural-K space (the planar nibble split is row-global), so codes are
    unpacked, sliced, and re-packed per chunk — each chunk is then a
    self-contained planar container over its local K.
    """
    from ..formats import numpy_ref as nr

    if axis_n:
        outs = []
        for i in range(parts):
            fields = {}
            for name, arr in zip(w_q._fields, w_q):
                arr = np.asarray(arr)
                size = arr.shape[0] // parts
                fields[name] = arr[i * size : (i + 1) * size]
            outs.append(type(w_q)(**fields))
        return outs

    codes = nr.codes(w_q)  # [N, K] raw codes, natural order
    k = codes.shape[1]
    kl = k // parts
    spec = w_q.spec
    outs = []
    for i in range(parts):
        c = codes[:, i * kl : (i + 1) * kl]
        scalars = {
            f: np.asarray(getattr(w_q, f))[:, i * (kl // 32) : (i + 1) * (kl // 32)]
            for f in w_q._fields
            if f in ("d", "m", "s")
        }
        if spec.bits == 8:
            outs.append(type(w_q)(qs=c.astype(np.int8), **scalars))
        elif spec.bits == 4:
            outs.append(type(w_q)(packed=nr.pack_planar_4bit(c & 0xF), **scalars))
        else:  # 5-bit
            outs.append(
                type(w_q)(
                    packed=nr.pack_planar_4bit(c & 0xF),
                    qh=nr.pack_planar_bits((c >> 4) & 1),
                    **scalars,
                )
            )
    return outs


class ShardedWeight:
    """Stacked per-device PreparedWeights: arrays [tp, ...] sharded on dim 0."""

    def __init__(self, qtype, n, k, mode, axis, stacked):
        self.qtype = qtype
        self.n = n  # global out-features
        self.k = k  # global K
        self.mode = mode  # 'col' (N-sharded) or 'row' (K-sharded)
        self.axis = axis  # mesh axis name
        self.stacked = stacked  # PreparedWeight of [tp, ...] arrays

    def tree_flatten(self):
        return (self.stacked,), (self.qtype, self.n, self.k, self.mode, self.axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], aux[3], aux[4], children[0])

    @property
    def local(self) -> gemm_pallas.PreparedWeight:
        """The rank-local view (for use inside shard_map, after index [0])."""
        return self.stacked


jax.tree_util.register_pytree_node_class(ShardedWeight)


def shard_weight(w_q, mesh: Mesh, axis: str = "tp", mode: str = "col") -> ShardedWeight:
    """Shard a row-major SoA container over ``mesh[axis]``.

    mode='col': split out-features (N); mode='row': split reduction (K).
    Each chunk is independently prepared (K-major planar), stacked on a
    leading device axis, and placed with ``P(axis)``.
    """
    parts = mesh.shape[axis]
    if hasattr(w_q, "qs"):
        n, k = np.asarray(w_q.qs).shape
    else:
        n, k = np.asarray(w_q.packed).shape
        k *= 2
    chunks = [gemm_pallas.prepare(c) for c in _split_container(w_q, mode == "col", parts)]

    def stack(field):
        vals = [getattr(c, field) for c in chunks]
        if vals[0] is None:
            return None
        stacked = jnp.stack([jnp.asarray(v) for v in vals])
        sharding = NamedSharding(mesh, P(axis, None, None))
        return jax.device_put(stacked, sharding)

    c0 = chunks[0]
    stacked = gemm_pallas.PreparedWeight(
        c0.qtype,
        c0.n,
        c0.k,
        stack("packed_t"),
        stack("qs_t"),
        stack("d_t"),
        stack("m_t"),
        stack("qh_t"),
    )
    return ShardedWeight(w_q.spec.name, n, k, mode, axis, stacked)


def _local_weight(sw: ShardedWeight) -> gemm_pallas.PreparedWeight:
    """Inside shard_map: strip the (length-1) leading device axis."""
    st = sw.stacked

    def first(x):
        return None if x is None else x[0]

    return gemm_pallas.PreparedWeight(
        st.qtype, st.n, st.k, first(st.packed_t), first(st.qs_t),
        first(st.d_t), first(st.m_t), first(st.qh_t),
    )


def gemm_col_parallel(
    sw: ShardedWeight,
    act: jax.Array,
    mesh: Mesh,
    *,
    gather_output: bool = False,
    **kw,
):
    """C[M, N] with N sharded over ``sw.axis``; activations replicated.

    Returns [M, N/tp]-sharded output (P(None, axis)), or the gathered full
    [M, N] when ``gather_output``.
    """
    assert sw.mode == "col"
    axis = sw.axis
    act_specs = jax.tree.map(lambda x: P(*([None] * x.ndim)), act)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), act_specs),
        out_specs=P(None, axis),
        check_rep=False,
    )
    def run(stacked, a):
        local = _local_weight(ShardedWeight(sw.qtype, sw.n, sw.k, "col", axis, stacked))
        return gemm_pallas.gemm(local, a, **kw)

    out = run(sw.stacked, act)
    if gather_output:
        out = jax.lax.with_sharding_constraint(out, NamedSharding(mesh, P(None, None)))
    return out


def gemm_row_parallel(
    sw: ShardedWeight,
    act: jax.Array,
    mesh: Mesh,
    *,
    scatter_output: bool = False,
    **kw,
):
    """C[M, N] = sum over K-shards of local GEMMs; K sharded over sw.axis.

    ``act``: [M, K] (replicated or K-sharded; sliced locally inside the
    shard).  Output is the full [M, N] (psum over the axis), or
    reduce-scattered on N when ``scatter_output`` (the north star's
    partial-sum reduce-scatter path).
    """
    assert sw.mode == "row"
    axis = sw.axis

    out_spec = P(None, axis) if scatter_output else P(None, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=out_spec,
        check_rep=False,
    )
    def run(stacked, a_local):
        local = _local_weight(ShardedWeight(sw.qtype, sw.n, sw.k, "row", axis, stacked))
        partial = gemm_pallas.gemm(local, a_local, **kw)  # [M, N] partial
        if scatter_output:
            return jax.lax.psum_scatter(partial, axis, scatter_dimension=1, tiled=True)
        return jax.lax.psum(partial, axis)

    return run(sw.stacked, act)


def quantize_q8_1_sharded(x: jax.Array, mesh: Mesh, axis: str = "dp") -> Q8_1Tensor:
    """Quantize activations to Q8_1 with rows (batch) sharded over ``axis``.

    Data-parallel activation quantization: per-32-block structure is
    row-local, so sharding the token dim needs no communication.
    """
    from ..formats import jax_quant

    spec = NamedSharding(mesh, P(axis, None))
    x = jax.lax.with_sharding_constraint(x, spec)
    return jax_quant.quantize_q8_1(x)


__all__ = [
    "make_mesh",
    "ShardedWeight",
    "shard_weight",
    "gemm_col_parallel",
    "gemm_row_parallel",
    "quantize_q8_1_sharded",
]
