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
        stack("qh2_t"),
    )
    return ShardedWeight(w_q.spec.name, n, k, mode, axis, stacked)


def _local_weight(sw: ShardedWeight) -> gemm_pallas.PreparedWeight:
    """Inside shard_map: strip the (length-1) leading device axis."""
    st = sw.stacked

    def first(x):
        return None if x is None else x[0]

    return gemm_pallas.PreparedWeight(
        st.qtype, st.n, st.k, first(st.packed_t), first(st.qs_t),
        first(st.d_t), first(st.m_t), first(st.qh_t), first(st.qh2_t),
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


def shard_weight_ring(w_q, mesh: Mesh, axis: str = "tp",
                      mode: str = "col") -> ShardedWeight:
    """Shard for the RING overlap kernels (gemm_*_parallel_ring).

    mode='col' (ring all-gather GEMM): out-features are device-sharded and
    each device's K extent is pre-split into ``tp`` independently prepared
    chunks — the ring rotates activation K-chunks while the matching weight
    K-chunk GEMM runs.  mode='row' (ring reduce-scatter GEMM): K is
    device-sharded and each device's N extent is pre-split into ``tp``
    chunks — the ring rotates output partial-sum chunks.

    Stacked planes are ``[tp_dev, tp_chunk, rows, cols]`` sharded
    ``P(axis)`` on dim 0; every chunk is a self-contained planar container
    (chunk-local K padding contributes exactly zero), so per-chunk GEMMs
    sum to the unsharded result.
    """
    tp = mesh.shape[axis]
    if hasattr(w_q, "qs"):
        n, k = np.asarray(w_q.qs).shape
    else:
        n, k = np.asarray(w_q.packed).shape
        k *= 2
    # col: K splits tp-ways inside each device; row: K splits tp-ways across
    # devices.  Either way chunks must stay whole-block (32) sized, and N
    # must split tp-ways (across devices for col, within for row).
    assert k % (tp * 32) == 0 and n % tp == 0, (n, k, tp, mode)
    outer = _split_container(w_q, mode == "col", tp)  # per-device chunks
    grids = [
        [gemm_pallas.prepare(c)
         for c in _split_container(dev, mode != "col", tp)]
        for dev in outer
    ]
    g0 = grids[0][0]

    def stack(field):
        if getattr(g0, field) is None:
            return None
        arr = jnp.stack([
            jnp.stack([jnp.asarray(getattr(c, field)) for c in row])
            for row in grids
        ])  # [tp_dev, tp_chunk, rows, cols]
        return jax.device_put(
            arr, NamedSharding(mesh, P(axis, None, None, None)))

    stacked = gemm_pallas.PreparedWeight(
        g0.qtype, g0.n, g0.k, stack("packed_t"), stack("qs_t"),
        stack("d_t"), stack("m_t"), stack("qh_t"), stack("qh2_t"),
    )
    return ShardedWeight(w_q.spec.name, n, k, mode + "_ring", axis, stacked)


def _pick_chunk(st: gemm_pallas.PreparedWeight, c) -> gemm_pallas.PreparedWeight:
    """Inside shard_map: select ring chunk ``c`` from [1, tp, r, cols] planes."""

    def pick(p):
        if p is None:
            return None
        return jax.lax.dynamic_index_in_dim(p[0], c, 0, keepdims=False)

    return gemm_pallas.PreparedWeight(
        st.qtype, st.n, st.k, pick(st.packed_t), pick(st.qs_t),
        pick(st.d_t), pick(st.m_t), pick(st.qh_t), pick(st.qh2_t),
    )


def _ring_gemm(wchunk, act_chunk, quantized: bool, kw: dict):
    if quantized:
        from ..kernels.gemm_exact import gemm_exact

        return gemm_exact(wchunk, act_chunk, **kw)
    return gemm_pallas.gemm(wchunk, act_chunk, **kw)


def gemm_col_parallel_ring(
    sw: ShardedWeight,
    act: jax.Array,
    mesh: Mesh,
    *,
    quantize_act: bool = True,
    gather_output: bool = False,
    **kw,
):
    """Column-parallel GEMM with the activation all-gather DECOMPOSED into a
    ``ppermute`` ring that overlaps with per-chunk MXU GEMMs.

    Activations arrive K-sharded (``P(None, axis)`` — e.g. straight out of a
    ring reduce-scatter layer); each device quantizes its chunk to Q8_1
    locally once, then the quantized blocks (36 B / 32 elements — the cheap
    Q8_1 gather of the north star) rotate around the ICI ring while the
    GEMM for the chunk already on-device runs.  XLA's latency-hiding
    scheduler issues each ``collective-permute-start`` before the chunk
    GEMM and the ``-done`` after it (asserted by tests/test_overlap.py on a
    deviceless v5e compile), so the gather rides entirely under compute —
    SURVEY §5.8's "collectives overlapped with MXU compute".

    Output: ``[M, N]`` N-sharded over ``axis`` (replicated when
    ``gather_output``).
    """
    assert sw.mode == "col_ring", sw.mode
    axis = sw.axis
    tp = mesh.shape[axis]
    perm = [(i, (i - 1) % tp) for i in range(tp)]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=P(None, axis),
        check_rep=False,
    )
    def run(stacked, a_local):
        from ..formats import jax_quant

        idx = jax.lax.axis_index(axis)
        chunk = jax_quant.quantize_q8_1(a_local) if quantize_act else a_local
        acc = None
        for s in range(tp):
            wchunk = _pick_chunk(stacked, (idx + s) % tp)
            part = _ring_gemm(wchunk, chunk, quantize_act, kw)
            acc = part if acc is None else acc + part
            if s < tp - 1:
                chunk = jax.tree.map(
                    lambda x: jax.lax.ppermute(x, axis, perm), chunk)
        return acc

    out = run(sw.stacked, act)
    if gather_output:
        out = jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(None, None)))
    return out


def gemm_row_parallel_ring(
    sw: ShardedWeight,
    act: jax.Array,
    mesh: Mesh,
    *,
    quantize_act: bool = True,
    **kw,
):
    """Row-parallel GEMM with the partial-sum reduce-scatter DECOMPOSED into
    a ``ppermute`` ring overlapped with per-chunk MXU GEMMs.

    Each device holds a K-shard of the weight pre-split into ``tp``
    N-chunks; at ring step ``s`` device ``d`` computes the partial for
    output chunk ``(d+s+1) % tp`` and adds it to the accumulator arriving
    from its neighbour, so the rotating partial-sum transfer hides under
    the next chunk's GEMM.  After ``tp`` steps device ``d`` holds output
    chunk ``d`` fully reduced — a matmul-fused reduce-scatter.

    Output: ``[M, N]`` N-sharded over ``axis`` (the scatter_output layout
    of :func:`gemm_row_parallel`, ready to feed a col_ring layer).
    """
    assert sw.mode == "row_ring", sw.mode
    axis = sw.axis
    tp = mesh.shape[axis]
    perm = [(i, (i - 1) % tp) for i in range(tp)]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=P(None, axis),
        check_rep=False,
    )
    def run(stacked, a_local):
        from ..formats import jax_quant

        idx = jax.lax.axis_index(axis)
        aq = jax_quant.quantize_q8_1(a_local) if quantize_act else a_local
        acc = None
        for s in range(tp):
            wchunk = _pick_chunk(stacked, (idx + s + 1) % tp)
            part = _ring_gemm(wchunk, aq, quantize_act, kw)
            acc = part if acc is None else acc + part
            if s < tp - 1:
                acc = jax.lax.ppermute(acc, axis, perm)
        return acc

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
    "shard_weight_ring",
    "gemm_col_parallel",
    "gemm_row_parallel",
    "gemm_col_parallel_ring",
    "gemm_row_parallel_ring",
    "quantize_q8_1_sharded",
]
