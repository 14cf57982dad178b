"""Checkpoint save/load for packed quantized weights.

The reference has no persistence (SURVEY §5.4); per the build plan, packed
block tensors saved/loaded as flat arrays is sufficient for parity with the
GGUF-adjacent workflow.  Two forms:

* :func:`save_npz` / :func:`load_npz` — SoA containers (and nested dicts of
  them, e.g. a quantized model) into a single ``.npz``;
* the AoS byte boundary (:mod:`quant_gemm_tpu.formats.gguf`) remains the
  interchange path with llama.cpp tooling.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from .blocks import TENSOR_TYPES


def _flatten(tree, prefix=""):
    """Yield (key, container-or-array) with '/'-joined paths."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}/")
    else:
        yield prefix.rstrip("/"), tree


def save_npz(path, tree) -> None:
    """Save a (nested) structure of SoA containers / arrays to .npz."""
    arrays: dict[str, np.ndarray] = {}
    manifest: dict[str, dict] = {}
    for key, node in _flatten(tree):
        if hasattr(node, "_fields") and hasattr(node, "spec"):
            manifest[key] = {"qtype": node.spec.name, "fields": list(node._fields)}
            for f in node._fields:
                arrays[f"{key}::{f}"] = np.asarray(getattr(node, f))
        else:
            manifest[key] = {"qtype": None}
            arrays[f"{key}::"] = np.asarray(node)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_npz(path):
    """Inverse of :func:`save_npz`; returns a flat {path: value} dict."""
    data = np.load(path)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    out = {}
    for key, info in manifest.items():
        if info["qtype"] is None:
            out[key] = data[f"{key}::"]
        else:
            cls = TENSOR_TYPES[info["qtype"]]
            out[key] = cls(**{f: data[f"{key}::{f}"] for f in info["fields"]})
    return out


__all__ = ["save_npz", "load_npz"]
