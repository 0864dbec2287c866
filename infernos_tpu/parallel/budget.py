"""Per-chip HBM budget accounting for sharded programs -- offline.

A model-parallel serving plan must be memory-validated BEFORE it meets
hardware: the reference discovers OOM at worker boot (its 14B worker just
asserts the 4-bit load fits one GPU, ``Cluster/InfernLLMWorker.py:64-101``);
here a failing budget is a *test failure*.  Everything works on
``jax.eval_shape`` outputs, so a 14B accounting runs in milliseconds on CPU
with zero materialization.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Tuple

import jax
import numpy as np

#: v5e: 16 GiB HBM per chip
V5E_HBM_BYTES = 16 * 1024**3


def _leaf_bytes_per_chip(shape: Tuple[int, ...], itemsize: int,
                         spec, axis_sizes: Mapping[str, int]) -> int:
    """Bytes one chip holds of a leaf laid out under ``spec``.

    Sharded dims divide by the mesh-axis size (ceil: XLA pads uneven
    shards); unsharded/missing dims replicate.
    """
    dims = list(shape)
    if spec is not None:
        for i, ax in enumerate(spec):
            if ax is None or i >= len(dims):
                continue
            axes = ax if isinstance(ax, tuple) else (ax,)
            div = 1
            for a in axes:
                div *= int(axis_sizes[a])
            dims[i] = math.ceil(dims[i] / div)
    if not dims:
        return itemsize
    return int(np.prod([max(1, d) for d in dims], dtype=np.int64)) * itemsize


def per_chip_bytes(shapes: Any, specs: Any,
                   axis_sizes: Mapping[str, int]) -> int:
    """Total per-chip bytes of a pytree of arrays/ShapeDtypeStructs placed
    under a matching pytree of ``PartitionSpec``s."""
    total = 0
    s_leaves = jax.tree_util.tree_leaves(shapes)
    # PartitionSpec is a natural pytree leaf; bare None (replicated) must
    # count as one too, or the trees misalign
    p_leaves = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: x is None)
    if len(s_leaves) != len(p_leaves):
        raise ValueError(
            f"shape/spec tree mismatch: {len(s_leaves)} vs {len(p_leaves)} leaves")
    for leaf, spec in zip(s_leaves, p_leaves):
        total += _leaf_bytes_per_chip(tuple(leaf.shape), leaf.dtype.itemsize,
                                      spec, axis_sizes)
    return total


def replicated_bytes(shapes: Any) -> int:
    """Per-chip bytes of an unsharded (replicated) pytree."""
    return sum(int(np.prod(x.shape, dtype=np.int64)) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(shapes))


def budget_report(parts: Dict[str, int], limit: int = V5E_HBM_BYTES,
                  headroom: float = 0.10) -> Dict[str, Any]:
    """Summarize named per-chip byte contributions against an HBM limit.

    ``headroom`` reserves a fraction of HBM for XLA scratch/fragmentation
    (fusion temporaries are not visible to shape accounting).
    """
    total = sum(parts.values())
    usable = int(limit * (1.0 - headroom))
    return {
        "parts_gib": {k: round(v / 1024**3, 3) for k, v in parts.items()},
        "total_gib": round(total / 1024**3, 3),
        "usable_gib": round(usable / 1024**3, 3),
        "fits": total <= usable,
    }
