"""Device mesh and sharding layouts.

The reference scales by process-level session sharding over GPUs via Ray
logical resources (SURVEY.md section 2.9).  The TPU-native equivalent:

- **dp** axis: batch *slots* of the streaming engines shard across chips of
  an ICI-connected slice -- N chips serve N x slots concurrent sessions from
  one jitted program, collectives-free in steady state (each slot's decode is
  independent; XLA partitions the batch dimension).
- **tp** axis: tensor parallelism for the LLM (the one model that needs
  sharded weights, SURVEY.md section 2.9 "TPU-native equivalents"), with
  XLA-inserted all-reduces riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = [len(devs)] + [1] * (len(axes) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axes))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. model params) over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_tts_state(state, mesh: Mesh, axis: str = "dp"):
    """Shard a ``TTSState`` pytree's slot dimension over ``axis``.

    Cache tensors are ``[L, B, H, T, Dh]`` (slot axis 1); everything else is
    slot-major ``[B, ...]`` (axis 0).
    """

    def spec_for(x):
        if x.ndim >= 5:  # KV caches [L, B, H, T, Dh]
            return NamedSharding(mesh, P(None, axis))
        return NamedSharding(mesh, P(axis))

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec_for(x)), state
    )
