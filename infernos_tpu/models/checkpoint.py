"""Parameter checkpoint save/load (orbax, with npz fallback).

Capability parity: the reference caches converted models on disk (Whisper
ct2 conversion ``Cluster/InfernSTTWorker.py:27-35``, Qwen low-bit re-save
``Cluster/InfernLLMWorker.py:65,89-99``) so startup skips expensive
conversion.  Here: port once from HF (``models/*.port_from_hf``), save the
params pytree, reload at serving start.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np


def save(path: str, params: Any, config: Optional[Any] = None) -> None:
    """Save a params pytree (+ dataclass config) to ``path`` (directory)."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "params"), params, force=True)
    except Exception:
        # npz fallback: flatten with path keys
        flat = {}
        for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                           for k in kp)
            flat[key] = np.asarray(leaf)
        np.savez_compressed(os.path.join(path, "params.npz"), **flat)
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)


def load(path: str, like: Any) -> Any:
    """Load a params pytree saved by :func:`save`; ``like`` provides the
    structure (e.g. a freshly initialized params pytree)."""
    orbax_path = os.path.join(path, "params")
    if os.path.exists(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(orbax_path, item=like)
    npz_path = os.path.join(path, "params.npz")
    data = np.load(npz_path)
    leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(like)
    out = []
    for kp, leaf in leaves_kp:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        out.append(jax.numpy.asarray(data[key]))
    return jax.tree_util.tree_unflatten(treedef, out)


def load_config(path: str, cls) -> Any:
    with open(os.path.join(path, "config.json")) as f:
        d = json.load(f)
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        if isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        kwargs[k] = v
    return cls(**kwargs)
