"""Flat-npz (de)serialization for params pytrees of dicts/lists.

Used for the small in-repo trained checkpoints (VAD, AmendmentNetwork).
Keys are jax ``keystr`` paths like ``['lstm'][0]['wi']``; loading rebuilds
the nested structure.  Orbax handles the big model checkpoints
(``models/checkpoint.py``); this stays dependency-light for vendored data.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_params(path: str, params: Any) -> None:
    flat = {}
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[jax.tree_util.keystr(kpath)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.exists(path):
        return None
    raw = np.load(path)
    root: Dict[str, Any] = {}
    for key in raw.files:
        val = jnp.asarray(raw[key])
        parts = [s.strip("'") for s in
                 key.replace("]", "").split("[") if s.strip("'")]
        node = root
        for i, part in enumerate(parts[:-1]):
            idx: Any = int(part) if part.isdigit() else part
            nxt_is_int = parts[i + 1].isdigit()
            if isinstance(node, list):
                while len(node) <= idx:
                    node.append([] if nxt_is_int else {})
                node = node[idx]
            else:
                if idx not in node:
                    node[idx] = [] if nxt_is_int else {}
                node = node[idx]
        last = parts[-1]
        if isinstance(node, list):
            li = int(last)
            while len(node) <= li:
                node.append(None)
            node[li] = val
        else:
            node[int(last) if last.isdigit() else last] = val
    return root


def data_path(name: str) -> str:
    """Checkpoint-data dir for ``name`` (e.g. ``tiny_stt``).

    ``INFERNOS_TINY_DATA_<NAME>`` overrides the committed location so
    freshly trained scratch checkpoints can be evaluated (and gated)
    WITHOUT overwriting the known-good tree copy first.
    """
    override = os.environ.get(f"INFERNOS_TINY_DATA_{name.upper()}")
    if override:
        return override
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", name)
