"""Int8 weight-only quantization for the serving models.

Capability parity: the reference serves Whisper at int8 via ctranslate2
(``Cluster/InfernSTTWorker.py:36``) and Qwen at 4-bit via ipex-llm
(``Cluster/InfernLLMWorker.py:64-101``).  Here: per-output-channel symmetric
int8 for every linear weight; the matmul computes
``(x @ w_q.astype(compute_dtype)) * scale`` so XLA fuses the int8->bf16
convert into the dot's operand load -- weights occupy 4x less HBM and
decode-step weight traffic (the memory-bound cost of AR decode) drops
accordingly.

``layers.linear`` transparently consumes quantized param dicts
(``{"w_q", "scale"[, "b"]}``), so engines work unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

#: path fragments whose weights are accessed directly (not via layers.linear)
#: and must stay dense
DEFAULT_EXCLUDE = ("embed", "pos", "lm_head", "bn", "postnet", "conv")


def quantize_linear(p: dict) -> dict:
    """{"w": [in,out](, "b")} -> {"w_q": int8, "scale": f32[out](, "b")}.

    Also handles layer-stacked weights ``[L, in, out]`` (scan-over-layers
    models): per-layer, per-out-channel scales ``[L, out]``; under
    ``lax.scan`` each slice presents as a normal quantized linear.
    """
    w = p["w"]
    amax = jnp.maximum(jnp.max(jnp.abs(w), axis=-2), 1e-8)  # per out-channel
    scale = (amax / 127.0).astype(jnp.float32)
    w_q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _is_linear_leaf(node: Any) -> bool:
    return (isinstance(node, dict) and "w" in node
            and getattr(node["w"], "ndim", 0) in (2, 3)
            and set(node) <= {"w", "b"})


def quantize_params(params: Any, min_size: int = 4096,
                    exclude: Sequence[str] = DEFAULT_EXCLUDE) -> Any:
    """Walk a params pytree quantizing linear-layer weight dicts."""

    def walk(node: Any, path: str) -> Any:
        if _is_linear_leaf(node):
            if any(x in path for x in exclude):
                return node
            if node["w"].size < min_size:
                return node
            return quantize_linear(node)
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return walk(params, "")


def quantize_shardings(specs: Any, qparams: Any) -> Any:
    """Dense-layout ``PartitionSpec`` pytree -> one matching a
    :func:`quantize_params` output.

    ``qparams`` (arrays or ``ShapeDtypeStruct``s from ``eval_shape``) tells
    which linears actually got quantized; for those, ``w_q`` keeps the dense
    weight's spec and the per-out-channel ``scale`` keeps the spec's leading
    (layer-stack) + last (out-channel) axes -- so a column-parallel weight's
    scales shard with it and a row-parallel weight's scales replicate.
    Needed to place int8 TP weights (the 14B-over-v5e-4 serving point,
    reference ``Cluster/InfernLLMWorker.py:64-101``)."""
    from jax.sharding import PartitionSpec as P

    def walk(spec, node):
        if isinstance(node, dict) and "w_q" in node:
            wspec = spec["w"]
            out = {"w_q": wspec, "scale": P(*wspec[:-2], wspec[-1])}
            if "b" in node:
                out["b"] = spec["b"]
            return out
        if isinstance(node, dict):
            return {k: walk(spec[k], v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(spec[i], v) for i, v in enumerate(node)]
        return spec

    return walk(specs, qparams)


def quantized_bytes(params: Any) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))
