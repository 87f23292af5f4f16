"""Int8 weight-only quantization for param trees.

Capability parity with the reference's torchao quantization policies
(init_service_loader.py:89-114: int8_weight_only / fp8_weight_only /
w8a8_dynamic applied to the DiT only, excluding tokenizer/detokenizer).
TPU-native version: weight matrices are stored as int8 with per-output-
channel float scales; `dequantize_params` runs inside the jitted program so
XLA fuses the dequant into the consuming matmul. Halves weight HBM vs bf16
(the 4 GB-class deployment knob) at ~1e-2 relative weight error.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

QUANT_KEY = "__int8__"


def _is_quantizable(path_keys: Sequence[str], leaf) -> bool:
    """Quantize linear weight matrices only (2D+ 'w' leaves); norms, biases,
    embeddings-by-name, and modulation tables stay full precision."""
    return bool(path_keys) and path_keys[-1] == "w" and leaf.ndim >= 2


def _path_keys(path) -> list:
    return [p.key for p in path if isinstance(p, jax.tree_util.DictKey)]


def quantize_tree_int8(params: dict, *,
                       exclude_prefixes: Tuple[str, ...] = (
                           "tokenizer", "detokenizer")) -> dict:
    """Replace weight leaves with {QUANT_KEY: int8, 'scale': f32} nodes.

    exclude_prefixes mirrors the reference's DiT-only filter (the FSQ
    tokenizer/detokenizer are numerically sensitive, ref :100-108)."""
    def rule(path, leaf):
        keys = _path_keys(path)
        if keys and keys[0] in exclude_prefixes:
            return leaf
        if not _is_quantizable(keys, leaf):
            return leaf
        w = jnp.asarray(leaf, jnp.float32)
        # scale per output channel AND per leading (layer) axis: stacked
        # layer leaves are (L, in, out) — reducing only the in-features axis
        # keeps each layer's scale independent
        amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {QUANT_KEY: q, "scale": scale.astype(jnp.float32)}

    return jax.tree_util.tree_map_with_path(rule, params)


def _is_quant_node(node) -> bool:
    return isinstance(node, dict) and QUANT_KEY in node


def dequantize_params(params, dtype=jnp.bfloat16):
    """Materialize full-precision weights from a quantized tree.

    Pure function — call at the top of a jitted program; XLA fuses the
    int8->bf16 multiply into the consumer."""
    def rule(node):
        if _is_quant_node(node):
            return (node[QUANT_KEY].astype(jnp.float32)
                    * node["scale"]).astype(dtype)
        return node

    return jax.tree.map(rule, params, is_leaf=_is_quant_node)


def quantized_bytes(params) -> int:
    """Total parameter bytes of a (possibly quantized) tree."""
    return int(sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(params)))
