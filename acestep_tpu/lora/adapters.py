"""Adapter math: LoRA and LoKr factors over stacked decoder layers.

Reference targets (training/lora_utils.py: PEFT injection on decoder
linears): self/cross-attention q/k/v/o projections and MLP gate/up/down.
Here each target is one leaf of the stacked layer tree
`decoder.layers.{...}.w` with shape (L, in, out); its adapter is
`down: (L, in, r)` and `up: (L, r, out)` (LoRA) or Kronecker factors
(LoKr), merged as `W + scale * delta` in one einsum per target.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

# path components under params["decoder"]["layers"], all ending at a "w" leaf
LORA_TARGETS: Tuple[Tuple[str, ...], ...] = (
    ("self_attn", "q_proj"),
    ("self_attn", "k_proj"),
    ("self_attn", "v_proj"),
    ("self_attn", "o_proj"),
    ("cross_attn", "q_proj"),
    ("cross_attn", "k_proj"),
    ("cross_attn", "v_proj"),
    ("cross_attn", "o_proj"),
    ("mlp", "gate"),
    ("mlp", "up"),
    ("mlp", "down"),
)


def _get(tree: dict, path: Sequence[str]):
    for key in path:
        tree = tree[key]
    return tree


def _key(path: Sequence[str]) -> str:
    return ".".join(path)


def target_paths(params: dict,
                 targets: Sequence[Tuple[str, ...]] = LORA_TARGETS
                 ) -> Dict[str, jnp.ndarray]:
    """Map 'self_attn.q_proj' -> stacked weight (L, in, out)."""
    layers = params["decoder"]["layers"]
    return {_key(p): _get(layers, p)["w"] for p in targets}


# ------------------------------------------------------------------
# LoRA
# ------------------------------------------------------------------


def init_lora(key, params: dict, *, rank: int = 16, alpha: float = 32.0,
              targets: Sequence[Tuple[str, ...]] = LORA_TARGETS,
              dtype=jnp.float32) -> dict:
    """Adapter tree {meta, weights:{target: {down, up}}}. `down` is Gaussian,
    `up` zeros (standard LoRA init: delta starts at 0)."""
    weights = {}
    shapes = target_paths(params, targets)
    keys = jax.random.split(key, len(shapes))
    for k, (name, w) in zip(keys, sorted(shapes.items())):
        L, d_in, d_out = w.shape
        weights[name] = {
            "down": jax.random.normal(k, (L, d_in, rank), dtype) / (d_in ** 0.5),
            "up": jnp.zeros((L, rank, d_out), dtype),
        }
    return {"meta": {"kind": "lora", "rank": rank, "alpha": alpha},
            "weights": weights}


def lora_delta(adapter_weights: dict, name: str, alpha: float,
               rank: int) -> jnp.ndarray:
    aw = adapter_weights[name]
    scale = alpha / rank
    return jnp.einsum("lir,lro->lio", aw["down"], aw["up"]) * scale


# ------------------------------------------------------------------
# LoKr (Kronecker product factorization, LyCORIS-style)
# ------------------------------------------------------------------


def _kron_factor(n: int, max_factor: int) -> Tuple[int, int]:
    """Split n = a*b with a <= max_factor, a as large as possible."""
    best = (1, n)
    for a in range(2, min(max_factor, n) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def init_lokr(key, params: dict, *, factor: int = 8, alpha: float = 1.0,
              targets: Sequence[Tuple[str, ...]] = LORA_TARGETS,
              dtype=jnp.float32) -> dict:
    """delta(W) = kron(A, B): A (L, a1, a2) Gaussian, B (L, b1, b2) zeros,
    where in=a1*b1, out=a2*b2."""
    weights = {}
    shapes = target_paths(params, targets)
    keys = jax.random.split(key, len(shapes))
    for k, (name, w) in zip(keys, sorted(shapes.items())):
        L, d_in, d_out = w.shape
        a1, b1 = _kron_factor(d_in, factor)
        a2, b2 = _kron_factor(d_out, factor)
        weights[name] = {
            "a": jax.random.normal(k, (L, a1, a2), dtype) / (a1 ** 0.5),
            "b": jnp.zeros((L, b1, b2), dtype),
        }
    return {"meta": {"kind": "lokr", "factor": factor, "alpha": alpha},
            "weights": weights}


def lokr_delta(adapter_weights: dict, name: str, alpha: float) -> jnp.ndarray:
    aw = adapter_weights[name]
    a, b = aw["a"], aw["b"]
    L, a1, a2 = a.shape
    _, b1, b2 = b.shape
    # batched Kronecker: (L, a1*b1, a2*b2)
    kron = jnp.einsum("lij,lkm->likjm", a, b).reshape(L, a1 * b1, a2 * b2)
    return kron * alpha


# ------------------------------------------------------------------
# Merge
# ------------------------------------------------------------------


def merge_weights(params: dict, weights: dict, scale, meta: dict) -> dict:
    """Return a params tree with `W + scale * delta` on every target.

    `weights` is the adapter weight tree (array leaves only — jit-safe);
    `meta` is static config ({kind, alpha, rank/factor})."""
    kind = meta.get("kind", "lora")

    layers = params["decoder"]["layers"]
    new_layers = jax.tree.map(lambda x: x, layers)  # shallow structural copy

    for name in weights:
        path = tuple(name.split("."))
        if kind == "lora":
            delta = lora_delta(weights, name, meta.get("alpha", 32.0),
                               meta.get("rank", 16))
        else:
            delta = lokr_delta(weights, name, meta.get("alpha", 1.0))
        node = _get(new_layers, path[:-1])
        leaf = dict(node[path[-1]])
        merged = leaf["w"] + (scale * delta).astype(leaf["w"].dtype)
        if "dora_m" in weights[name]:
            # DoRA weight decomposition (PEFT use_dora / LyCORIS dora_wd,
            # reference lora/lifecycle.py:131-147): the learned magnitude
            # vector m replaces the merged weight's per-output-column norm
            # — W' = m * (W + scale*delta) / ||W + scale*delta||_col
            m = weights[name]["dora_m"].astype(merged.dtype)   # (L, out)
            norm = jnp.sqrt(jnp.sum(
                merged.astype(jnp.float32) ** 2, axis=1, keepdims=True))
            merged = (merged / jnp.maximum(norm, 1e-8).astype(merged.dtype)
                      * m[:, None, :])
        leaf["w"] = merged
        node[path[-1]] = leaf

    new_params = dict(params)
    new_decoder = dict(params["decoder"])
    new_decoder["layers"] = new_layers
    new_params["decoder"] = new_decoder
    return new_params


def merge_adapter(params: dict, adapter: dict, scale: float = 1.0) -> dict:
    """Convenience eager merge of an {meta, weights} adapter."""
    return merge_weights(params, adapter["weights"], scale, adapter["meta"])


def adapter_param_count(adapter: dict) -> int:
    leaves = jax.tree.leaves(adapter["weights"])
    return int(sum(x.size for x in leaves))
