"""Device mesh + sharding rules (GSPMD-first).

The reference's distribution story is NCCL tensor-parallel inside nano-vllm
plus declared-but-unused transformers TP/PP plans
(/root/reference/acestep/models/turbo/configuration_acestep_v15.py:133-146,
third_parts/nano-vllm/nanovllm/distributed.py). The TPU-native replacement is
a `jax.sharding.Mesh` over ICI with `NamedSharding` annotations; XLA inserts
the collectives (all-gather / reduce-scatter / psum) that NCCL calls perform
by hand.

Axes:
- ``dp``: data parallel — batch of songs / LM sequences sharded.
- ``tp``: tensor parallel — attention heads + MLP intermediate sharded,
  matching the reference's declared colwise/rowwise plan (q/k/v/gate/up are
  column-parallel = shard output dim; o/down are row-parallel = shard input
  dim, reduced by XLA with a psum).

Param pytrees here are plain nested dicts (models/dit.py, models/lm.py);
rules are keyed on the dict path, with PartitionSpecs padded on the left for
the stacked-layer leading axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Column-parallel (shard output features) / row-parallel (shard input features)
_COL_KEYS = ("q_proj", "k_proj", "v_proj", "gate", "up")
_ROW_KEYS = ("o_proj", "down")


def parse_mesh_spec(spec) -> Optional[tuple]:
    """Operator mesh spec -> (dp, tp) or None.

    Accepts 'DPxTP' ('4x2'), a bare integer ('8' = pure data parallel),
    or ''/None/'1'/'1x1' (no mesh). This is the product surface for
    multi-chip serving: `--mesh` on the API server / CLI / profiler and
    the ACESTEP_MESH env var (the reference exposes its TP degree in
    nano-vllm config, nanovllm/config.py:17,25; here the whole dp x tp
    mesh is one flag)."""
    if spec is None:
        return None
    s = str(spec).strip().lower().replace("*", "x")
    if not s:
        return None
    try:
        if "x" in s:
            dp_s, tp_s = s.split("x", 1)
            dp, tp = int(dp_s), int(tp_s)
        else:
            dp, tp = int(s), 1
    except ValueError:
        raise ValueError(
            f"bad mesh spec {spec!r}: expected 'DPxTP' (e.g. '4x2') or a "
            "device count (e.g. '8')") from None
    if dp < 1 or tp < 1:
        raise ValueError(f"bad mesh spec {spec!r}: dp/tp must be >= 1")
    if dp * tp == 1:
        return None
    return dp, tp


def make_mesh(dp: int = 1, tp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {len(devices)}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _path_keys(path) -> list:
    return [p.key for p in path if isinstance(p, jax.tree_util.DictKey)]


def _linear_spec(keys, leaf, tp_axis: str):
    """PartitionSpec for one leaf given its dict path. Returns None to
    replicate. Quantized linears (ops/quant: 'w' replaced by a
    {q_key: int8/fp8, 'scale': f32} node) shard like their plain weight —
    otherwise TP on a quantized model would silently replicate everything."""
    if keys and keys[-1] == "w":
        sub = None
    elif len(keys) >= 2 and keys[-2] == "w":
        sub = keys[-1]              # quantized payload or 'scale'
    else:
        return None  # biases / norms / tables replicated
    parent_idx = -2 if sub is None else -3
    parent = keys[parent_idx] if len(keys) >= -parent_idx else ""
    if parent in _COL_KEYS:
        # q has w's shape; scale is (..., 1, out) — both shard the out dim
        spec = (None, tp_axis)
    elif parent in _ROW_KEYS:
        if sub == "scale":
            return None   # per-OUT-channel scale; the sharded dim is IN
        spec = (tp_axis, None)
    else:
        return None
    pad = leaf.ndim - len(spec)
    return P(*([None] * pad + list(spec)))


def dit_param_pspecs(params: dict, tp_axis: str = "tp") -> dict:
    """PartitionSpec tree for a DiT param tree (init_dit_params layout).

    Attention + MLP projections are TP-sharded; convs, norms, embeddings and
    modulation tables are replicated (they are small)."""
    def rule(path, leaf):
        spec = _linear_spec(_path_keys(path), leaf, tp_axis)
        return spec if spec is not None else P()

    return jax.tree_util.tree_map_with_path(rule, params)


def lm_param_pspecs(params: dict, tp_axis: str = "tp") -> dict:
    """PartitionSpec tree for the Qwen3 LM (init_lm_params layout).
    embed_tokens (vocab, H) is vocab-sharded so the tied lm_head matmul and
    the one-hot gather both split over tp."""
    def rule(path, leaf):
        keys = _path_keys(path)
        if keys and keys[-1] == "embed_tokens" and leaf.ndim == 2:
            return P(tp_axis, None)
        if "head_q" in keys and leaf.ndim == 2:
            # w8a8 int8 output head (models/lm.build_head_q): q (V, H) and
            # scale (V, 1) are rows-along-vocab like the tied embed head —
            # without this rule the largest per-step decode read stayed
            # replicated on every chip under tensor parallelism
            return P(tp_axis, None)
        spec = _linear_spec(keys, leaf, tp_axis)
        return spec if spec is not None else P()

    return jax.tree_util.tree_map_with_path(rule, params)


def sanitize_pspecs(params: dict, pspecs: dict, mesh: Mesh) -> dict:
    """Replicate any leaf whose sharded dims aren't divisible by the mesh
    axis size (e.g. an odd vocab under tp=2) instead of erroring."""
    def fix(leaf, spec):
        for axis_idx, name in enumerate(spec):
            if name is None:
                continue
            size = mesh.shape[name]
            if axis_idx >= leaf.ndim or leaf.shape[axis_idx] % size:
                return P()
        return spec

    return jax.tree.map(fix, params, pspecs)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "dp"):
    """Shard axis 0 (batch) over dp, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_pytree(params: dict, mesh: Mesh, pspecs: dict) -> dict:
    """Place a param tree on the mesh according to a PartitionSpec tree."""
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, pspecs,
    )
