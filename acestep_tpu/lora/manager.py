"""Adapter lifecycle: load/save/unload/toggle/scale + merged-params cache.

Reference surface: lora/lifecycle.py + core/lora/service.py (add/load/
remove/unload, per-adapter scale, base-weight backup, registry, `LoraService`
facade wired to /v1/lora/* endpoints). JAX redesign: params are immutable
pytrees, so there is no backup/restore dance — the manager keeps the base
tree and lazily builds a merged tree under jit whenever the active adapter
set changes.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from acestep_tpu.lora.adapters import adapter_param_count, merge_weights


def save_adapter(path: str, adapter: dict) -> None:
    """Save as .npz (flat dotted keys) + JSON meta sidecar-in-archive."""
    flat: Dict[str, np.ndarray] = {}
    for name, pair in adapter["weights"].items():
        for part, value in pair.items():
            flat[f"{name}:{part}"] = np.asarray(value)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __meta__=np.frombuffer(
        json.dumps(adapter["meta"]).encode(), dtype=np.uint8), **flat)


def load_adapter_file(path: str) -> dict:
    """Load .npz adapters (ours) or .safetensors (foreign PEFT/LoKr dumps).

    Safetensors support reads `lora_A`/`lora_B`-style pairs and stacks
    per-layer tensors along a leading layer axis when the key encodes a
    layer index (`...layers.N...`)."""
    if os.path.isdir(path):
        # directory form (reference lora/lifecycle._resolve_lokr_weights:
        # a PEFT/LyCORIS dump dir): prefer the conventional filenames,
        # then any single adapter file inside
        for name in ("adapter_model.safetensors", "adapter.npz",
                     "pytorch_lora_weights.safetensors"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                return load_adapter_file(cand)
        cands = [n for n in sorted(os.listdir(path))
                 if n.endswith((".safetensors", ".npz"))]
        if len(cands) == 1:
            return load_adapter_file(os.path.join(path, cands[0]))
        raise ValueError(
            f"cannot resolve an adapter file in directory {path}: "
            f"candidates={cands}")
    if path.endswith(".npz"):
        with np.load(path) as data:
            meta = json.loads(bytes(data["__meta__"]).decode())
            weights: Dict[str, dict] = {}
            for key in data.files:
                if key == "__meta__":
                    continue
                name, part = key.rsplit(":", 1)
                weights.setdefault(name, {})[part] = jnp.asarray(data[key])
        return {"meta": meta, "weights": weights}
    if path.endswith(".safetensors"):
        return _load_safetensors_adapter(path)
    raise ValueError(f"unsupported adapter format: {path}")


def _load_safetensors_adapter(path: str) -> dict:
    import re

    from safetensors import safe_open

    # PEFT convention: adapter_config.json beside the safetensors carries
    # lora_alpha / r; without it delta strength would silently halve for
    # alpha != rank adapters.
    sidecar_alpha = sidecar_rank = None
    sidecar = os.path.join(os.path.dirname(os.path.abspath(path)),
                           "adapter_config.json")
    if os.path.exists(sidecar):
        try:
            with open(sidecar, "r", encoding="utf-8") as f:
                cfg = json.load(f)
            sidecar_alpha = cfg.get("lora_alpha")
            sidecar_rank = cfg.get("r")
        except (OSError, ValueError):
            pass

    per_layer: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    rank = None
    lokr_layers: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    with safe_open(path, framework="np") as f:
        all_keys = list(f.keys())
        for key in all_keys:
            # LyCORIS LoKr dumps (the reference's trained-LoKr format,
            # training/lokr_utils.save_lokr_weights): underscore-mangled
            # module names + lokr_w1/lokr_w2 (optionally factored _a/_b)
            lm = re.search(
                r"layers[._](\d+)[._](.+?)\."
                r"(lokr_w[12](?:_[ab])?|alpha|dora_scale)$", key)
            if lm:
                idx, raw_target, part = (int(lm.group(1)), lm.group(2),
                                         lm.group(3))
                target = (raw_target.replace("_", ".", 1)
                          if raw_target.startswith(("self_attn_",
                                                    "cross_attn_",
                                                    "mlp_"))
                          else raw_target).replace(
                    "gate_proj", "gate").replace("up_proj", "up").replace(
                    "down_proj", "down").replace("_", ".")
                # normalize e.g. 'self.attn.q.proj' artifacts back
                target = target.replace("self.attn", "self_attn").replace(
                    "cross.attn", "cross_attn").replace(
                    "q.proj", "q_proj").replace("k.proj", "k_proj").replace(
                    "v.proj", "v_proj").replace("o.proj", "o_proj")
                lokr_layers.setdefault(target, {}).setdefault(
                    idx, {})[part] = f.get_tensor(key)
                continue
        for key in all_keys:
            m = re.search(
                r"layers\.(\d+)\.(.+?)\."
                r"(lora_[AB]|lora_magnitude_vector)", key)
            if not m:
                continue
            idx, target, part = int(m.group(1)), m.group(2), m.group(3)
            target = target.replace(".weight", "").replace(
                "gate_proj", "gate").replace("up_proj", "up").replace(
                "down_proj", "down")
            arr = f.get_tensor(key)
            # PEFT stores (out, in): lora_A (r, in), lora_B (out, r)
            if part == "lora_A":
                arr = arr.T          # (in, r)
                rank = arr.shape[1]
                slot = "down"
            elif part == "lora_B":
                arr = arr.T          # (r, out)
                slot = "up"
            else:
                # DoRA (PEFT use_dora=True): per-output magnitude vector
                slot = "dora_m"
                arr = arr.reshape(-1)                       # (out,)
            per_layer.setdefault(target, {}).setdefault(idx, {})[slot] = arr
    weights = {}
    for target, by_layer in per_layer.items():
        idxs = sorted(by_layer)
        weights[target] = {
            "down": jnp.stack([jnp.asarray(by_layer[i]["down"]) for i in idxs]),
            "up": jnp.stack([jnp.asarray(by_layer[i]["up"]) for i in idxs]),
        }
        n_dora = sum("dora_m" in by_layer[i] for i in idxs)
        if n_dora == len(idxs):
            weights[target]["dora_m"] = jnp.stack(
                [jnp.asarray(by_layer[i]["dora_m"]) for i in idxs])
        elif n_dora:
            raise ValueError(
                f"{path}: {target} has lora_magnitude_vector for only "
                f"{n_dora}/{len(idxs)} layers; refusing to silently drop "
                f"DoRA on the rest")
    if lokr_layers and not weights:
        return _assemble_lokr_adapter(lokr_layers)
    if lokr_layers and weights:
        raise ValueError(
            f"{path} mixes PEFT lora_A/lora_B and LyCORIS lokr_w1/lokr_w2 "
            f"keys; split the adapters into separate files")
    if not weights:
        raise ValueError(
            f"no recognizable adapter keys in {path}: expected PEFT "
            f"lora_A/lora_B or LyCORIS lokr_w1/lokr_w2 layer keys")
    rank = sidecar_rank or rank or 16
    alpha = sidecar_alpha if sidecar_alpha is not None else rank
    return {"meta": {"kind": "lora", "rank": rank, "alpha": alpha},
            "weights": weights}


def _assemble_lokr_adapter(lokr_layers) -> dict:
    """LyCORIS lokr_w1/lokr_w2 tensors -> our stacked {a, b} factors.

    Torch factors are (out, in)-oriented: delta = kron(w1, w2). Our
    lokr_delta computes kron over (in, out)-oriented factors, and
    kron(A,B)^T == kron(A^T,B^T), so transposing each factor suffices.
    Factored w1_a/w1_b (resp. w2) compose by matmul first.

    Scale follows LyCORIS lokr semantics (lycoris/modules/lokr.py): with
    both factors stored full, alpha is ignored (scale 1); with a rank-
    factored pair, scale = alpha / lora_dim where lora_dim is the factored
    pair's inner rank. The per-module scale is baked into the `a` factor
    here (modules can carry different alphas), so `meta.alpha` stays 1.

    `dora_scale` magnitude tensors (LyCORIS dora_wd) map onto our per-
    target `dora_m` stack, which merge_weights applies kind-agnostically."""
    weights: Dict[str, dict] = {}
    for target, by_layer in lokr_layers.items():
        idxs = sorted(by_layer)
        a_rows, b_rows, dora_rows = [], [], []
        for i in idxs:
            parts = by_layer[i]
            w1 = parts.get("lokr_w1")
            rank = None
            if w1 is None and "lokr_w1_a" in parts:
                w1a = np.asarray(parts["lokr_w1_a"])
                w1 = w1a @ np.asarray(parts["lokr_w1_b"])
                rank = w1a.shape[1]
            w2 = parts.get("lokr_w2")
            if w2 is None and "lokr_w2_a" in parts:
                w2a = np.asarray(parts["lokr_w2_a"])
                w2 = w2a @ np.asarray(parts["lokr_w2_b"])
                rank = w2a.shape[1]
            if w1 is None or w2 is None:
                raise ValueError(
                    f"incomplete LoKr factors for {target} layer {i}")
            if rank is None:
                scale = 1.0          # both factors full: lycoris drops alpha
            else:
                alpha = parts.get("alpha")
                scale = (float(np.asarray(alpha)) / rank
                         if alpha is not None else 1.0)
            a_rows.append(np.asarray(w1).T * scale)   # (i1, o1), scaled
            b_rows.append(np.asarray(w2).T)           # (i2, o2)
            if "dora_scale" in parts:
                dora_rows.append(
                    np.asarray(parts["dora_scale"]).reshape(-1))
        if dora_rows and len(dora_rows) != len(idxs):
            raise ValueError(
                f"{target} has dora_scale for only {len(dora_rows)}/"
                f"{len(idxs)} layers; refusing to silently drop DoRA")
        weights[target] = {"a": jnp.stack([jnp.asarray(x) for x in a_rows]),
                           "b": jnp.stack([jnp.asarray(x) for x in b_rows])}
        if dora_rows:
            weights[target]["dora_m"] = jnp.stack(
                [jnp.asarray(x) for x in dora_rows])
    return {"meta": {"kind": "lokr", "alpha": 1.0}, "weights": weights}


class LoraManager:
    """Holds base params + named adapters; serves merged effective params."""

    def __init__(self, base_params: dict):
        self._base = base_params
        self._adapters: Dict[str, dict] = {}
        self._scales: Dict[str, float] = {}
        self._loaded_at: Dict[str, float] = {}
        self._active: Optional[str] = None
        self._enabled = True
        self._merged = None
        self._dirty = False
        self._lock = threading.Lock()
        self._merge_fns: Dict[str, Any] = {}   # meta-json -> jitted merge

    # -- service surface (maps to /v1/lora/*) ------------------------------

    def load(self, path: str, adapter_name: Optional[str] = None,
             scale: float = 1.0) -> Dict[str, Any]:
        adapter = load_adapter_file(path)
        name = adapter_name or os.path.splitext(os.path.basename(path))[0]
        with self._lock:
            self._adapters[name] = adapter
            self._scales[name] = scale
            self._loaded_at[name] = time.time()
            self._active = name
            self._dirty = True
        return {"adapter_name": name, "scale": scale,
                "params": adapter_param_count(adapter),
                "kind": adapter["meta"].get("kind", "lora")}

    def add(self, name: str, adapter: dict, scale: float = 1.0) -> None:
        """Register an in-memory adapter (training handoff)."""
        with self._lock:
            self._adapters[name] = adapter
            self._scales[name] = scale
            self._loaded_at[name] = time.time()
            self._active = name
            self._dirty = True

    def unload(self, adapter_name: Optional[str] = None) -> Dict[str, Any]:
        with self._lock:
            name = adapter_name or self._active
            if name is None or name not in self._adapters:
                return {"unloaded": None}
            was_active = self._active == name
            del self._adapters[name]
            self._scales.pop(name, None)
            self._loaded_at.pop(name, None)
            if was_active:
                self._active = next(iter(self._adapters), None)
                self._dirty = True
                self._merged = None   # release the model-sized merged tree
            # dropping an INACTIVE adapter can't change effective params:
            # no re-merge, no cache invalidation
            return {"unloaded": name, "active": self._active}

    def toggle(self, use_lora: bool) -> Dict[str, Any]:
        with self._lock:
            self._enabled = bool(use_lora)
            self._dirty = True
            if not self._enabled:
                # effective_params() short-circuits to _base while
                # disabled; keeping _merged would pin a second full model
                # copy in HBM indefinitely (16 GB-chip headroom)
                self._merged = None
            return {"use_lora": self._enabled, "active": self._active}

    def set_scale(self, scale: float,
                  adapter_name: Optional[str] = None) -> Dict[str, Any]:
        with self._lock:
            name = adapter_name or self._active
            if name is None or name not in self._adapters:
                raise KeyError(f"no such adapter: {name}")
            changed = self._scales.get(name, 1.0) != float(scale)
            self._scales[name] = float(scale)
            if name == self._active and changed:
                # only the active adapter's scale shapes effective params
                self._dirty = True
            return {"adapter_name": name, "scale": float(scale)}

    def status(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "use_lora": self._enabled,
                "active_adapter": self._active,
                "adapters": [
                    {"name": n,
                     "scale": self._scales.get(n, 1.0),
                     "kind": a["meta"].get("kind", "lora"),
                     "loaded_at": self._loaded_at.get(n)}
                    for n, a in self._adapters.items()
                ],
            }

    def signature(self) -> str:
        """Compact state string for output uuids (reference
        audio_utils_uuid_test.py: same request under different adapters or
        scales must produce different uuids). Only the ACTIVE adapter is
        encoded — it alone shapes effective params, so switching the
        active adapter changes the uuid while loading an unused one does
        not. Empty when disabled or nothing active."""
        with self._lock:
            if not self._enabled or self._active not in self._adapters:
                return ""
            return (f"{self._active}"
                    f"@{self._scales.get(self._active, 1.0):g}")

    # -- params ------------------------------------------------------------

    def effective_params(self) -> dict:
        """Base params with the active adapter merged (cached)."""
        with self._lock:
            if not self._enabled or self._active is None:
                return self._base
            if self._merged is None or self._dirty:
                adapter = self._adapters[self._active]
                scale = self._scales.get(self._active, 1.0)
                meta = adapter["meta"]
                meta_key = json.dumps(meta, sort_keys=True)
                if meta_key not in self._merge_fns:
                    from acestep_tpu.ops.quant import dequantize_params

                    def _merge(base, weights, scale, *, meta=meta):
                        # quantized base weights (incl. w8a8) dequantize
                        # before the delta add
                        return merge_weights(
                            dequantize_params(base, materialize_w8a8=True),
                            weights, scale, meta)

                    self._merge_fns[meta_key] = jax.jit(_merge)
                self._merged = self._merge_fns[meta_key](
                    self._base, adapter["weights"],
                    jnp.float32(scale))
                self._dirty = False
            return self._merged
