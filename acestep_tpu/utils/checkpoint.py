"""Checkpoint conversion: reference torch/HF checkpoints -> JAX param trees.

Name layouts converted (see SURVEY.md §2.1):
- DiT: AceStepConditionGenerationModel state dict
  (/root/reference/acestep/models/turbo/modeling_acestep_v15_turbo.py module
  attribute names, e.g. ``decoder.layers.3.self_attn.q_proj.weight``) ->
  acestep_tpu.models.dit.init_dit_params layout (stacked layer axes).
- VAE: diffusers AutoencoderOobleck (weight-normed convs are fused at load:
  w = g * v / ||v||).
- LM / text encoder: HF Qwen3ForCausalLM / Qwen3 Embedding.

Layout conventions of the JAX side (acestep_tpu/ops/basic.py):
- Linear ``w`` is (in, out)  == torch weight.T
- Conv1d ``w`` is (k, in, out) == torch (out, in, k) transposed (2, 1, 0)
- ConvTranspose1d ``w`` is (k, in, out) == torch (in, out, k) transposed (2, 0, 1)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------------
# safetensors / torch IO
# ------------------------------------------------------------------


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a HF checkpoint dir (single file or sharded)."""
    from safetensors.numpy import load_file

    p = Path(path)
    if p.is_file():
        return dict(load_file(str(p)))
    out: Dict[str, np.ndarray] = {}
    index = p / "model.safetensors.index.json"
    if index.exists():
        shards = set(json.loads(index.read_text())["weight_map"].values())
        for shard in sorted(shards):
            out.update(load_file(str(p / shard)))
        return out
    files = sorted(p.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors under {p}")
    for f in files:
        out.update(load_file(str(f)))
    return out


def load_torch_file(path: str) -> np.ndarray:
    """Load a single-tensor torch file (e.g. silence_latent.pt)."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(t, dict):  # state-dict style: first value
        t = next(iter(t.values()))
    return t.float().numpy()


# ------------------------------------------------------------------
# helpers
# ------------------------------------------------------------------


def _fuse_weight_norm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fuse torch weight_norm pairs into plain ``weight`` entries.

    Handles both legacy (weight_g/weight_v) and parametrize-style
    (parametrizations.weight.original0/original1) naming."""
    out: Dict[str, np.ndarray] = {}
    done = set()
    for name in state:
        if name.endswith("weight_g"):
            base = name[: -len("weight_g")]
            g, v = state[name], state[base + "weight_v"]
        elif name.endswith("parametrizations.weight.original0"):
            base = name[: -len("parametrizations.weight.original0")]
            g, v = state[name], state[base + "parametrizations.weight.original1"]
        else:
            continue
        norm = np.sqrt(np.sum(v.astype(np.float64) ** 2,
                              axis=tuple(range(1, v.ndim)), keepdims=True))
        out[base + "weight"] = (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)
        done.add(name)
        done.add(base + ("weight_v" if name.endswith("weight_g")
                         else "parametrizations.weight.original1"))
    for name, t in state.items():
        if name not in done and name not in out:
            out[name] = t
    return out


def _to_jnp(x: np.ndarray, dtype) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x, np.float32), dtype=dtype)


class _Src:
    """Name-indexed tensor source with access tracking."""

    def __init__(self, state: Dict[str, np.ndarray], dtype):
        self.state = state
        self.dtype = dtype
        self.used: set = set()

    def has(self, name: str) -> bool:
        return name in self.state

    def raw(self, name: str) -> np.ndarray:
        self.used.add(name)
        return self.state[name]

    def linear(self, prefix: str) -> dict:
        p = {"w": _to_jnp(self.raw(prefix + ".weight").T, self.dtype)}
        if self.has(prefix + ".bias"):
            p["b"] = _to_jnp(self.raw(prefix + ".bias"), self.dtype)
        return p

    def conv1d(self, prefix: str) -> dict:
        p = {"w": _to_jnp(self.raw(prefix + ".weight").transpose(2, 1, 0), self.dtype)}
        if self.has(prefix + ".bias"):
            p["b"] = _to_jnp(self.raw(prefix + ".bias"), self.dtype)
        return p

    def conv1d_transpose(self, prefix: str) -> dict:
        p = {"w": _to_jnp(self.raw(prefix + ".weight").transpose(2, 0, 1), self.dtype)}
        if self.has(prefix + ".bias"):
            p["b"] = _to_jnp(self.raw(prefix + ".bias"), self.dtype)
        return p

    def norm(self, prefix: str) -> dict:
        return {"scale": _to_jnp(self.raw(prefix + ".weight"), self.dtype)}

    def tensor(self, name: str, squeeze=()) -> jnp.ndarray:
        t = self.raw(name)
        for ax in sorted(squeeze, reverse=True):
            t = np.squeeze(t, axis=ax)
        return _to_jnp(t, self.dtype)

    def unused(self):
        return sorted(set(self.state) - self.used)


def _stack_layers(n: int, make: Callable[[int], dict]) -> dict:
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *[make(i) for i in range(n)])


# ------------------------------------------------------------------
# DiT
# ------------------------------------------------------------------


def _attn(src: _Src, pfx: str) -> dict:
    return {
        "q_proj": src.linear(f"{pfx}.q_proj"),
        "k_proj": src.linear(f"{pfx}.k_proj"),
        "v_proj": src.linear(f"{pfx}.v_proj"),
        "o_proj": src.linear(f"{pfx}.o_proj"),
        "q_norm": src.norm(f"{pfx}.q_norm"),
        "k_norm": src.norm(f"{pfx}.k_norm"),
    }


def _mlp(src: _Src, pfx: str) -> dict:
    return {
        "gate": src.linear(f"{pfx}.gate_proj"),
        "up": src.linear(f"{pfx}.up_proj"),
        "down": src.linear(f"{pfx}.down_proj"),
    }


def _encoder_layer(src: _Src, pfx: str) -> dict:
    return {
        "input_layernorm": src.norm(f"{pfx}.input_layernorm"),
        "self_attn": _attn(src, f"{pfx}.self_attn"),
        "post_attention_layernorm": src.norm(f"{pfx}.post_attention_layernorm"),
        "mlp": _mlp(src, f"{pfx}.mlp"),
    }


def _dit_layer(src: _Src, pfx: str) -> dict:
    return {
        "self_attn_norm": src.norm(f"{pfx}.self_attn_norm"),
        "self_attn": _attn(src, f"{pfx}.self_attn"),
        "cross_attn_norm": src.norm(f"{pfx}.cross_attn_norm"),
        "cross_attn": _attn(src, f"{pfx}.cross_attn"),
        "mlp_norm": src.norm(f"{pfx}.mlp_norm"),
        "mlp": _mlp(src, f"{pfx}.mlp"),
        "scale_shift_table": src.tensor(f"{pfx}.scale_shift_table", squeeze=(0,)),
    }


def _timestep_embedding(src: _Src, pfx: str) -> dict:
    return {
        "linear_1": src.linear(f"{pfx}.linear_1"),
        "linear_2": src.linear(f"{pfx}.linear_2"),
        "time_proj": src.linear(f"{pfx}.time_proj"),
    }


def _encoder_stack(src: _Src, pfx: str, n: int) -> dict:
    return {
        "embed_tokens": src.linear(f"{pfx}.embed_tokens"),
        "layers": _stack_layers(n, lambda i: _encoder_layer(src, f"{pfx}.layers.{i}")),
        "norm": src.norm(f"{pfx}.norm"),
    }


def convert_dit_state(state: Dict[str, np.ndarray], cfg, dtype=jnp.bfloat16,
                      strict: bool = False) -> dict:
    """Reference DiT state dict -> init_dit_params-layout tree."""
    src = _Src(state, dtype)

    decoder = {
        "layers": _stack_layers(
            cfg.num_hidden_layers, lambda i: _dit_layer(src, f"decoder.layers.{i}")),
        "proj_in": src.conv1d("decoder.proj_in.1"),
        "time_embed": _timestep_embedding(src, "decoder.time_embed"),
        "time_embed_r": _timestep_embedding(src, "decoder.time_embed_r"),
        "condition_embedder": src.linear("decoder.condition_embedder"),
        "norm_out": src.norm("decoder.norm_out"),
        "proj_out": src.conv1d_transpose("decoder.proj_out.1"),
        "scale_shift_table": src.tensor("decoder.scale_shift_table", squeeze=(0,)),
    }
    encoder = {
        "text_projector": src.linear("encoder.text_projector"),
        "lyric_encoder": _encoder_stack(
            src, "encoder.lyric_encoder", cfg.num_lyric_encoder_hidden_layers),
        "timbre_encoder": {
            **_encoder_stack(src, "encoder.timbre_encoder",
                             cfg.num_timbre_encoder_hidden_layers),
            "special_token": src.tensor("encoder.timbre_encoder.special_token"),
        },
    }
    tokenizer = {
        "audio_acoustic_proj": src.linear("tokenizer.audio_acoustic_proj"),
        "pooler": {
            **_encoder_stack(src, "tokenizer.attention_pooler",
                             cfg.num_attention_pooler_hidden_layers),
            "special_token": src.tensor("tokenizer.attention_pooler.special_token"),
        },
        "fsq": {
            "project_in": src.linear("tokenizer.quantizer.layers.0.project_in"),
            "project_out": src.linear("tokenizer.quantizer.layers.0.project_out"),
        },
    }
    detokenizer = {
        **_encoder_stack(src, "detokenizer", cfg.num_attention_pooler_hidden_layers),
        "special_tokens": src.tensor("detokenizer.special_tokens", squeeze=(0,)),
        "proj_out": src.linear("detokenizer.proj_out"),
    }
    params = {
        "decoder": decoder,
        "encoder": encoder,
        "tokenizer": tokenizer,
        "detokenizer": detokenizer,
        "null_condition_emb": src.tensor("null_condition_emb"),
    }
    if strict and src.unused():
        leftover = [n for n in src.unused() if "rotary_emb" not in n]
        if leftover:
            raise ValueError(f"unconverted tensors: {leftover[:20]}")
    return params


# ------------------------------------------------------------------
# VAE (diffusers AutoencoderOobleck)
# ------------------------------------------------------------------


def _snake(src: _Src, pfx: str) -> dict:
    alpha = np.reshape(src.raw(f"{pfx}.alpha"), (-1,))
    beta = np.reshape(src.raw(f"{pfx}.beta"), (-1,))
    return {"alpha": _to_jnp(alpha, src.dtype), "beta": _to_jnp(beta, src.dtype)}


def _res_unit(src: _Src, pfx: str) -> dict:
    return {
        "snake1": _snake(src, f"{pfx}.snake1"),
        "conv1": src.conv1d(f"{pfx}.conv1"),
        "snake2": _snake(src, f"{pfx}.snake2"),
        "conv2": src.conv1d(f"{pfx}.conv2"),
    }


def convert_vae_state(state: Dict[str, np.ndarray], cfg,
                      dtype=jnp.bfloat16) -> dict:
    """diffusers AutoencoderOobleck state dict -> init_vae_params layout."""
    state = _fuse_weight_norm(state)
    src = _Src(state, dtype)
    n = len(cfg.downsampling_ratios)

    encoder = {
        "conv1": src.conv1d("encoder.conv1"),
        "blocks": [
            {
                "res1": _res_unit(src, f"encoder.block.{i}.res_unit1"),
                "res2": _res_unit(src, f"encoder.block.{i}.res_unit2"),
                "res3": _res_unit(src, f"encoder.block.{i}.res_unit3"),
                "snake": _snake(src, f"encoder.block.{i}.snake1"),
                "down": src.conv1d(f"encoder.block.{i}.conv1"),
            }
            for i in range(n)
        ],
        "snake": _snake(src, "encoder.snake1"),
        "conv2": src.conv1d("encoder.conv2"),
    }
    decoder = {
        "conv1": src.conv1d("decoder.conv1"),
        "blocks": [
            {
                "snake": _snake(src, f"decoder.block.{i}.snake1"),
                "up": src.conv1d_transpose(f"decoder.block.{i}.conv_t1"),
                "res1": _res_unit(src, f"decoder.block.{i}.res_unit1"),
                "res2": _res_unit(src, f"decoder.block.{i}.res_unit2"),
                "res3": _res_unit(src, f"decoder.block.{i}.res_unit3"),
            }
            for i in range(n)
        ],
        "snake": _snake(src, "decoder.snake1"),
        "conv2": src.conv1d("decoder.conv2"),
    }
    return {"encoder": encoder, "decoder": decoder}


# ------------------------------------------------------------------
# Qwen3 LM / embedding trunk
# ------------------------------------------------------------------


def convert_lm_state(state: Dict[str, np.ndarray], cfg,
                     dtype=jnp.bfloat16) -> dict:
    """HF Qwen3 (ForCausalLM or bare model) -> init_lm_params layout."""
    pfx = "model." if any(k.startswith("model.") for k in state) else ""
    src = _Src(state, dtype)

    def layer(i: int) -> dict:
        base = f"{pfx}layers.{i}"
        return {
            "input_layernorm": src.norm(f"{base}.input_layernorm"),
            "self_attn": _attn(src, f"{base}.self_attn"),
            "post_attention_layernorm": src.norm(f"{base}.post_attention_layernorm"),
            "mlp": _mlp(src, f"{base}.mlp"),
        }

    params = {
        "embed_tokens": src.tensor(f"{pfx}embed_tokens.weight"),
        "layers": _stack_layers(cfg.num_hidden_layers, layer),
        "norm": src.norm(f"{pfx}norm"),
    }
    if not cfg.tie_word_embeddings:
        if src.has("lm_head.weight"):
            params["lm_head"] = src.linear("lm_head")
        else:  # tied on disk even though cfg says untied
            params["lm_head"] = {"w": params["embed_tokens"].T}
    return params


# ------------------------------------------------------------------
# Top-level loaders
# ------------------------------------------------------------------


def load_dit_checkpoint(ckpt_dir: str, cfg, dtype=jnp.bfloat16):
    """Load a reference DiT checkpoint dir -> (params, silence_latent|None)."""
    state = load_safetensors_dir(ckpt_dir)
    params = convert_dit_state(state, cfg, dtype)
    silence = None
    sp = Path(ckpt_dir) / "silence_latent.pt"
    if sp.exists():
        silence = jnp.asarray(load_torch_file(str(sp)), dtype)
    return params, silence


def load_vae_checkpoint(ckpt_dir: str, cfg, dtype=jnp.bfloat16):
    return convert_vae_state(load_safetensors_dir(ckpt_dir), cfg, dtype)


def load_lm_checkpoint(ckpt_dir: str, cfg, dtype=jnp.bfloat16):
    return convert_lm_state(load_safetensors_dir(ckpt_dir), cfg, dtype)
