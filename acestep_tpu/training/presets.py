"""Named training presets + gradient-sensitivity estimation.

Capability parity with the reference's training_v2 presets
(/root/reference/acestep/training_v2/presets/, configs.py) and the
"Side-Step estimate" subcommand (train.py estimate): per-target gradient
norms over a few batches rank which decoder projections matter most for a
given dataset, guiding LoRA target selection."""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.training.lora import LoRATrainingConfig

PRESETS: Dict[str, dict] = {
    # fast sanity pass
    "quick": dict(rank=8, alpha=16.0, learning_rate=3e-4, max_steps=500,
                  checkpoint_every=250, timestep_mode="discrete_shift3"),
    # the reference's default-ish profile (8 songs ~ 1 h class)
    "standard": dict(rank=16, alpha=32.0, learning_rate=1e-4, max_steps=2000,
                     checkpoint_every=500, timestep_mode="discrete_shift3"),
    # v2 'fixed' semantics: continuous timesteps matched to the model config
    "fixed": dict(rank=16, alpha=32.0, learning_rate=1e-4, max_steps=2000,
                  checkpoint_every=500, timestep_mode="continuous"),
    # heavier adapter for style transfer
    "quality": dict(rank=64, alpha=128.0, learning_rate=5e-5, max_steps=6000,
                    checkpoint_every=1000, timestep_mode="continuous"),
    # LoKr variant
    "lokr": dict(kind="lokr", lokr_factor=8, alpha=1.0, learning_rate=1e-4,
                 max_steps=2000, checkpoint_every=500),
}


def get_preset(name: str, **overrides) -> LoRATrainingConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; options: {sorted(PRESETS)}")
    kw = dict(PRESETS[name])
    kw.update(overrides)
    return LoRATrainingConfig(**kw)


def estimate_gradient_sensitivity(base_params: dict, cfg,
                                  batches: Iterable[dict],
                                  num_batches: int = 4,
                                  seed: int = 0
                                  ) -> List[Tuple[str, float]]:
    """Mean per-target gradient norm (normalized by weight norm) over a few
    batches. Returns [(target, sensitivity)] sorted descending."""
    import dataclasses

    from acestep_tpu.lora.adapters import LORA_TARGETS, target_paths
    from acestep_tpu.models.dit import training_loss

    cfg = dataclasses.replace(cfg, attention_impl="auto")  # flash has a VJP now
    grad_fn = jax.jit(jax.grad(
        lambda p, batch, key: training_loss(p, cfg, key, **batch)))

    sums: Dict[str, float] = {}
    count = 0
    key = jax.random.PRNGKey(seed)
    # base weights never change across batches: pull + norm them ONCE
    # instead of re-transferring every target tensor per batch
    w_norms = {name: np.linalg.norm(np.asarray(w, np.float32))
               for name, w in target_paths(base_params).items()}
    for i, batch in enumerate(batches):
        if i >= num_batches:
            break
        key, sub = jax.random.split(key)
        grads = grad_fn(base_params, batch, sub)
        g_targets = target_paths(grads)
        for name in g_targets:
            g = np.linalg.norm(np.asarray(g_targets[name], np.float32))
            sums[name] = sums.get(name, 0.0) + g / max(w_norms[name], 1e-9)
        count += 1
    if count == 0:
        return []
    ranked = sorted(((n, s / count) for n, s in sums.items()),
                    key=lambda kv: -kv[1])
    return ranked
