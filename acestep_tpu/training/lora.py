"""LoRA/LoKr fine-tuning of the DiT decoder.

Capability parity with both reference trainer generations:
- v1 (training/trainer.py): decoder-only adapters, preprocessed tensors,
  DISCRETE turbo shift-3 timestep sampling (ref :303-324), flow-matching
  MSE, periodic checkpoint + resume, generator-based progress yields.
- v2 "Side-Step fixed" (training_v2): CONTINUOUS logit-normal timestep
  sampling exactly matching the model config + CFG dropout
  (ref training_v2/timestep_sampling.py:20-60).

TPU redesign: the whole step — merge adapter into base weights, condition
encode, flow-matching loss, backward, optimizer update — is ONE jitted XLA
program. Gradients flow only to the adapter factors (base params are a
closed-over constant), so optimizer state is adapter-sized.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from functools import partial
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from acestep_tpu.config import DiTConfig
from acestep_tpu.lora.adapters import init_lokr, init_lora, merge_weights
from acestep_tpu.lora.manager import save_adapter
from acestep_tpu.models.dit import training_loss
from acestep_tpu.models.sampler import build_turbo_schedule


@dataclasses.dataclass
class LoRATrainingConfig:
    kind: str = "lora"               # "lora" | "lokr"
    rank: int = 16
    alpha: float = 32.0
    lokr_factor: int = 8
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    max_steps: int = 2000
    batch_size: int = 1
    timestep_mode: str = "discrete_shift3"   # v1 default; or "continuous"
    cfg_ratio: float = 0.15
    checkpoint_every: int = 500
    output_dir: str = "lora_output"
    adapter_name: str = "adapter"
    # optional target subset ("self_attn.q_proj", ...): train only the
    # projections estimation ranked highest (Side-Step targeted training)
    targets: Optional[tuple] = None
    resume_from: Optional[str] = None
    seed: int = 0
    log_every: int = 10

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def make_lora_train_step(cfg: DiTConfig, meta: dict,
                         optimizer: optax.GradientTransformation,
                         discrete_timesteps: Optional[tuple] = None,
                         cfg_ratio: float = 0.15):
    """step(base, weights, opt_state, batch, key) -> (weights, opt_state, loss)."""
    # 'auto' picks the banded flash kernel (with its custom_vjp backward,
    # ops/flash_attention.py) at long lengths and dense XLA otherwise
    cfg = dataclasses.replace(cfg, attention_impl="auto")

    def step(base, weights, opt_state, batch, key):
        def loss_fn(w):
            merged = merge_weights(base, w, 1.0, meta)
            return training_loss(merged, cfg, key, cfg_ratio=cfg_ratio,
                                 discrete_timesteps=discrete_timesteps,
                                 **batch)

        loss, grads = jax.value_and_grad(loss_fn)(weights)
        updates, opt_state = optimizer.update(grads, opt_state, weights)
        weights = optax.apply_updates(weights, updates)
        return weights, opt_state, loss

    return jax.jit(step, donate_argnums=(1, 2))


class LoRATrainer:
    """Train adapter factors against frozen base params.

    `train()` is a generator yielding (step, loss, message) so callers (UI,
    CLI, API) can stream progress — the reference trainer's contract
    (training/trainer.py:622-1103).

    Memory note: pass base params in bf16 for the full-size model — the step
    materializes one merged weight copy, and f32 base + merged copy exceeds
    a 16 GB chip. Measured on v5e: ~0.33 s/step (rank 16, batch 1, 250
    frames) => a 2000-step fine-tune in ~11 minutes."""

    def __init__(self, base_params: dict, cfg: DiTConfig,
                 tcfg: Optional[LoRATrainingConfig] = None):
        self.base = base_params
        self.cfg = cfg
        self.tcfg = tcfg or LoRATrainingConfig()

    # -- checkpointing ------------------------------------------------------

    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(self.tcfg.output_dir, f"checkpoint_{step}")

    def _save_checkpoint(self, step: int, weights, opt_state) -> str:
        path = self._ckpt_dir(step)
        os.makedirs(path, exist_ok=True)
        adapter = {"meta": self._meta(), "weights": jax.tree.map(np.asarray,
                                                                 weights)}
        save_adapter(os.path.join(path, "adapter.npz"), adapter)
        flat_opt, _ = jax.tree_util.tree_flatten(opt_state)
        np.savez(os.path.join(path, "opt_state.npz"),
                 **{f"s{i}": np.asarray(x) for i, x in enumerate(flat_opt)})
        with open(os.path.join(path, "trainer_state.json"), "w") as f:
            json.dump({"step": step, "config": self.tcfg.to_dict()}, f)
        return path

    def _resume(self, weights, opt_state) -> Tuple[Any, Any, int]:
        path = self.tcfg.resume_from
        if not path:
            return weights, opt_state, 0
        from acestep_tpu.lora.manager import load_adapter_file

        adapter = load_adapter_file(os.path.join(path, "adapter.npz"))
        weights = jax.tree.map(
            lambda old, new: jnp.asarray(new, old.dtype),
            weights, adapter["weights"])
        flat, treedef = jax.tree_util.tree_flatten(opt_state)
        with np.load(os.path.join(path, "opt_state.npz")) as data:
            flat = [jnp.asarray(data[f"s{i}"], x.dtype)
                    for i, x in enumerate(flat)]
        opt_state = jax.tree_util.tree_unflatten(treedef, flat)
        with open(os.path.join(path, "trainer_state.json")) as f:
            start = json.load(f)["step"]
        return weights, opt_state, start

    def _meta(self) -> dict:
        if self.tcfg.kind == "lokr":
            return {"kind": "lokr", "factor": self.tcfg.lokr_factor,
                    "alpha": self.tcfg.alpha}
        return {"kind": "lora", "rank": self.tcfg.rank,
                "alpha": self.tcfg.alpha}

    # -- training -----------------------------------------------------------

    def train(self, batches: Iterator[Dict[str, np.ndarray]]
              ) -> Iterator[Tuple[int, float, str]]:
        tcfg = self.tcfg
        key = jax.random.PRNGKey(tcfg.seed)
        k_init, key = jax.random.split(key)

        from acestep_tpu.lora.adapters import LORA_TARGETS

        targets = LORA_TARGETS
        if tcfg.targets:
            wanted = {t if isinstance(t, str) else ".".join(t)
                      for t in tcfg.targets}
            targets = tuple(t for t in LORA_TARGETS
                            if ".".join(t) in wanted)
            unknown = wanted - {".".join(t) for t in LORA_TARGETS}
            if unknown or not targets:
                raise ValueError(
                    f"unknown LoRA targets {sorted(unknown)}; valid: "
                    f"{['.'.join(t) for t in LORA_TARGETS]}")
        if tcfg.kind == "lokr":
            adapter = init_lokr(k_init, self.base, factor=tcfg.lokr_factor,
                                alpha=tcfg.alpha, targets=targets)
        else:
            adapter = init_lora(k_init, self.base, rank=tcfg.rank,
                                alpha=tcfg.alpha, targets=targets)
        weights = adapter["weights"]

        optimizer = optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip),
            optax.adamw(tcfg.learning_rate, weight_decay=tcfg.weight_decay),
        )
        opt_state = optimizer.init(weights)
        weights, opt_state, start_step = self._resume(weights, opt_state)

        discrete = (build_turbo_schedule(shift=3.0)
                    if tcfg.timestep_mode == "discrete_shift3" else None)
        step_fn = make_lora_train_step(self.cfg, self._meta(), optimizer,
                                       discrete_timesteps=discrete,
                                       cfg_ratio=tcfg.cfg_ratio)

        step = start_step
        loss = None     # stays None when stopped before the first step
        t0 = time.time()
        for batch in batches:
            if step >= tcfg.max_steps:
                break
            key, k_step = jax.random.split(key)
            weights, opt_state, loss = step_fn(self.base, weights, opt_state,
                                               batch, k_step)
            step += 1
            if step % tcfg.log_every == 0 or step == tcfg.max_steps:
                loss_f = float(loss)
                rate = (step - start_step) / max(time.time() - t0, 1e-9)
                yield step, loss_f, f"step {step}/{tcfg.max_steps} " \
                    f"loss {loss_f:.4f} ({rate:.2f} it/s)"
            if tcfg.checkpoint_every and step % tcfg.checkpoint_every == 0:
                path = self._save_checkpoint(step, weights, opt_state)
                yield step, float(loss), f"checkpoint saved: {path}"

        final = self._save_checkpoint(step, weights, opt_state)
        # also export the bare adapter at the top level for easy loading
        save_adapter(os.path.join(tcfg.output_dir,
                                  f"{tcfg.adapter_name}.npz"),
                     {"meta": self._meta(),
                      "weights": jax.tree.map(np.asarray, weights)})
        # report the final REAL loss — a literal 0.0 would be appended to
        # metrics.jsonl and plotted as a bogus terminal plunge. None when
        # stopped before the first step (no loss exists to report).
        yield step, (float(loss) if loss is not None else None), \
            f"training complete; final checkpoint: {final}"
