"""Full-parameter flow-matching trainer with orbax checkpointing.

The reference trains only adapters (LoRA/LoKr on preprocessed tensors);
this trainer extends the same data/loss plumbing to full-parameter
fine-tuning/pretraining, TPU-style: the whole step is one jitted program,
optionally sharded over a dp x tp mesh (parallel.dit_param_pspecs), with
orbax for crash-safe checkpoint/resume.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from acestep_tpu.config import DiTConfig
from acestep_tpu.training.step import make_train_step


@dataclasses.dataclass
class FullTrainingConfig:
    learning_rate: float = 1e-4
    warmup_steps: int = 100
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    max_steps: int = 10_000
    checkpoint_every: int = 1000
    keep_checkpoints: int = 3
    output_dir: str = "full_train"
    seed: int = 0
    log_every: int = 20
    mesh_dp: int = 1
    mesh_tp: int = 1

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


class FullTrainer:
    def __init__(self, params: dict, cfg: DiTConfig,
                 tcfg: Optional[FullTrainingConfig] = None):
        self.cfg = cfg
        self.tcfg = tcfg or FullTrainingConfig()
        tc = self.tcfg

        schedule = optax.warmup_cosine_decay_schedule(
            0.0, tc.learning_rate, tc.warmup_steps,
            max(tc.max_steps, tc.warmup_steps + 1))
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(tc.grad_clip),
            optax.adamw(schedule, weight_decay=tc.weight_decay),
        )
        self.mesh = None
        if tc.mesh_dp * tc.mesh_tp > 1:
            from acestep_tpu.parallel import (
                dit_param_pspecs, make_mesh, shard_pytree)
            from acestep_tpu.parallel.mesh import sanitize_pspecs

            self.mesh = make_mesh(dp=tc.mesh_dp, tp=tc.mesh_tp)
            pspecs = sanitize_pspecs(params, dit_param_pspecs(params),
                                     self.mesh)
            params = shard_pytree(params, self.mesh, pspecs)
        self.params = params
        self.opt_state = self.optimizer.init(params)
        self.step_fn = make_train_step(cfg, self.optimizer)
        self.step = 0

        self._ckpt = None
        if tc.checkpoint_every:
            import orbax.checkpoint as ocp

            self._ckpt = ocp.CheckpointManager(
                os.path.abspath(os.path.join(tc.output_dir, "checkpoints")),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=tc.keep_checkpoints))

    # -- checkpoint/resume ---------------------------------------------------

    def save(self) -> None:
        if self._ckpt is None:
            return
        import orbax.checkpoint as ocp

        # the end-of-training save coincides with a periodic one when
        # max_steps is a checkpoint_every multiple; orbax raises
        # StepAlreadyExistsError on a re-save of the same step
        if self.step in (self._ckpt.all_steps() or []):
            return
        self._ckpt.save(self.step, args=ocp.args.Composite(
            params=ocp.args.StandardSave(self.params),
            opt_state=ocp.args.StandardSave(self.opt_state),
        ))
        self._ckpt.wait_until_finished()

    def restore(self, step: Optional[int] = None) -> bool:
        if self._ckpt is None:
            return False
        import orbax.checkpoint as ocp

        target = step if step is not None else self._ckpt.latest_step()
        if target is None:
            return False
        restored = self._ckpt.restore(target, args=ocp.args.Composite(
            params=ocp.args.StandardRestore(self.params),
            opt_state=ocp.args.StandardRestore(self.opt_state),
        ))
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.step = int(target)
        return True

    # -- training --------------------------------------------------------

    def train(self, batches: Iterator[Dict[str, np.ndarray]]
              ) -> Iterator[Tuple[int, float, str]]:
        tc = self.tcfg
        key = jax.random.PRNGKey(tc.seed)
        t0 = time.time()
        start = self.step
        for batch in batches:
            if self.step >= tc.max_steps:
                break
            key, sub = jax.random.split(key)
            if self.mesh is not None:
                from acestep_tpu.parallel import batch_sharding

                batch = {k: jax.device_put(
                    v, batch_sharding(self.mesh, np.ndim(v)))
                    for k, v in batch.items()}
            self.params, self.opt_state, loss = self.step_fn(
                self.params, self.opt_state, batch, sub)
            self.step += 1
            if self.step % tc.log_every == 0 or self.step == tc.max_steps:
                rate = (self.step - start) / max(time.time() - t0, 1e-9)
                yield self.step, float(loss), (
                    f"step {self.step}/{tc.max_steps} loss {float(loss):.4f} "
                    f"({rate:.2f} it/s)")
            if tc.checkpoint_every and self.step % tc.checkpoint_every == 0:
                self.save()
                yield self.step, float(loss), f"checkpoint @ {self.step}"
        self.save()
