"""Flow-matching training step (full-parameter path).

Reference behavior: training/trainer.py (discrete turbo-schedule timesteps)
and training_v2 "fixed" (continuous logit-normal sampling matching the model
config, training_v2/timestep_sampling.py:20-60). Here the whole step —
condition encode, timestep sample, interpolate, DiT forward, MSE, backward,
optimizer update — is ONE jitted XLA program, shardable over a mesh
(dp batch sharding + tp weight sharding from acestep_tpu.parallel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from acestep_tpu.config import DiTConfig
from acestep_tpu.models.dit import training_loss


def make_train_step(cfg: DiTConfig, optimizer: optax.GradientTransformation,
                    donate: bool = True):
    """Returns step(params, opt_state, batch, key) -> (params, opt_state, loss)."""
    import dataclasses

    # training follows the same length-aware ladder as inference: the
    # banded Pallas kernel (custom_vjp backward, O(L*W) both directions)
    # beyond FLASH_MIN_PATCHES, dense XLA below it
    cfg = dataclasses.replace(cfg, attention_impl="auto")

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(
            lambda p: training_loss(p, cfg, key, **batch)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def tiny_batch(cfg: DiTConfig, key, *, batch: int = 2, frames: int = 20,
               text_len: int = 8, lyric_len: int = 16,
               refer_len: Optional[int] = None, dtype=jnp.float32) -> dict:
    """A self-consistent random batch for smoke tests / dryruns."""
    refer_len = refer_len or 2 * cfg.pool_window_size
    ks = jax.random.split(key, 6)
    ones = jnp.ones((batch,), jnp.int32)
    return dict(
        hidden_states=jax.random.normal(ks[0], (batch, frames, cfg.audio_acoustic_hidden_dim), dtype),
        attention_mask=jnp.ones((batch, frames), jnp.int32),
        text_hidden_states=jax.random.normal(ks[1], (batch, text_len, cfg.text_hidden_dim), dtype),
        text_attention_mask=jnp.ones((batch, text_len), jnp.int32),
        lyric_hidden_states=jax.random.normal(ks[2], (batch, lyric_len, cfg.text_hidden_dim), dtype),
        lyric_attention_mask=jnp.ones((batch, lyric_len), jnp.int32),
        refer_audio_packed=jax.random.normal(ks[3], (batch, refer_len, cfg.timbre_hidden_dim), dtype),
        refer_order_mask=jnp.arange(batch, dtype=jnp.int32),
        src_latents=jax.random.normal(ks[4], (batch, frames, cfg.audio_acoustic_hidden_dim), dtype),
        chunk_masks=jnp.ones((batch, frames, cfg.audio_acoustic_hidden_dim), dtype),
        is_covers=ones * 0,
    )
