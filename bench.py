"""Headline benchmark: seconds of wall clock per full generated song.

Pipeline measured (matches the reference's benchmark-mode decomposition,
/root/reference/docs/en/BENCHMARK.md:117-125): condition encode -> 8-step
turbo flow-matching DiT -> tiled Oobleck VAE decode, for one 60 s 48 kHz
stereo song, bf16, on the local accelerator. Random weights (numerics are
identical to checkpoint weights for throughput purposes).

Prints ONE JSON line:
  {"metric": "seconds_per_song", "value": W, "unit": "s",
   "vs_baseline": baseline/W}
Baseline: 2.0 s — the reference's "< 2 s full-song on A100" headline
(/root/reference/README.md:29,52).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.models.dit import init_dit_params, prepare_condition
from acestep_tpu.models.sampler import ConditionSet, build_turbo_schedule, sample_turbo
from acestep_tpu.models.vae import init_vae_params
from acestep_tpu.models.vae_tiled import tiled_decode

BASELINE_SECONDS = 2.0   # reference: < 2 s per full song on A100
DURATION_S = 60
BATCH = 1
TEXT_LEN = 64
LYRIC_LEN = 512


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = DiTConfig()
    vae_cfg = VAEConfig()
    dtype = jnp.bfloat16
    T = DURATION_S * 25                      # 25 Hz latent frames

    # All setup in ONE jitted program: eager per-leaf init is hundreds of
    # tiny dispatches (minutes over a tunneled TPU).
    @jax.jit
    def setup(key):
        cast = lambda tree: jax.tree.map(lambda x: x.astype(dtype), tree)
        ks = jax.random.split(key, 8)
        params = cast(init_dit_params(ks[4], cfg))
        vae_params = cast(init_vae_params(ks[5], vae_cfg))
        batch_inputs = dict(
            text_hidden_states=jax.random.normal(ks[0], (BATCH, TEXT_LEN, cfg.text_hidden_dim), dtype),
            text_attention_mask=jnp.ones((BATCH, TEXT_LEN), jnp.int32),
            lyric_hidden_states=jax.random.normal(ks[1], (BATCH, LYRIC_LEN, cfg.text_hidden_dim), dtype),
            lyric_attention_mask=jnp.ones((BATCH, LYRIC_LEN), jnp.int32),
            refer_audio_packed=jax.random.normal(ks[2], (BATCH, 2 * cfg.pool_window_size, cfg.timbre_hidden_dim), dtype),
            refer_order_mask=jnp.arange(BATCH, dtype=jnp.int32),
            src_latents=jnp.zeros((BATCH, T, cfg.audio_acoustic_hidden_dim), dtype),
            chunk_masks=jnp.ones((BATCH, T, cfg.audio_acoustic_hidden_dim), dtype),
            is_covers=jnp.zeros((BATCH,), jnp.int32),
        )
        x_init = jax.random.normal(ks[3], (BATCH, T, cfg.audio_acoustic_hidden_dim), dtype)
        return params, vae_params, batch_inputs, x_init

    t0 = time.perf_counter()
    params, vae_params, batch_inputs, x_init = setup(jax.random.PRNGKey(0))
    jax.block_until_ready(params["decoder"]["proj_in"])
    log(f"setup: {time.perf_counter() - t0:.1f}s")
    schedule = tuple(build_turbo_schedule(shift=3.0))

    @jax.jit
    def generate(params, vae_params, inputs, x_init):
        enc, _mask, ctx = prepare_condition(params, cfg, **inputs)
        cond = ConditionSet.build(params, cfg, enc, ctx)
        x0 = sample_turbo(params, cfg, x_init=x_init, schedule=schedule, cond=cond)
        audio = tiled_decode(vae_params, vae_cfg, x0)
        return audio

    import numpy as np

    log(f"devices: {jax.devices()}")
    log("compiling…")
    t0 = time.perf_counter()
    audio = generate(params, vae_params, batch_inputs, x_init)
    np.asarray(audio[0, :8, 0])  # axon tunnel: block_until_ready is async; force a readback
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s; audio {audio.shape}")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        audio = generate(params, vae_params, batch_inputs, x_init)
        np.asarray(audio[0, :8, 0])
        times.append(time.perf_counter() - t0)
        log(f"run {i}: {times[-1]:.3f}s")

    wall = min(times)
    print(json.dumps({
        "metric": "seconds_per_song",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / wall, 3),
    }))


if __name__ == "__main__":
    main()
