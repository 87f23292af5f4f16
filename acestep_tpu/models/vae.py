"""Oobleck audio VAE (48 kHz stereo <-> 25 Hz x 64-dim latents), TPU-native.

Architecture parity target: diffusers.AutoencoderOobleck as shipped in the
reference checkpoint (`checkpoints/vae`); the cleanest in-repo spec is the
reference's MLX twin (/root/reference/acestep/models/mlx/vae_model.py:24-336):

    Snake1d -> OobleckResidualUnit (k=7 dilated + k=1, residual)
    -> EncoderBlock (3 res units dil 1/3/9 -> Snake -> strided conv down)
    -> DecoderBlock (Snake -> strided conv-transpose up -> 3 res units)
    -> OobleckEncoder / OobleckDecoder -> diagonal Gaussian (softplus scale).

TPU-first choices:
- NLC (batch, length, channels) layout throughout so the channel dim sits in
  lanes and XLA tiles convs onto the MXU.
- Pure functions over param dicts; weight-norm is fused at checkpoint-load
  time (w = g * v / ||v||), so the hot path is plain convs.
- Snake activation computed in float32 (exp/sin overflow in low precision).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from acestep_tpu.config import VAEConfig
from acestep_tpu.ops.conv import conv1d, conv1d_transpose, init_conv1d, init_conv1d_transpose

# ------------------------------------------------------------------
# Snake1d: x + (1/exp(beta)) * sin(exp(alpha) * x)^2, alpha/beta stored in log
# ------------------------------------------------------------------


def init_snake(dim: int) -> dict:
    return {"alpha": jnp.zeros((dim,)), "beta": jnp.zeros((dim,))}


def snake1d(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    # sin^2 via the range-reduced polynomial (ops/snake_conv._sin2): the
    # VPU's library sin costs ~28 cycles/element and snake is the VAE's
    # hottest elementwise op; the polynomial's max error (1.2e-6) is far
    # below bf16 activation resolution
    from acestep_tpu.ops.snake_conv import _sin2

    alpha = jnp.exp(p["alpha"].astype(jnp.float32))
    beta = jnp.exp(p["beta"].astype(jnp.float32))
    xf = x.astype(jnp.float32)
    out = xf + (1.0 / (beta + 1e-9)) * _sin2(alpha * xf)
    return out.astype(x.dtype)


# ------------------------------------------------------------------
# Residual unit / blocks
# ------------------------------------------------------------------


def _init_res_unit(key, dim: int, dilation: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "snake1": init_snake(dim),
        "conv1": init_conv1d(k1, dim, dim, 7),
        "snake2": init_snake(dim),
        "conv2": init_conv1d(k2, dim, dim, 1),
    }


def _res_unit(p: dict, x: jnp.ndarray, dilation: int) -> jnp.ndarray:
    pad = ((7 - 1) * dilation) // 2
    y = conv1d(p["conv1"], snake1d(p["snake1"], x), padding=pad, dilation=dilation)
    y = conv1d(p["conv2"], snake1d(p["snake2"], y))
    return x + y


def _init_encoder_block(key, in_dim: int, out_dim: int, stride: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "res1": _init_res_unit(ks[0], in_dim, 1),
        "res2": _init_res_unit(ks[1], in_dim, 3),
        "res3": _init_res_unit(ks[2], in_dim, 9),
        "snake": init_snake(in_dim),
        "down": init_conv1d(ks[3], in_dim, out_dim, 2 * stride),
    }


def _res_stack(units, x: jnp.ndarray) -> jnp.ndarray:
    """The 3-unit residual stack (dilations 1/3/9) shared by encoder and
    decoder blocks. On TPU this runs as ONE fused Pallas kernel (snake +
    dilated conv7 + snake + conv1 + residual, all in VMEM — the XLA path
    pays an HBM round-trip per op and these levels are memory-bound);
    elsewhere it composes the plain ops. `ACESTEP_FUSED_SNAKE=0` forces
    the composed path (e.g. when differentiating through the VAE — the
    kernel defines no VJP)."""
    import os

    from acestep_tpu.ops import snake_conv

    if (os.environ.get("ACESTEP_FUSED_SNAKE", "1") != "0"
            and snake_conv.supported(x, x.shape[-1])):
        return snake_conv.res_unit_stack(units, x)
    for u, d in zip(units, (1, 3, 9)):
        x = _res_unit(u, x, d)
    return x


def _encoder_block(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    x = _res_stack((p["res1"], p["res2"], p["res3"]), x)
    x = snake1d(p["snake"], x)
    return conv1d(p["down"], x, stride=stride, padding=math.ceil(stride / 2))


def _init_decoder_block(key, in_dim: int, out_dim: int, stride: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "snake": init_snake(in_dim),
        "up": init_conv1d_transpose(ks[0], in_dim, out_dim, 2 * stride),
        "res1": _init_res_unit(ks[1], out_dim, 1),
        "res2": _init_res_unit(ks[2], out_dim, 3),
        "res3": _init_res_unit(ks[3], out_dim, 9),
    }


def _decoder_block(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    x = conv1d_transpose(p["up"], snake1d(p["snake"], x), stride=stride,
                         padding=math.ceil(stride / 2))
    return _res_stack((p["res1"], p["res2"], p["res3"]), x)


# ------------------------------------------------------------------
# Encoder / decoder / full VAE
# ------------------------------------------------------------------


def init_vae_params(key, cfg: VAEConfig) -> dict:
    cm = [1] + list(cfg.channel_multiples)
    h = cfg.encoder_hidden_size
    n = len(cfg.downsampling_ratios)
    ks = jax.random.split(key, 2 * n + 4)

    encoder = {
        "conv1": init_conv1d(ks[0], cfg.audio_channels, h, 7),
        "blocks": [
            _init_encoder_block(ks[1 + i], h * cm[i], h * cm[i + 1],
                                cfg.downsampling_ratios[i])
            for i in range(n)
        ],
        "snake": init_snake(h * cm[-1]),
        "conv2": init_conv1d(ks[n + 1], h * cm[-1], 2 * cfg.decoder_input_channels, 3),
    }
    dch = cfg.decoder_channels
    up_ratios = list(cfg.downsampling_ratios)[::-1]
    decoder = {
        "conv1": init_conv1d(ks[n + 2], cfg.decoder_input_channels, dch * cm[-1], 7),
        "blocks": [
            _init_decoder_block(ks[n + 3 + i], dch * cm[n - i], dch * cm[n - i - 1],
                                up_ratios[i])
            for i in range(n)
        ],
        "snake": init_snake(dch),
        "conv2": init_conv1d(ks[2 * n + 3], dch, cfg.audio_channels, 7, bias=False),
    }
    return {"encoder": encoder, "decoder": decoder}


def vae_encode_moments(params: dict, cfg: VAEConfig, audio: jnp.ndarray):
    """audio (B, L, audio_channels) NLC -> (mean, std), each (B, L', latent_dim).

    std = softplus(scale) + 1e-4 (diffusers DiagonalGaussian convention for
    Oobleck; see the MLX twin :300-312).
    """
    p = params["encoder"]
    x = conv1d(p["conv1"], audio, padding=3)
    for blk, stride in zip(p["blocks"], cfg.downsampling_ratios):
        x = _encoder_block(blk, x, stride)
    x = snake1d(p["snake"], x)
    x = conv1d(p["conv2"], x, padding=1)
    mean, scale = jnp.split(x, 2, axis=-1)
    sf = scale.astype(jnp.float32)
    std = jnp.where(sf > 20.0, sf, jnp.log1p(jnp.exp(jnp.minimum(sf, 20.0)))) + 1e-4
    return mean, std.astype(mean.dtype)


def vae_encode(params: dict, cfg: VAEConfig, audio: jnp.ndarray,
               key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Encode and sample (or return the mean when key is None)."""
    mean, std = vae_encode_moments(params, cfg, audio)
    if key is None:
        return mean
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + std * noise


def vae_decode(params: dict, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """latents (B, T, latent_dim) NLC -> audio (B, T*hop, audio_channels)."""
    p = params["decoder"]
    cm = [1] + list(cfg.channel_multiples)
    up_ratios = list(cfg.downsampling_ratios)[::-1]
    x = conv1d(p["conv1"], latents, padding=3)
    for blk, stride in zip(p["blocks"], up_ratios):
        x = _decoder_block(blk, x, stride)
    x = snake1d(p["snake"], x)
    x = conv1d(p["conv2"], x, padding=3)
    return x
