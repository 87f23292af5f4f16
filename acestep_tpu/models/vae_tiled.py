"""Static-shape tiled VAE encode/decode.

Capability parity: the reference's overlap-trim chunking
(/root/reference/acestep/core/generation/handler/vae_decode_chunks.py:84-113,
vae_encode_chunks.py:10-41): each chunk's core [i*stride, (i+1)*stride) is
decoded with `overlap` frames of context on each side, the context is trimmed
off, and cores are concatenated — so chunk boundaries carry full receptive
field and no seams.

TPU-first redesign: instead of the reference's Python loop over ragged
windows (first/last windows are shorter), the signal is padded with `overlap`
zeros on the left and to a whole number of strides plus `overlap` on the
right, making EVERY window exactly `stride + 2*overlap` long. One
`lax.map` over the stacked windows then runs a single compiled chunk program
sequentially (stable memory, one compilation for any song length at a given
chunk size). Edge windows see zero context instead of conv boundary padding —
the trimmed cores differ from an untiled decode only within the outermost
receptive field and are bit-identical in the interior (tests/test_vae.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acestep_tpu.config import VAEConfig
from acestep_tpu.models.vae import vae_decode, vae_encode_moments

DEFAULT_DECODE_CHUNK = 256   # latent frames per core (reference auto-sizes 128-512)
DEFAULT_DECODE_OVERLAP = 16  # latent frames of context each side
DEFAULT_ENCODE_CHUNK = 1024  # latent-frame-equivalents per core for encoding
DEFAULT_ENCODE_OVERLAP = 8


def _fit_overlap(chunk_size: int, overlap: int) -> int:
    """Halve the overlap until the stride (chunk - 2*overlap) is positive
    (the reference's adaptive-overlap guard; shared by encode and decode)."""
    while chunk_size - 2 * overlap <= 0 and overlap > 0:
        overlap //= 2
    return overlap


def _windows(x: jnp.ndarray, stride: int, overlap: int):
    """Pad (B, L, C) along axis 1 and return (n, B, stride + 2*overlap, C)."""
    B, L, C = x.shape
    n = -(-L // stride)  # ceil
    pad_r = n * stride - L + overlap
    xp = jnp.pad(x, ((0, 0), (overlap, pad_r), (0, 0)))
    win = stride + 2 * overlap
    starts = jnp.arange(n) * stride

    def take(s):
        return jax.lax.dynamic_slice_in_dim(xp, s, win, axis=1)

    return jax.vmap(take)(starts), n


def _grouped_map(wins: jnp.ndarray, n: int, parallel_windows: int, fn):
    """Run `fn` over windows in groups folded into the batch axis.

    Pads the window axis to a whole number of groups (zero windows),
    `lax.map`s over the groups, then un-pads back to `n` windows. `fn`
    takes (G, B, win, C) and returns a pytree of (G, B, ...) arrays.
    Shared by tiled_decode/tiled_encode so the pad/reshape/trim scheme
    exists exactly once."""
    groups = max(1, min(parallel_windows, n))
    pad_n = (-n) % groups
    if pad_n:
        wins = jnp.concatenate([wins, jnp.zeros_like(wins[:pad_n])], axis=0)
    wins = wins.reshape((n + pad_n) // groups, groups, *wins.shape[1:])
    out = jax.lax.map(fn, wins)                       # pytree of (ng, G, ...)
    return jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:])[:n], out)


def tiled_decode(params: dict, cfg: VAEConfig, latents: jnp.ndarray, *,
                 chunk_size: int = DEFAULT_DECODE_CHUNK,
                 overlap: int = DEFAULT_DECODE_OVERLAP,
                 parallel_windows: int = 16) -> jnp.ndarray:
    """latents (B, T, C) -> audio (B, T*hop, audio_channels).

    Windows are decoded in parallel groups of `parallel_windows` (folded into
    the conv batch axis — far better MXU/VPU utilization than one-at-a-time),
    with `lax.map` over the groups bounding peak memory for very long songs:
    600 s decodes as 59 windows = 4 groups of 16. `parallel_windows=1`
    degenerates to the fully sequential reference-style loop."""
    B, T, _ = latents.shape
    hop = cfg.hop_length
    overlap = _fit_overlap(chunk_size, overlap)
    stride = chunk_size - 2 * overlap
    if T <= chunk_size:
        return vae_decode(params, cfg, latents)

    wins, n = _windows(latents, stride, overlap)      # (n, B, win, C)

    def decode_group(group):                          # (G, B, win, C)
        G = group.shape[0]
        flat = group.reshape(G * B, *group.shape[2:])
        audio = vae_decode(params, cfg, flat)         # (G*B, win*hop, ch)
        audio = audio.reshape(G, B, *audio.shape[1:])
        return audio[:, :, overlap * hop:-(overlap * hop) if overlap else None]

    cores = _grouped_map(wins, n, parallel_windows, decode_group)
    audio = jnp.moveaxis(cores, 0, 1).reshape(B, n * stride * hop, -1)
    return audio[:, : T * hop]


def tiled_encode(params: dict, cfg: VAEConfig, audio: jnp.ndarray, *,
                 chunk_size: int = DEFAULT_ENCODE_CHUNK,
                 overlap: int = DEFAULT_ENCODE_OVERLAP,
                 parallel_windows: int = 8,
                 key=None) -> jnp.ndarray:
    """audio (B, L, ch) -> latents (B, ceil(L/hop), latent_dim).

    chunk_size / overlap are in latent frames; sample-domain windows are the
    corresponding hop multiples, so trims land exactly on latent frames.
    Windows fold into the conv batch in groups (same scheme as
    tiled_decode) instead of one-at-a-time lax.map."""
    B, L, _ = audio.shape
    hop = cfg.hop_length
    T = -(-L // hop)
    pad = T * hop - L
    if pad:
        audio = jnp.pad(audio, ((0, 0), (0, pad), (0, 0)))
    if T <= chunk_size:
        mean, std = vae_encode_moments(params, cfg, audio)
        return _sample(mean, std, key)

    overlap = _fit_overlap(chunk_size, overlap)
    stride_s, overlap_s = (chunk_size - 2 * overlap) * hop, overlap * hop
    wins, n = _windows(audio, stride_s, overlap_s)

    def encode_group(group):                      # (G, B, win_s, ch)
        G = group.shape[0]
        flat = group.reshape(G * B, *group.shape[2:])
        mean, std = vae_encode_moments(params, cfg, flat)
        mean = mean.reshape(G, B, *mean.shape[1:])
        std = std.reshape(G, B, *std.shape[1:])
        trim = slice(overlap, -overlap if overlap else None)
        return mean[:, :, trim], std[:, :, trim]

    means, stds = _grouped_map(wins, n, parallel_windows, encode_group)
    stride_t = chunk_size - 2 * overlap
    mean = jnp.moveaxis(means, 0, 1).reshape(B, n * stride_t, -1)[:, :T]
    std = jnp.moveaxis(stds, 0, 1).reshape(B, n * stride_t, -1)[:, :T]
    return _sample(mean, std, key)


def _sample(mean, std, key):
    if key is None:
        return mean
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
