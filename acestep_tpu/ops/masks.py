"""Boolean attention-mask builders.

TPU-first: masks are boolean (True = attend) and combined once per forward,
shared across layers (the reference builds additive -inf 4D masks per module,
modeling_acestep_v15_turbo.py:53-132; boolean masks let the flash kernel skip
blocks and let XLA fuse the select into the softmax).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def _geometry(seq_len: int, *, is_causal: bool, window: Optional[int]) -> jnp.ndarray:
    """(L, L) boolean geometry mask."""
    i = lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    j = lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    diff = i - j
    m = jnp.ones((seq_len, seq_len), dtype=bool)
    if is_causal:
        m &= diff >= 0
        if window is not None:
            m &= diff <= window
    elif window is not None:
        m &= jnp.abs(diff) <= window
    return m


def _with_padding(geom: jnp.ndarray, padding_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """geom: (L, L); padding_mask: (B, L) with 1 = valid -> (B|1, 1, L, L)."""
    geom = geom[None, None]
    if padding_mask is None:
        return geom
    pad = padding_mask.astype(bool)[:, None, None, :]  # mask keys only
    return geom & pad


def bidirectional_mask(seq_len: int, padding_mask: Optional[jnp.ndarray] = None,
                       window: Optional[int] = None) -> jnp.ndarray:
    """Bidirectional full or sliding-window mask: (B|1, 1, L, L) bool."""
    return _with_padding(_geometry(seq_len, is_causal=False, window=window), padding_mask)


def causal_mask(seq_len: int, padding_mask: Optional[jnp.ndarray] = None,
                window: Optional[int] = None) -> jnp.ndarray:
    """Causal full or sliding-window mask: (B|1, 1, L, L) bool."""
    return _with_padding(_geometry(seq_len, is_causal=True, window=window), padding_mask)


def cross_mask(q_len: int, kv_padding_mask: jnp.ndarray) -> jnp.ndarray:
    """Cross-attention mask: queries attend to all valid encoder keys.
    kv_padding_mask: (B, Lk) -> (B, 1, Lq, Lk) bool."""
    pad = kv_padding_mask.astype(bool)[:, None, None, :]
    return jnp.broadcast_to(pad, (pad.shape[0], 1, q_len, pad.shape[-1]))


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Boolean mask -> additive bias (0 keep / large-negative drop)."""
    neg = jnp.finfo(dtype).min
    return jnp.where(mask, jnp.zeros((), dtype), jnp.full((), neg, dtype))
