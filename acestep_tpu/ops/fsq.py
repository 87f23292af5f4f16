"""Finite Scalar Quantization (FSQ) — pure arithmetic, exactly jittable.

Semantics match `vector_quantize_pytorch.ResidualFSQ` as used by the
reference audio tokenizer (modeling_acestep_v15_turbo.py:1193-1197) with
num_quantizers=1 (scale == 1), levels (8,8,8,5,5,5) => 64 000 codes.
The 2048<->6 projections live in the model (models/dit.py tokenizer);
these ops work on the 6-dim code space.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _consts(levels: Sequence[int]):
    lv = np.asarray(levels, dtype=np.float32)
    half_l = (lv - 1) * (1 + 1e-3) / 2
    offset = np.where(lv % 2 == 0, 0.5, 0.0).astype(np.float32)
    shift = np.arctanh(offset / half_l)
    half_width = (np.asarray(levels, dtype=np.int64) // 2).astype(np.float32)
    basis = np.concatenate([[1], np.cumprod(levels[:-1])]).astype(np.int32)
    return (
        jnp.asarray(lv), jnp.asarray(half_l), jnp.asarray(offset),
        jnp.asarray(shift), jnp.asarray(half_width), jnp.asarray(basis),
    )


def fsq_quantize(z: jnp.ndarray, levels: Sequence[int], *, ste: bool = True):
    """Quantize z (..., len(levels)) -> (codes, indices).

    codes: normalized quantized values in [-1, 1], same shape as z.
    indices: int32 (...,) flat code ids in [0, prod(levels)).
    """
    lv, half_l, offset, shift, half_width, basis = _consts(levels)
    zf = z.astype(jnp.float32)
    bounded = jnp.tanh(zf + shift) * half_l - offset
    rounded = jnp.round(bounded)
    if ste:
        rounded = bounded + jax.lax.stop_gradient(rounded - bounded)
    codes = rounded / half_width
    digits = (jax.lax.stop_gradient(rounded) + half_width).astype(jnp.int32)
    indices = jnp.sum(digits * basis, axis=-1).astype(jnp.int32)
    return codes.astype(z.dtype), indices


def fsq_indices_to_codes(indices: jnp.ndarray, levels: Sequence[int]) -> jnp.ndarray:
    """indices (...,) int -> normalized codes (..., len(levels)) float32."""
    lv, half_l, offset, shift, half_width, basis = _consts(levels)
    lv_i = jnp.asarray(np.asarray(levels, dtype=np.int32))
    digits = (indices[..., None].astype(jnp.int32) // basis) % lv_i
    centered = digits.astype(jnp.float32) - half_width
    return centered / half_width


def fsq_codes_to_indices(codes: jnp.ndarray, levels: Sequence[int]) -> jnp.ndarray:
    """Normalized codes (..., len(levels)) -> flat indices (...,) int32."""
    _, _, _, _, half_width, basis = _consts(levels)
    digits = jnp.round(codes.astype(jnp.float32) * half_width + half_width).astype(jnp.int32)
    return jnp.sum(digits * basis, axis=-1).astype(jnp.int32)
