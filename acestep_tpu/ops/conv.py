"""1D convolution ops in NLC layout (batch, length, channels).

Channels-last keeps the feature dimension in lanes so XLA maps large convs
onto the MXU. Weight layout is (kernel, in, out) == lax 'HIO'.

Transposed conv follows torch ConvTranspose1d semantics (used by the DiT
de-patchifier, modeling_acestep_v15_turbo.py:1284-1294, and the Oobleck VAE
decoder) via the standard input-dilated-conv equivalence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHC", "HIO", "NHC")


def _precision(x):
    # Default matmul precision truncates f32 operands to bf16; keep full
    # precision for f32 inputs (CPU tests / VAE quality), fast path for bf16.
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def init_conv1d(key, in_ch: int, out_ch: int, kernel: int, *, bias: bool = True,
                std: float = 0.02, dtype=jnp.float32) -> dict:
    p = {"w": jax.random.normal(key, (kernel, in_ch, out_ch), dtype) * std}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def init_conv1d_transpose(key, in_ch: int, out_ch: int, kernel: int, *,
                          bias: bool = True, std: float = 0.02,
                          dtype=jnp.float32) -> dict:
    # Same storage layout as conv1d: (kernel, in, out).
    return init_conv1d(key, in_ch, out_ch, kernel, bias=bias, std=std, dtype=dtype)


def _conv_weight(w, dtype):
    """Convs consume quant nodes as weight-only (materialized): the int8
    activation path (ops/quant.w8a8_matmul) only applies to linears."""
    if isinstance(w, dict):
        from acestep_tpu.ops.quant import dequantize_params
        w = dequantize_params(w, dtype, materialize_w8a8=True)
    return w.astype(dtype)


def conv1d(p: dict, x: jnp.ndarray, *, stride: int = 1, padding: int = 0,
           dilation: int = 1) -> jnp.ndarray:
    """x: (B, L, Cin) -> (B, L', Cout). `padding` is symmetric (torch-style)."""
    w = _conv_weight(p["w"], x.dtype)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMS,
        precision=_precision(x),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv1d_transpose(p: dict, x: jnp.ndarray, *, stride: int = 1,
                     padding: int = 0, output_padding: int = 0) -> jnp.ndarray:
    """torch ConvTranspose1d equivalent: out_len = (L-1)*stride - 2*padding
    + kernel + output_padding."""
    w = _conv_weight(p["w"], x.dtype)
    k = w.shape[0]
    y = lax.conv_general_dilated(
        x, jnp.flip(w, axis=0),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMS,
        precision=_precision(x),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y
