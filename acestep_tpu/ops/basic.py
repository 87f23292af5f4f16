"""Core functional building blocks (pure JAX, no framework).

Parameters are nested dicts of `jnp.ndarray` leaves. Linear weights are
stored as (in_features, out_features) so application is `x @ w` — no
transposes in the hot path; the checkpoint converter transposes torch's
(out, in) layout once at load time.

Numerical conventions match the reference DiT stack
(/root/reference/acestep/models/turbo/modeling_acestep_v15_turbo.py):
Qwen3-style RMSNorm (float32 accumulation), HF rotate-half RoPE,
GQA with per-head Q/K RMSNorm, SwiGLU MLP.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# ------------------------------------------------------------------
# Initializers
# ------------------------------------------------------------------


def init_linear(key, in_dim: int, out_dim: int, *, bias: bool = True,
                std: float = 0.02, dtype=jnp.float32) -> dict:
    p = {"w": jax.random.normal(key, (in_dim, out_dim), dtype) * std}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def init_rms_norm(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype)}


def init_mlp(key, hidden: int, intermediate: int, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate": init_linear(k1, hidden, intermediate, bias=False, dtype=dtype),
        "up": init_linear(k2, hidden, intermediate, bias=False, dtype=dtype),
        "down": init_linear(k3, intermediate, hidden, bias=False, dtype=dtype),
    }


def init_attention(key, hidden: int, num_heads: int, num_kv_heads: int,
                   head_dim: int, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q_proj": init_linear(k1, hidden, num_heads * head_dim, bias=False, dtype=dtype),
        "k_proj": init_linear(k2, hidden, num_kv_heads * head_dim, bias=False, dtype=dtype),
        "v_proj": init_linear(k3, hidden, num_kv_heads * head_dim, bias=False, dtype=dtype),
        "o_proj": init_linear(k4, num_heads * head_dim, hidden, bias=False, dtype=dtype),
        "q_norm": init_rms_norm(head_dim, dtype),
        "k_norm": init_rms_norm(head_dim, dtype),
    }


# ------------------------------------------------------------------
# Primitives
# ------------------------------------------------------------------


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    w = p["w"]
    if isinstance(w, dict):
        # w8a8-dynamic quant node (ops/quant.py): int8 x int8 MXU matmul
        # with per-token activation scales, instead of a bf16 contraction.
        from acestep_tpu.ops.quant import w8a8_matmul
        y = w8a8_matmul(x, w)
    else:
        y = x @ w.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def rms_norm(p: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Qwen3RMSNorm: float32 variance, scale applied AFTER the downcast
    (`weight * hidden.to(input_dtype)` — same order in HF Qwen3RMSNorm and
    nano-vllm layernorm.py:25; scaling in f32 first differed by last-ulp
    per element in bf16, compounding over 24+ layers)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return xf.astype(dtype) * p["scale"].astype(dtype)


def mlp(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU: down(silu(gate(x)) * up(x)) — Qwen3MLP."""
    return linear(p["down"], jax.nn.silu(linear(p["gate"], x)) * linear(p["up"], x))


# ------------------------------------------------------------------
# RoPE (HF rotate-half convention, as used by Qwen3RotaryEmbedding)
# ------------------------------------------------------------------


def rope_cos_sin(seq_len: Optional[int], head_dim: int, theta: float,
                 dtype=jnp.float32, positions: Optional[jnp.ndarray] = None):
    """Returns (cos, sin), each (*positions.shape, head_dim), HF convention:
    frequencies duplicated across both halves of the head dim. `positions`
    may be (L,) or per-row (B, L); default arange(seq_len)."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if positions is None:
        positions = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)               # (..., D)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, L, H, D); cos/sin: (L, D) or (B, L, D)."""
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    return x * cos.astype(x.dtype) + _rotate_half(x) * sin.astype(x.dtype)


# ------------------------------------------------------------------
# Attention (XLA dense path; the Pallas flash kernel lives in
# ops/flash_attention.py and is selected by the model when profitable)
# ------------------------------------------------------------------


def _qkv(p: dict, x: jnp.ndarray, kv_src: jnp.ndarray, num_heads: int,
         num_kv_heads: int, head_dim: int, eps: float):
    B, Lq, _ = x.shape
    Lk = kv_src.shape[1]
    q = linear(p["q_proj"], x).reshape(B, Lq, num_heads, head_dim)
    k = linear(p["k_proj"], kv_src).reshape(B, Lk, num_kv_heads, head_dim)
    v = linear(p["v_proj"], kv_src).reshape(B, Lk, num_kv_heads, head_dim)
    q = rms_norm(p["q_norm"], q, eps)
    k = rms_norm(p["k_norm"], k, eps)
    return q, k, v


def attention_kv(p: dict, x: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 *, num_heads: int, head_dim: int,
                 mask: Optional[jnp.ndarray] = None,
                 eps: float = 1e-6,
                 return_weights: bool = False):
    """Attention where K/V (B, Lk, Hkv, D) are already computed (cross-attn
    with precomputed condition K/V — the XLA analogue of the reference's
    EncoderDecoderCache, modeling_acestep_v15_turbo.py:307-330)."""
    B, Lq, _ = x.shape
    q = linear(p["q_proj"], x).reshape(B, Lq, num_heads, head_dim)
    q = rms_norm(p["q_norm"], q, eps)
    out, w = _sdpa(q, k, v, mask, return_weights=return_weights)
    out = linear(p["o_proj"], out.reshape(B, Lq, num_heads * head_dim))
    return (out, w) if return_weights else out


def cross_kv(p: dict, enc: jnp.ndarray, *, num_kv_heads: int, head_dim: int,
             eps: float = 1e-6):
    """Precompute cross-attention K/V from encoder states once per trajectory."""
    B, Lk, _ = enc.shape
    k = linear(p["k_proj"], enc).reshape(B, Lk, num_kv_heads, head_dim)
    v = linear(p["v_proj"], enc).reshape(B, Lk, num_kv_heads, head_dim)
    k = rms_norm(p["k_norm"], k, eps)
    return k, v


def _sdpa(q, k, v, mask, *, scale: Optional[float] = None,
          return_weights: bool = False):
    """Grouped-query scaled dot-product attention, fp32 softmax.

    q: (B, Lq, Hq, D); k/v: (B, Lk, Hkv, D); mask: bool (B|1, 1, Lq, Lk).
    """
    B, Lq, Hq, D = q.shape
    Hkv = k.shape[2]
    groups = Hq // Hkv
    scale = scale if scale is not None else D ** -0.5

    qg = q.reshape(B, Lq, Hkv, groups, D)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, :, None, :, :], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v)
    out = out.reshape(B, Lq, Hq, D)
    if return_weights:
        # (B, Hq, Lq, Lk) — for the LRC alignment path
        w = probs.reshape(B, Hkv * groups, Lq, -1)
        return out, w
    return out, None


# public alias: models/lm.py shares the same GQA kernel
sdpa = _sdpa


def attention(p: dict, x: jnp.ndarray, *,
              num_heads: int, num_kv_heads: int, head_dim: int,
              kv_src: Optional[jnp.ndarray] = None,
              mask: Optional[jnp.ndarray] = None,
              rope: Optional[tuple] = None,
              eps: float = 1e-6,
              return_weights: bool = False):
    """Shared self/cross attention (reference AceStepAttention.forward,
    modeling_acestep_v15_turbo.py:253-368): per-head Q/K RMSNorm; RoPE only
    on the self-attention path; GQA.

    mask: boolean (B or 1, 1, Lq, Lk), True = attend.
    """
    is_cross = kv_src is not None
    src = kv_src if is_cross else x
    q, k, v = _qkv(p, x, src, num_heads, num_kv_heads, head_dim, eps)
    if not is_cross and rope is not None:
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    out, w = _sdpa(q, k, v, mask, return_weights=return_weights)
    B, Lq = x.shape[:2]
    out = linear(p["o_proj"], out.reshape(B, Lq, num_heads * head_dim))
    return (out, w) if return_weights else out


def attention_flash(p: dict, x: jnp.ndarray, *,
                    num_heads: int, num_kv_heads: int, head_dim: int,
                    rope: Optional[tuple] = None,
                    window: Optional[int] = None,
                    eps: float = 1e-6) -> jnp.ndarray:
    """Self-attention through the Pallas flash kernel (full or banded).

    Same projections/QK-norm/RoPE as `attention`; the softmax runs blockwise
    on-chip (ops/flash_attention.py) so L x L logits are never materialized.
    """
    from acestep_tpu.ops.flash_attention import flash_attention

    q, k, v = _qkv(p, x, x, num_heads, num_kv_heads, head_dim, eps)
    if rope is not None:
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    out = flash_attention(q, k, v, window=window)
    B, Lq = x.shape[:2]
    return linear(p["o_proj"], out.reshape(B, Lq, num_heads * head_dim))


# ------------------------------------------------------------------
# Timestep embedding (reference TimestepEmbedding.timestep_embedding,
# modeling_acestep_v15_turbo.py:222-243: scale 1000, [cos, sin] order)
# ------------------------------------------------------------------


def timestep_sinusoidal(t: jnp.ndarray, dim: int, *, scale: float = 1000.0,
                        max_period: float = 10_000.0) -> jnp.ndarray:
    """t: (B,) fractional timesteps -> (B, dim) float32 embedding."""
    t = t.astype(jnp.float32) * scale
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
