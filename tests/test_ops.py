"""Unit tests for core ops, cross-checked against torch (CPU) where the
reference stack defines the semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from acestep_tpu.ops import (
    attention, conv1d, conv1d_transpose, fsq_codes_to_indices,
    fsq_indices_to_codes, fsq_quantize, init_attention, init_conv1d,
    init_conv1d_transpose, init_linear, init_mlp, init_rms_norm, linear,
    mlp, rms_norm, timestep_sinusoidal,
)
from acestep_tpu.ops.basic import apply_rope, rope_cos_sin
from acestep_tpu.ops.masks import bidirectional_mask, causal_mask, cross_mask


def test_rms_norm_matches_torch():
    x = np.random.randn(2, 5, 16).astype(np.float32)
    scale = np.random.randn(16).astype(np.float32)
    got = rms_norm({"scale": jnp.asarray(scale)}, jnp.asarray(x))
    xt = torch.tensor(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    want = (xt * torch.rsqrt(var + 1e-6)) * torch.tensor(scale)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_mlp_swiglu():
    key = jax.random.PRNGKey(0)
    p = init_mlp(key, 8, 16)
    x = jnp.ones((1, 3, 8))
    y = mlp(p, x)
    gate = x @ p["gate"]["w"]
    up = x @ p["up"]["w"]
    want = (jax.nn.silu(gate) * up) @ p["down"]["w"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-5)


def test_rope_matches_hf_rotate_half():
    # Cross-check against the HF formula directly.
    L, D = 6, 8
    cos, sin = rope_cos_sin(L, D, theta=10_000.0)
    x = np.random.randn(1, L, 2, D).astype(np.float32)
    got = apply_rope(jnp.asarray(x), cos, sin)

    half = D // 2
    inv_freq = 1.0 / (10_000.0 ** (np.arange(half) / half))
    t = np.arange(L)
    freqs = np.outer(t, inv_freq)
    emb = np.concatenate([freqs, freqs], -1)
    c, s = np.cos(emb), np.sin(emb)
    x1, x2 = x[..., :half], x[..., half:]
    rot = np.concatenate([-x2, x1], -1)
    want = x * c[None, :, None, :] + rot * s[None, :, None, :]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_timestep_embedding_matches_reference_formula():
    # Reference: modeling_acestep_v15_turbo.py:222-243 (scale 1000, cos|sin).
    t = np.array([0.5, 1.0], dtype=np.float32)
    got = timestep_sinusoidal(jnp.asarray(t), 8)
    ts = torch.tensor(t) * 1000.0
    half = 4
    freqs = torch.exp(-np.log(10_000.0) * torch.arange(half) / half)
    args = ts[:, None] * freqs[None]
    want = torch.cat([torch.cos(args), torch.sin(args)], -1)
    # Large-phase cos/sin in fp32 differ in the last few ulps between XLA
    # and torch; absolute 1e-3 on values in [-1, 1] is tight enough.
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-3)


@pytest.mark.slow
def test_attention_gqa_shapes_and_mask():
    key = jax.random.PRNGKey(1)
    H, HKV, D = 4, 2, 8
    p = init_attention(key, 16, H, HKV, D)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 16))
    pad = jnp.asarray([[1, 1, 1, 1, 0, 0], [1] * 6])
    m = bidirectional_mask(6, pad)
    y = attention(p, x, num_heads=H, num_kv_heads=HKV, head_dim=D, mask=m)
    assert y.shape == (2, 6, 16)
    # Masked keys must not influence output: change padded positions of x
    x2 = x.at[0, 4:].set(123.0)
    y2 = attention(p, x2, num_heads=H, num_kv_heads=HKV, head_dim=D, mask=m)
    np.testing.assert_allclose(np.asarray(y[0, :4]), np.asarray(y2[0, :4]), atol=1e-4)


@pytest.mark.slow
def test_cross_attention_permutation_invariance():
    """Packed-order invariance: permuting encoder tokens (with masks fixed
    accordingly) must not change cross-attn output — this justifies replacing
    the reference's sort-based pack_sequences with fixed-layout concat."""
    key = jax.random.PRNGKey(3)
    H, HKV, D = 4, 2, 8
    p = init_attention(key, 16, H, HKV, D)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16))
    enc = jax.random.normal(jax.random.PRNGKey(5), (1, 5, 16))
    kv_mask = jnp.asarray([[1, 1, 0, 1, 0]])
    m = cross_mask(3, kv_mask)
    y1 = attention(p, x, num_heads=H, num_kv_heads=HKV, head_dim=D,
                   kv_src=enc, mask=m)
    perm = jnp.asarray([3, 0, 1, 2, 4])
    y2 = attention(p, x, num_heads=H, num_kv_heads=HKV, head_dim=D,
                   kv_src=enc[:, perm], mask=cross_mask(3, kv_mask[:, perm]))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_causal_and_sliding_masks():
    m = causal_mask(4)
    assert bool(m[0, 0, 0, 1]) is False and bool(m[0, 0, 3, 0]) is True
    ms = bidirectional_mask(6, window=2)
    assert bool(ms[0, 0, 0, 3]) is False and bool(ms[0, 0, 0, 2]) is True
    assert bool(ms[0, 0, 5, 3]) is True


def test_fsq_roundtrip():
    levels = (8, 8, 8, 5, 5, 5)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 6)) * 3
    codes, idx = fsq_quantize(z, levels)
    assert idx.shape == (4, 7)
    assert int(idx.min()) >= 0 and int(idx.max()) < 64_000
    codes2 = fsq_indices_to_codes(idx, levels)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(codes2), atol=1e-6)
    idx2 = fsq_codes_to_indices(codes, levels)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


def test_fsq_matches_reference_quantizer_formula():
    # Mirror of vector_quantize_pytorch FSQ bound() semantics.
    levels = (8, 5)
    z = np.random.randn(10, 2).astype(np.float32) * 2
    codes, _ = fsq_quantize(jnp.asarray(z), levels)
    lv = np.array(levels, np.float32)
    half_l = (lv - 1) * (1 + 1e-3) / 2
    offset = np.where(lv % 2 == 0, 0.5, 0.0)
    shift = np.arctanh(offset / half_l)
    bounded = np.tanh(z + shift) * half_l - offset
    want = np.round(bounded) / (np.array(levels) // 2)
    np.testing.assert_allclose(np.asarray(codes), want, atol=1e-5)


@pytest.mark.parametrize("stride,pad,dil", [(1, 3, 1), (2, 1, 1), (1, 9, 3)])
def test_conv1d_matches_torch(stride, pad, dil):
    B, L, Cin, Cout, K = 2, 20, 3, 5, 7
    x = np.random.randn(B, L, Cin).astype(np.float32)
    p = init_conv1d(jax.random.PRNGKey(0), Cin, Cout, K)
    got = conv1d(p, jnp.asarray(x), stride=stride, padding=pad, dilation=dil)
    conv = torch.nn.Conv1d(Cin, Cout, K, stride=stride, padding=pad, dilation=dil)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(np.asarray(p["w"])).permute(2, 1, 0))
        conv.bias.copy_(torch.tensor(np.asarray(p["b"])))
        want = conv(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


@pytest.mark.parametrize("stride,pad", [(2, 1), (4, 2), (8, 4), (2, 0)])
def test_conv1d_transpose_matches_torch(stride, pad):
    B, L, Cin, Cout = 2, 10, 4, 3
    K = 2 * stride
    x = np.random.randn(B, L, Cin).astype(np.float32)
    p = init_conv1d_transpose(jax.random.PRNGKey(1), Cin, Cout, K)
    got = conv1d_transpose(p, jnp.asarray(x), stride=stride, padding=pad)
    tconv = torch.nn.ConvTranspose1d(Cin, Cout, K, stride=stride, padding=pad)
    with torch.no_grad():
        # my (k, in, out) -> torch (in, out, k)
        tconv.weight.copy_(torch.tensor(np.asarray(p["w"])).permute(1, 2, 0))
        tconv.bias.copy_(torch.tensor(np.asarray(p["b"])))
        want = tconv(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)
