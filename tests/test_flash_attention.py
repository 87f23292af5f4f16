"""Flash-attention kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acestep_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_reference,
)


def _qkv(key, B=1, Lq=200, Lk=200, Hq=4, Hkv=2, D=32, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, Lq, Hq, D), dtype)
    k = jax.random.normal(ks[1], (B, Lk, Hkv, D), dtype)
    v = jax.random.normal(ks[2], (B, Lk, Hkv, D), dtype)
    return q, k, v


@pytest.mark.slow
@pytest.mark.parametrize("Lq,Lk", [(128, 128), (200, 200), (130, 70)])
def test_full_attention_matches_dense(Lq, Lk):
    q, k, v = _qkv(jax.random.PRNGKey(0), Lq=Lq, Lk=Lk)
    out = flash_attention(q, k, v, interpret=True)
    ref = flash_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("L,window", [(256, 128), (300, 128), (384, 64)])
def test_sliding_window_matches_dense(L, window):
    q, k, v = _qkv(jax.random.PRNGKey(1), Lq=L, Lk=L)
    out = flash_attention(q, k, v, window=window, interpret=True)
    ref = flash_attention_reference(q, k, v, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_sliding_window_edge_blocks_not_double_counted():
    """Border q-blocks alias clamped K blocks; result must equal dense."""
    L, window = 128 * 3, 128
    q, k, v = _qkv(jax.random.PRNGKey(2), Lq=L, Lk=L, Hq=2, Hkv=2)
    out = flash_attention(q, k, v, window=window, interpret=True)
    ref = flash_attention_reference(q, k, v, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_gqa_group_mapping():
    q, k, v = _qkv(jax.random.PRNGKey(3), Hq=8, Hkv=2, Lq=128, Lk=128)
    out = flash_attention(q, k, v, interpret=True)
    ref = flash_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_bf16_inputs():
    q, k, v = _qkv(jax.random.PRNGKey(4), dtype=jnp.bfloat16, Lq=128, Lk=128)
    out = flash_attention(q, k, v, interpret=True)
    ref = flash_attention_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_window_wider_than_block_rejected():
    q, k, v = _qkv(jax.random.PRNGKey(5), Lq=256, Lk=256)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, window=256, block_k=128, interpret=True)


def _grads(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        # non-uniform cotangent exercises dO paths properly
        w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return jnp.sum(out * w)
    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.slow
@pytest.mark.parametrize("Lq,Lk", [(128, 128), (200, 70)])
def test_backward_full_matches_dense(Lq, Lk):
    q, k, v = _qkv(jax.random.PRNGKey(6), Lq=Lq, Lk=Lk)
    gq, gk, gv = _grads(lambda *a: flash_attention(*a, interpret=True),
                        q, k, v)
    rq, rk, rv = _grads(flash_attention_reference, q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("L,window", [(256, 128), (300, 64)])
def test_backward_banded_matches_dense(L, window):
    q, k, v = _qkv(jax.random.PRNGKey(7), Lq=L, Lk=L)
    gq, gk, gv = _grads(
        lambda *a: flash_attention(*a, window=window, interpret=True),
        q, k, v)
    rq, rk, rv = _grads(
        lambda *a: flash_attention_reference(*a, window=window), q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_backward_gqa_groups():
    q, k, v = _qkv(jax.random.PRNGKey(8), Hq=8, Hkv=2, Lq=130, Lk=130)
    gq, gk, gv = _grads(lambda *a: flash_attention(*a, interpret=True),
                        q, k, v)
    rq, rk, rv = _grads(flash_attention_reference, q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=2e-4, atol=2e-4)
