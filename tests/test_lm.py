"""Qwen3 LM tests: prefill/decode equivalence, sampling ops, CFG mixing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.config import LMConfig
from acestep_tpu.models.lm import (
    KVCache, apply_top_k, apply_top_p, cfg_mix_logits, init_lm_params,
    lm_encode, lm_forward, lm_logits, sample_tokens,
)


@pytest.fixture(scope="module")
def lm():
    cfg = LMConfig.tiny()
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


@pytest.mark.slow
def test_prefill_then_decode_matches_full_forward(lm):
    """Incremental decode with KV cache must equal one full forward."""
    params, cfg = lm
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, cfg.vocab_size)

    cache = KVCache.create(cfg, 2, 8, dtype=jnp.float32)
    full_hidden, _ = lm_forward(params, cfg, ids, cache,
                                start_pos=jnp.zeros((), jnp.int32))
    full_logits = lm_logits(params, cfg, full_hidden)

    cache = KVCache.create(cfg, 2, 8, dtype=jnp.float32)
    hidden, cache = lm_forward(params, cfg, ids[:, :4], cache,
                               start_pos=jnp.zeros((), jnp.int32))
    outs = [lm_logits(params, cfg, hidden)[:, -1]]
    for i in range(4, 6):
        hidden, cache = lm_forward(params, cfg, ids[:, i:i + 1], cache,
                                   start_pos=jnp.asarray(i, jnp.int32))
        outs.append(lm_logits(params, cfg, hidden)[:, -1])

    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(full_logits[:, 3]),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(outs[2]), np.asarray(full_logits[:, 5]),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_causality(lm):
    """Changing a future token must not affect earlier logits."""
    params, cfg = lm
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, cfg.vocab_size)
    ids2 = ids.at[0, 5].set((ids[0, 5] + 1) % cfg.vocab_size)

    def run(x):
        cache = KVCache.create(cfg, 1, 6, dtype=jnp.float32)
        h, _ = lm_forward(params, cfg, x, cache, start_pos=jnp.zeros((), jnp.int32))
        return lm_logits(params, cfg, h)

    a, b = run(ids), run(ids2)
    np.testing.assert_allclose(np.asarray(a[:, :5]), np.asarray(b[:, :5]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(a[:, 5]), np.asarray(b[:, 5]))


@pytest.mark.slow
def test_attention_mask_hides_padding(lm):
    """Logits at valid positions must be unchanged when left-padding grows."""
    params, cfg = lm
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 1, cfg.vocab_size)

    cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
    mask = jnp.ones((1, 8), jnp.int32)
    h_plain, _ = lm_forward(params, cfg, ids, cache,
                            start_pos=jnp.zeros((), jnp.int32),
                            attention_mask=mask)

    # same tokens written at positions 2..6 with first 2 slots masked out
    padded = jnp.concatenate([jnp.zeros((1, 2), jnp.int32), ids], axis=1)
    mask2 = jnp.asarray([[0, 0, 1, 1, 1, 1, 0, 0]], jnp.int32)
    cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
    h_pad, _ = lm_forward(params, cfg, padded, cache,
                          start_pos=jnp.zeros((), jnp.int32),
                          attention_mask=mask2)
    # positions differ (RoPE), so we only check finite + shape here; the
    # per-row position path is exercised in the generation-loop tests.
    assert np.all(np.isfinite(np.asarray(h_pad)))
    assert h_plain.shape == (1, 4, cfg.hidden_size)


@pytest.mark.slow
def test_attention_mask_authoritative_over_write_window(lm):
    """A masked-out LEADING key must not influence later positions even
    though it was written in the same call (round-4 review pin: an
    '|written' override neutralized the caller mask whenever the write
    window spanned the cache — i.e. in every lm_encode call, so
    left-padded batches attended their pad keys)."""
    params, cfg = lm
    tail = jax.random.randint(jax.random.PRNGKey(4), (1, 5), 1,
                              cfg.vocab_size)
    mask = jnp.asarray([[0, 1, 1, 1, 1, 1]], jnp.int32)
    h = []
    for junk in (1, 2):     # different masked token at position 0
        ids = jnp.concatenate(
            [jnp.full((1, 1), junk, jnp.int32), tail], axis=1)
        h.append(np.asarray(lm_encode(params, cfg, ids, mask)))
    np.testing.assert_allclose(h[0][:, 1:], h[1][:, 1:], atol=1e-6)


@pytest.mark.slow
def test_lm_encode_shape(lm):
    params, cfg = lm
    ids = jnp.ones((2, 5), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    h = lm_encode(params, cfg, ids, mask)
    assert h.shape == (2, 5, cfg.hidden_size)


def test_quantized_cache_matches_exact(lm):
    """int8 KV cache logits must track the f32-cache logits closely.

    Per-head-vector scales (KVCache quantized mode) bound the relative
    write error at ~1/254; over a tiny 2-layer model the end-to-end logit
    drift stays well under typical sampling noise."""
    params, cfg = lm
    ids = jax.random.randint(jax.random.PRNGKey(7), (2, 6), 0, cfg.vocab_size)

    exact = KVCache.create(cfg, 2, 8, dtype=jnp.float32)
    h_ref, _ = lm_forward(params, cfg, ids, exact,
                          start_pos=jnp.zeros((), jnp.int32))
    l_ref = np.asarray(lm_logits(params, cfg, h_ref))

    quant = KVCache.create(cfg, 2, 8, dtype=jnp.float32, quantized=True)
    assert quant.quantized and quant.k.dtype == jnp.int8
    h_q, cache_q = lm_forward(params, cfg, ids, quant,
                              start_pos=jnp.zeros((), jnp.int32))
    l_q = np.asarray(lm_logits(params, cfg, h_q))

    assert cache_q.k.dtype == jnp.int8 and cache_q.k_scale is not None
    scale = max(np.abs(l_ref).max(), 1.0)
    assert np.max(np.abs(l_q - l_ref)) / scale < 0.02


@pytest.mark.slow
def test_quantized_prefill_then_decode(lm):
    """Incremental decode through the int8 cache equals its own full
    forward (cache round-trip correctness, independent of quant error)."""
    params, cfg = lm
    ids = jax.random.randint(jax.random.PRNGKey(8), (2, 6), 0, cfg.vocab_size)

    cache = KVCache.create(cfg, 2, 8, dtype=jnp.float32, quantized=True)
    h_full, _ = lm_forward(params, cfg, ids, cache,
                           start_pos=jnp.zeros((), jnp.int32))
    l_full = np.asarray(lm_logits(params, cfg, h_full))

    cache = KVCache.create(cfg, 2, 8, dtype=jnp.float32, quantized=True)
    h, cache = lm_forward(params, cfg, ids[:, :4], cache,
                          start_pos=jnp.zeros((), jnp.int32))
    outs = [np.asarray(lm_logits(params, cfg, h))[:, -1]]
    for i in range(4, 6):
        h, cache = lm_forward(params, cfg, ids[:, i:i + 1], cache,
                              start_pos=jnp.asarray(i, jnp.int32))
        outs.append(np.asarray(lm_logits(params, cfg, h))[:, -1])

    np.testing.assert_allclose(outs[0], l_full[:, 3], atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(outs[2], l_full[:, 5], atol=2e-3, rtol=2e-3)


def test_quantized_graft_prefix(lm):
    """graft_prefix must copy int8 values AND their scales."""
    params, cfg = lm
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 4), 0, cfg.vocab_size)
    src = KVCache.create(cfg, 1, 8, dtype=jnp.float32, quantized=True)
    _, src = lm_forward(params, cfg, ids, src,
                        start_pos=jnp.zeros((), jnp.int32))

    dst = KVCache.create(cfg, 1, 12, dtype=jnp.float32, quantized=True)
    dst = dst.graft_prefix(src, 4)
    np.testing.assert_array_equal(np.asarray(dst.k[:, :, :4]),
                                  np.asarray(src.k[:, :, :4]))
    np.testing.assert_array_equal(np.asarray(dst.k_scale[:, :, :4]),
                                  np.asarray(src.k_scale[:, :, :4]))
    np.testing.assert_array_equal(np.asarray(dst.v_scale[:, :, :4]),
                                  np.asarray(src.v_scale[:, :, :4]))
    # untouched tail stays zero
    assert np.all(np.asarray(dst.k[:, :, 4:]) == 0)


def test_top_k():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert np.isneginf(out[0, 0]) and np.isneginf(out[0, 3])
    assert out[0, 1] == 5.0 and out[0, 2] == 3.0


def test_top_p():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(apply_top_p(logits, 0.7))
    # 0.5 kept; cum before 0.3 is 0.5 < 0.7 so 0.3 kept; 0.15's prefix 0.8 >= 0.7
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert np.isneginf(out[0, 2]) and np.isneginf(out[0, 3])


def test_sample_greedy_and_masked():
    logits = jnp.asarray([[1.0, 9.0, 3.0]])
    tok = sample_tokens(jax.random.PRNGKey(0), logits, temperature=0.0)
    assert int(tok[0]) == 1
    mask = jnp.asarray([[True, False, True]])
    tok = sample_tokens(jax.random.PRNGKey(0), logits, temperature=0.0,
                        allow_mask=mask)
    assert int(tok[0]) == 2


def test_cfg_mix():
    cond = jnp.asarray([[2.0, 0.0]])
    uncond = jnp.asarray([[1.0, 0.0]])
    logits = jnp.concatenate([cond, uncond], axis=0)
    out = np.asarray(cfg_mix_logits(logits, 3.0))
    np.testing.assert_allclose(out, [[1.0 + 3.0 * 1.0, 0.0]])
