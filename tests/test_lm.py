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


def test_lm_encode_shape(lm):
    params, cfg = lm
    ids = jnp.ones((2, 5), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    h = lm_encode(params, cfg, ids, mask)
    assert h.shape == (2, 5, cfg.hidden_size)


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
