"""Decoder flash-path parity: paired flash scan == dense masked scan."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import DiTConfig
from acestep_tpu.models.dit import (
    decoder_cross_kv,
    dit_decoder,
    init_dit_params,
    resolve_attention_impl,
)


def _setup(window=4):
    cfg = DiTConfig.tiny(sliding_window=window, num_hidden_layers=4)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    B, T, cond = 2, 20, 12
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    xt = jax.random.normal(ks[0], (B, T, cfg.audio_acoustic_hidden_dim))
    t = jnp.full((B,), 0.4)
    ctx = jax.random.normal(ks[1], (B, T, 2 * cfg.audio_acoustic_hidden_dim))
    enc = jax.random.normal(ks[2], (B, cond, cfg.hidden_size))
    return cfg, params, xt, t, ctx, enc


def test_resolve_impl_ladder():
    cfg = DiTConfig.tiny()
    assert cfg.layers_alternate()
    assert resolve_attention_impl(cfg) in ("flash", "dense")
    assert resolve_attention_impl(
        dataclasses.replace(cfg, attention_impl="dense")) == "dense"
    # non-alternating layout can't use the paired flash path
    odd = DiTConfig.tiny(num_hidden_layers=3,
                         layer_types=("full_attention",) * 3,
                         attention_impl="flash")
    assert resolve_attention_impl(odd) == "dense"


def test_flash_path_matches_dense():
    cfg, params, xt, t, ctx, enc = _setup()
    dense_cfg = dataclasses.replace(cfg, attention_impl="dense")
    flash_cfg = dataclasses.replace(cfg, attention_impl="flash")

    out_dense = dit_decoder(params, dense_cfg, xt, t, t, ctx,
                            encoder_hidden_states=enc)
    out_flash = dit_decoder(params, flash_cfg, xt, t, t, ctx,
                            encoder_hidden_states=enc)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_dense),
                               rtol=2e-4, atol=2e-4)


def test_flash_path_matches_dense_with_kv_cache():
    cfg, params, xt, t, ctx, enc = _setup()
    dense_cfg = dataclasses.replace(cfg, attention_impl="dense")
    flash_cfg = dataclasses.replace(cfg, attention_impl="flash")
    kv = decoder_cross_kv(params, cfg, enc)

    out_dense = dit_decoder(params, dense_cfg, xt, t, t, ctx,
                            cross_kv_cache=kv)
    out_flash = dit_decoder(params, flash_cfg, xt, t, t, ctx,
                            cross_kv_cache=kv)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_dense),
                               rtol=2e-4, atol=2e-4)
