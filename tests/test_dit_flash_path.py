"""Decoder flash-path parity: paired flash scan == dense masked scan."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# slow tier: every test compiles the Pallas flash path
pytestmark = pytest.mark.slow

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


def test_flash_path_under_tp_mesh():
    """GSPMD x Pallas interaction (VERDICT r2 item 4): the flash kernel is
    an opaque custom call — prove the partitioner handles tp-sharded heads
    by running the flash decoder under tp=2 and comparing to the dense
    single-device forward."""
    from acestep_tpu.parallel import (
        dit_param_pspecs, make_mesh, shard_pytree,
    )

    cfg = DiTConfig.tiny(num_attention_heads=4, num_key_value_heads=2,
                         intermediate_size=128, num_hidden_layers=2)
    cfg_flash = dataclasses.replace(cfg, attention_impl="flash")
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    B, T = 1, 512
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    xt = jax.random.normal(ks[0], (B, T, cfg.audio_acoustic_hidden_dim))
    t = jnp.full((B,), 0.5)
    ctx = jnp.zeros((B, T, 2 * cfg.audio_acoustic_hidden_dim))
    enc = jax.random.normal(ks[1], (B, 16, cfg.hidden_size))

    def fwd(cfg_):
        return jax.jit(lambda p, x: dit_decoder(
            p, cfg_, x, t, t, ctx, encoder_hidden_states=enc))

    ref = np.asarray(fwd(cfg)(params, xt))
    mesh = make_mesh(dp=1, tp=2)
    params_tp = shard_pytree(params, mesh, dit_param_pspecs(params))
    out = np.asarray(fwd(cfg_flash)(params_tp, xt))
    assert np.abs(out - ref).max() < 5e-4
