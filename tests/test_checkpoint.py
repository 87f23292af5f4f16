"""Checkpoint conversion tests with synthetic reference-layout state dicts,
plus torch-parity for the conv layout conventions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig, LMConfig, VAEConfig
from acestep_tpu.utils import checkpoint as ckpt


def _rng_tensors(spec):
    rng = np.random.default_rng(0)
    return {k: rng.standard_normal(v).astype(np.float32) for k, v in spec.items()}


# ------------------------------------------------------------------
# Conv layout parity vs torch
# ------------------------------------------------------------------


def test_conv1d_layout_matches_torch():
    import torch

    from acestep_tpu.ops.conv import conv1d

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 20, 3)).astype(np.float32)
    w = rng.standard_normal((5, 3, 7)).astype(np.float32)   # torch (out, in, k)
    b = rng.standard_normal((5,)).astype(np.float32)

    ref = torch.nn.functional.conv1d(
        torch.tensor(x).transpose(1, 2), torch.tensor(w), torch.tensor(b),
        stride=2, padding=3, dilation=1).transpose(1, 2).numpy()

    src = ckpt._Src({"c.weight": w, "c.bias": b}, jnp.float32)
    p = src.conv1d("c")
    out = np.asarray(conv1d(p, jnp.asarray(x), stride=2, padding=3))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_conv1d_transpose_layout_matches_torch():
    import torch

    from acestep_tpu.ops.conv import conv1d_transpose

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, 4)).astype(np.float32)
    w = rng.standard_normal((4, 6, 8)).astype(np.float32)   # torch (in, out, k)
    b = rng.standard_normal((6,)).astype(np.float32)

    ref = torch.nn.functional.conv_transpose1d(
        torch.tensor(x).transpose(1, 2), torch.tensor(w), torch.tensor(b),
        stride=4, padding=2).transpose(1, 2).numpy()

    src = ckpt._Src({"c.weight": w, "c.bias": b}, jnp.float32)
    p = src.conv1d_transpose("c")
    out = np.asarray(conv1d_transpose(p, jnp.asarray(x), stride=4, padding=2))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_weight_norm_fusion_matches_torch():
    import torch

    conv = torch.nn.Conv1d(3, 5, 7)
    wn = torch.nn.utils.weight_norm(conv)
    state = {k: v.detach().numpy() for k, v in wn.state_dict().items()}
    fused = ckpt._fuse_weight_norm(state)
    assert "weight" in fused
    with torch.no_grad():
        expected = torch.nn.utils.remove_weight_norm(wn).weight.numpy()
    np.testing.assert_allclose(fused["weight"], expected, atol=1e-5, rtol=1e-5)


# ------------------------------------------------------------------
# Full-tree conversion from synthetic reference-named state dicts
# ------------------------------------------------------------------


def _dit_state_spec(cfg: DiTConfig) -> dict:
    h, hd = cfg.hidden_size, cfg.head_dim
    q, kv = cfg.num_attention_heads * hd, cfg.num_key_value_heads * hd
    inter = cfg.intermediate_size
    spec = {}

    def attn(p):
        spec[f"{p}.q_proj.weight"] = (q, h)
        spec[f"{p}.k_proj.weight"] = (kv, h)
        spec[f"{p}.v_proj.weight"] = (kv, h)
        spec[f"{p}.o_proj.weight"] = (h, q)
        spec[f"{p}.q_norm.weight"] = (hd,)
        spec[f"{p}.k_norm.weight"] = (hd,)

    def mlp(p):
        spec[f"{p}.gate_proj.weight"] = (inter, h)
        spec[f"{p}.up_proj.weight"] = (inter, h)
        spec[f"{p}.down_proj.weight"] = (h, inter)

    def enc_layer(p):
        attn(f"{p}.self_attn")
        mlp(f"{p}.mlp")
        spec[f"{p}.input_layernorm.weight"] = (h,)
        spec[f"{p}.post_attention_layernorm.weight"] = (h,)

    for i in range(cfg.num_hidden_layers):
        p = f"decoder.layers.{i}"
        attn(f"{p}.self_attn")
        attn(f"{p}.cross_attn")
        mlp(f"{p}.mlp")
        for nm in ["self_attn_norm", "cross_attn_norm", "mlp_norm"]:
            spec[f"{p}.{nm}.weight"] = (h,)
        spec[f"{p}.scale_shift_table"] = (1, 6, h)
    spec["decoder.proj_in.1.weight"] = (h, cfg.in_channels, cfg.patch_size)
    spec["decoder.proj_in.1.bias"] = (h,)
    spec["decoder.proj_out.1.weight"] = (h, cfg.audio_acoustic_hidden_dim, cfg.patch_size)
    spec["decoder.proj_out.1.bias"] = (cfg.audio_acoustic_hidden_dim,)
    for te in ["time_embed", "time_embed_r"]:
        spec[f"decoder.{te}.linear_1.weight"] = (h, 256)
        spec[f"decoder.{te}.linear_1.bias"] = (h,)
        spec[f"decoder.{te}.linear_2.weight"] = (h, h)
        spec[f"decoder.{te}.linear_2.bias"] = (h,)
        spec[f"decoder.{te}.time_proj.weight"] = (6 * h, h)
        spec[f"decoder.{te}.time_proj.bias"] = (6 * h,)
    spec["decoder.condition_embedder.weight"] = (h, h)
    spec["decoder.condition_embedder.bias"] = (h,)
    spec["decoder.norm_out.weight"] = (h,)
    spec["decoder.scale_shift_table"] = (1, 2, h)

    spec["encoder.text_projector.weight"] = (h, cfg.text_hidden_dim)
    spec["encoder.lyric_encoder.embed_tokens.weight"] = (h, cfg.text_hidden_dim)
    spec["encoder.lyric_encoder.embed_tokens.bias"] = (h,)
    spec["encoder.lyric_encoder.norm.weight"] = (h,)
    for i in range(cfg.num_lyric_encoder_hidden_layers):
        enc_layer(f"encoder.lyric_encoder.layers.{i}")
    spec["encoder.timbre_encoder.embed_tokens.weight"] = (h, cfg.timbre_hidden_dim)
    spec["encoder.timbre_encoder.embed_tokens.bias"] = (h,)
    spec["encoder.timbre_encoder.norm.weight"] = (h,)
    spec["encoder.timbre_encoder.special_token"] = (1, 1, h)
    for i in range(cfg.num_timbre_encoder_hidden_layers):
        enc_layer(f"encoder.timbre_encoder.layers.{i}")

    spec["tokenizer.audio_acoustic_proj.weight"] = (h, cfg.audio_acoustic_hidden_dim)
    spec["tokenizer.audio_acoustic_proj.bias"] = (h,)
    spec["tokenizer.attention_pooler.embed_tokens.weight"] = (h, h)
    spec["tokenizer.attention_pooler.embed_tokens.bias"] = (h,)
    spec["tokenizer.attention_pooler.norm.weight"] = (h,)
    spec["tokenizer.attention_pooler.special_token"] = (1, 1, h)
    for i in range(cfg.num_attention_pooler_hidden_layers):
        enc_layer(f"tokenizer.attention_pooler.layers.{i}")
    klev = len(cfg.fsq_levels)
    spec["tokenizer.quantizer.layers.0.project_in.weight"] = (klev, cfg.fsq_dim)
    spec["tokenizer.quantizer.layers.0.project_in.bias"] = (klev,)
    spec["tokenizer.quantizer.layers.0.project_out.weight"] = (cfg.fsq_dim, klev)
    spec["tokenizer.quantizer.layers.0.project_out.bias"] = (cfg.fsq_dim,)

    spec["detokenizer.embed_tokens.weight"] = (h, h)
    spec["detokenizer.embed_tokens.bias"] = (h,)
    spec["detokenizer.norm.weight"] = (h,)
    spec["detokenizer.special_tokens"] = (1, cfg.pool_window_size, h)
    spec["detokenizer.proj_out.weight"] = (cfg.audio_acoustic_hidden_dim, h)
    spec["detokenizer.proj_out.bias"] = (cfg.audio_acoustic_hidden_dim,)
    for i in range(cfg.num_attention_pooler_hidden_layers):
        enc_layer(f"detokenizer.layers.{i}")

    spec["null_condition_emb"] = (1, 1, h)
    return spec


@pytest.mark.slow
def test_convert_dit_state_tree_matches_init():
    from acestep_tpu.models.dit import init_dit_params

    cfg = DiTConfig.tiny(fsq_dim=64)
    state = _rng_tensors(_dit_state_spec(cfg))
    params = ckpt.convert_dit_state(state, cfg, dtype=jnp.float32, strict=True)
    ref = init_dit_params(jax.random.PRNGKey(0), cfg)

    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes


@pytest.mark.slow
def test_converted_dit_runs_forward():
    from acestep_tpu.models.dit import dit_decoder

    cfg = DiTConfig.tiny(fsq_dim=64)
    state = _rng_tensors(_dit_state_spec(cfg))
    params = ckpt.convert_dit_state(state, cfg, dtype=jnp.float32)
    B, T = 1, 8
    xt = jnp.zeros((B, T, cfg.audio_acoustic_hidden_dim))
    t = jnp.full((B,), 0.5)
    ctx = jnp.zeros((B, T, 2 * cfg.audio_acoustic_hidden_dim))
    enc = jnp.zeros((B, 6, cfg.hidden_size))
    out = dit_decoder(params, cfg, xt, t, t, ctx, encoder_hidden_states=enc)
    assert out.shape == (B, T, cfg.audio_acoustic_hidden_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def _lm_state_spec(cfg: LMConfig) -> dict:
    h, hd = cfg.hidden_size, cfg.head_dim
    q, kv = cfg.num_attention_heads * hd, cfg.num_key_value_heads * hd
    spec = {"model.embed_tokens.weight": (cfg.vocab_size, h),
            "model.norm.weight": (h,)}
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        spec[f"{p}.self_attn.q_proj.weight"] = (q, h)
        spec[f"{p}.self_attn.k_proj.weight"] = (kv, h)
        spec[f"{p}.self_attn.v_proj.weight"] = (kv, h)
        spec[f"{p}.self_attn.o_proj.weight"] = (h, q)
        spec[f"{p}.self_attn.q_norm.weight"] = (hd,)
        spec[f"{p}.self_attn.k_norm.weight"] = (hd,)
        spec[f"{p}.input_layernorm.weight"] = (h,)
        spec[f"{p}.post_attention_layernorm.weight"] = (h,)
        spec[f"{p}.mlp.gate_proj.weight"] = (cfg.intermediate_size, h)
        spec[f"{p}.mlp.up_proj.weight"] = (cfg.intermediate_size, h)
        spec[f"{p}.mlp.down_proj.weight"] = (h, cfg.intermediate_size)
    return spec


@pytest.mark.slow
def test_convert_lm_state_and_forward():
    from acestep_tpu.models.lm import KVCache, init_lm_params, lm_forward, lm_logits

    cfg = LMConfig.tiny()
    state = _rng_tensors(_lm_state_spec(cfg))
    params = ckpt.convert_lm_state(state, cfg, dtype=jnp.float32)
    ref = init_lm_params(jax.random.PRNGKey(0), cfg)
    assert jax.tree.map(lambda x: x.shape, ref) == jax.tree.map(lambda x: x.shape, params)

    ids = jnp.array([[1, 2, 3, 4]], jnp.int32)
    cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
    hidden, cache = lm_forward(params, cfg, ids, cache,
                               start_pos=jnp.zeros((), jnp.int32))
    logits = lm_logits(params, cfg, hidden)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert int(cache.length) == 4


def _vae_state_spec(cfg: VAEConfig) -> dict:
    cm = [1] + list(cfg.channel_multiples)
    h = cfg.encoder_hidden_size
    n = len(cfg.downsampling_ratios)
    spec = {}

    def snake(p, c):
        spec[f"{p}.alpha"] = (1, c, 1)
        spec[f"{p}.beta"] = (1, c, 1)

    def res(p, c):
        snake(f"{p}.snake1", c)
        spec[f"{p}.conv1.weight"] = (c, c, 7)
        spec[f"{p}.conv1.bias"] = (c,)
        snake(f"{p}.snake2", c)
        spec[f"{p}.conv2.weight"] = (c, c, 1)
        spec[f"{p}.conv2.bias"] = (c,)

    spec["encoder.conv1.weight"] = (h, cfg.audio_channels, 7)
    spec["encoder.conv1.bias"] = (h,)
    for i, s in enumerate(cfg.downsampling_ratios):
        cin, cout = h * cm[i], h * cm[i + 1]
        for r in ["res_unit1", "res_unit2", "res_unit3"]:
            res(f"encoder.block.{i}.{r}", cin)
        snake(f"encoder.block.{i}.snake1", cin)
        spec[f"encoder.block.{i}.conv1.weight"] = (cout, cin, 2 * s)
        spec[f"encoder.block.{i}.conv1.bias"] = (cout,)
    snake("encoder.snake1", h * cm[-1])
    spec["encoder.conv2.weight"] = (2 * cfg.decoder_input_channels, h * cm[-1], 3)
    spec["encoder.conv2.bias"] = (2 * cfg.decoder_input_channels,)

    d = cfg.decoder_channels
    up = list(cfg.downsampling_ratios)[::-1]
    spec["decoder.conv1.weight"] = (d * cm[-1], cfg.decoder_input_channels, 7)
    spec["decoder.conv1.bias"] = (d * cm[-1],)
    for i, s in enumerate(up):
        cin, cout = d * cm[n - i], d * cm[n - i - 1]
        snake(f"decoder.block.{i}.snake1", cin)
        spec[f"decoder.block.{i}.conv_t1.weight"] = (cin, cout, 2 * s)
        spec[f"decoder.block.{i}.conv_t1.bias"] = (cout,)
        for r in ["res_unit1", "res_unit2", "res_unit3"]:
            res(f"decoder.block.{i}.{r}", cout)
    snake("decoder.snake1", d)
    spec["decoder.conv2.weight"] = (cfg.audio_channels, d, 7)
    return spec


@pytest.mark.slow
def test_convert_vae_state_and_roundtrip():
    from acestep_tpu.models.vae import init_vae_params, vae_decode, vae_encode

    cfg = VAEConfig.tiny()
    state = _rng_tensors(_vae_state_spec(cfg))
    params = ckpt.convert_vae_state(state, cfg, dtype=jnp.float32)
    ref = init_vae_params(jax.random.PRNGKey(0), cfg)
    assert jax.tree.map(lambda x: x.shape, ref) == jax.tree.map(lambda x: x.shape, params)

    audio = jnp.zeros((1, 16 * cfg.hop_length, cfg.audio_channels))
    z = vae_encode(params, cfg, audio)
    out = vae_decode(params, cfg, z)
    assert out.shape == audio.shape
