"""Quantization tests: int8/fp8 weight-only + w8a8 dynamic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.models.dit import init_dit_params
from acestep_tpu.ops.quant import (
    FP8_KEY,
    QUANT_KEY,
    W8A8_KEY,
    dequantize_params,
    quantize_tree,
    quantize_tree_int8,
    quantized_bytes,
    w8a8_matmul,
)


@pytest.mark.slow
def test_quantize_roundtrip_error_and_exclusions():
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    q = quantize_tree_int8(params)

    # decoder attention weight got quantized
    node = q["decoder"]["layers"]["self_attn"]["q_proj"]["w"]
    assert QUANT_KEY in node and node[QUANT_KEY].dtype == jnp.int8
    # tokenizer / detokenizer excluded (reference DiT-only filter)
    assert not isinstance(
        q["tokenizer"]["audio_acoustic_proj"]["w"], dict)
    assert not isinstance(q["detokenizer"]["proj_out"]["w"], dict)
    # norms untouched
    assert q["decoder"]["norm_out"]["scale"].ndim == 1

    deq = dequantize_params(q, jnp.float32)
    w0 = np.asarray(params["decoder"]["layers"]["self_attn"]["q_proj"]["w"])
    w1 = np.asarray(deq["decoder"]["layers"]["self_attn"]["q_proj"]["w"])
    rel = np.abs(w0 - w1).max() / np.abs(w0).max()
    assert rel < 0.02
    # memory halves vs f32 on quantized leaves
    assert quantized_bytes(q) < quantized_bytes(params)


@pytest.mark.slow
def test_quantized_generation_close_to_full():
    from acestep_tpu.pipeline.handler import AceStepHandler

    kw = dict(dit_config=DiTConfig.tiny(fsq_dim=64),
              vae_config=VAEConfig.tiny(decoder_input_channels=64),
              dtype=jnp.float32, frame_bucket=20, min_frames=20,
              refer_frames=10)
    full = AceStepHandler(**kw)
    full.initialize_service(seed=0)
    quant = AceStepHandler(**kw)
    quant.initialize_service(seed=0, quantization="int8")

    gen_kw = dict(audio_duration=0.8, seeds=7, normalize=False)
    a = full.generate_music("song", "x", **gen_kw)
    b = quant.generate_music("song", "x", **gen_kw)
    # int8 weights perturb the trajectory but keep it sane and correlated
    assert np.all(np.isfinite(b.pred_latents))
    corr = np.corrcoef(a.pred_latents.ravel(), b.pred_latents.ravel())[0, 1]
    assert corr > 0.95

    # audio_to_codes still works (tokenizer unquantized)
    audio = np.zeros((full.vae_cfg.hop_length * 20, 2), np.float32)
    codes = quant.audio_to_codes(audio)
    assert codes.startswith("<|audio_code_")


@pytest.mark.slow
def test_fp8_weight_only_roundtrip():
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    q = quantize_tree(params, "fp8_weight_only")
    node = q["decoder"]["layers"]["self_attn"]["q_proj"]["w"]
    assert FP8_KEY in node and node[FP8_KEY].dtype == jnp.float8_e4m3fn
    assert not isinstance(q["tokenizer"]["audio_acoustic_proj"]["w"], dict)

    deq = dequantize_params(q, jnp.float32)
    w0 = np.asarray(params["decoder"]["layers"]["self_attn"]["q_proj"]["w"])
    w1 = np.asarray(deq["decoder"]["layers"]["self_attn"]["q_proj"]["w"])
    rel = np.abs(w0 - w1).max() / np.abs(w0).max()
    assert rel < 0.08
    assert quantized_bytes(q) < quantized_bytes(params)


@pytest.mark.slow
def test_w8a8_matmul_matches_dense():
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (32, 48), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32), jnp.float32)
    q = quantize_tree({"layer": {"w": w}}, "w8a8_dynamic")
    node = q["layer"]["w"]
    assert W8A8_KEY in node and node[W8A8_KEY].dtype == jnp.int8
    # w8a8 nodes survive default dequantize (consumed by ops.basic.linear)
    assert isinstance(dequantize_params(q)["layer"]["w"], dict)
    # ... but materialize for LoRA merging
    assert dequantize_params(q, materialize_w8a8=True)["layer"]["w"].ndim == 2

    y_ref = x @ w
    y_q = w8a8_matmul(x, node)
    rel = np.abs(np.asarray(y_q, np.float32) - np.asarray(y_ref)).max() / (
        np.abs(np.asarray(y_ref)).max() + 1e-9)
    assert rel < 0.05


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["fp8", "w8a8"])
def test_quantized_generation_modes_run(mode):
    from acestep_tpu.pipeline.handler import AceStepHandler

    kw = dict(dit_config=DiTConfig.tiny(fsq_dim=64),
              vae_config=VAEConfig.tiny(decoder_input_channels=64),
              dtype=jnp.float32, frame_bucket=20, min_frames=20,
              refer_frames=10)
    full = AceStepHandler(**kw)
    full.initialize_service(seed=0)
    quant = AceStepHandler(**kw)
    quant.initialize_service(seed=0, quantization=mode)

    gen_kw = dict(audio_duration=0.8, seeds=7, normalize=False)
    a = full.generate_music("song", "x", **gen_kw)
    b = quant.generate_music("song", "x", **gen_kw)
    assert np.all(np.isfinite(b.pred_latents))
    corr = np.corrcoef(a.pred_latents.ravel(), b.pred_latents.ravel())[0, 1]
    assert corr > 0.90


def test_unknown_quantization_rejected():
    from acestep_tpu.pipeline.handler import AceStepHandler

    h = AceStepHandler(dit_config=DiTConfig.tiny(fsq_dim=64),
                       vae_config=VAEConfig.tiny(decoder_input_channels=64))
    with pytest.raises(ValueError):
        h.initialize_service(quantization="fp4")


@pytest.mark.slow
def test_int4_groupwise_roundtrip():
    """int4 nodes store two weights per byte with per-(group, out-channel)
    scales; dequant error is bounded by half a quantization step per
    group, and the packed bytes are half the int8 footprint."""
    from acestep_tpu.ops.quant import (
        INT4_KEY, dequantize_params, quantize_tree, quantized_bytes)

    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (3, 256, 64)) * 0.05   # stacked-layer leaf
    tree = {"layers": {"attn": {"w": w}}}
    q4 = quantize_tree(tree, "int4", exclude_prefixes=())
    node = q4["layers"]["attn"]["w"]
    assert INT4_KEY in node
    assert node[INT4_KEY].shape == (3, 128, 64)       # fin/2 packed rows
    assert node[INT4_KEY].dtype == jnp.uint8
    assert node["scale"].shape == (3, 2, 64)          # fin/INT4_GROUP groups
    deq = dequantize_params(q4, jnp.float32)["layers"]["attn"]["w"]
    # per-element error <= scale/2; scale = group_amax/7
    amax = np.abs(np.asarray(w)).reshape(3, 2, 128, 64).max(axis=2)
    bound = (amax / 7.0) / 2.0 + 1e-6
    err = np.abs(np.asarray(deq) - np.asarray(w)).reshape(3, 2, 128, 64).max(axis=2)
    assert (err <= bound).all(), (err.max(), bound.min())
    q8 = quantize_tree(tree, "int8", exclude_prefixes=())
    assert quantized_bytes(q4) < 0.6 * quantized_bytes(q8)


def test_int4_fallback_when_ungroupable():
    """in-features not divisible by the group size fall back to int8."""
    from acestep_tpu.ops.quant import INT4_KEY, QUANT_KEY, quantize_tree

    tree = {"w": jax.random.normal(jax.random.PRNGKey(1), (96, 32))}
    node = quantize_tree(tree, "int4", exclude_prefixes=())["w"]
    assert QUANT_KEY in node and INT4_KEY not in node


def test_int4_lm_generates():
    """End-to-end tiny LM under int4 weight-only quantization."""
    from acestep_tpu.llm.handler import LLMHandler

    h = LLMHandler(dtype=jnp.float32)
    h.initialize(num_fallback_codes=64, seed=0, quantization="int4")
    codes = h.engine.generate_codes(["make music"], n_codes=8, seed=0)
    assert len(codes[0]) == 8
