"""End-to-end numerical parity against the REAL reference torch model.

Instantiates the reference's AceStepDiTModel (torch, random weights, tiny
geometry) straight from /root/reference, converts its state_dict through
our checkpoint converter helpers, and compares full decoder forwards.
This validates both the weight-name mapping and the JAX decoder numerics
against the actual upstream implementation — not a re-typed copy of it.

Skipped when the reference checkout is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/acestep/models/turbo"

# slow tier: every test instantiates the real torch reference model
pytestmark = [pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                 reason="reference repo not mounted"),
              pytest.mark.slow]


@pytest.fixture(scope="module")
def ref_modeling():
    import torch

    # the FSQ dependency isn't installed and isn't needed for the decoder
    if "vector_quantize_pytorch" not in sys.modules:
        stub = types.ModuleType("vector_quantize_pytorch")

        class ResidualFSQ(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        stub.ResidualFSQ = ResidualFSQ
        sys.modules["vector_quantize_pytorch"] = stub
    sys.path.insert(0, REF_DIR)
    try:
        import configuration_acestep_v15 as ref_cfg_mod
        import modeling_acestep_v15_turbo as ref_mod
    finally:
        sys.path.remove(REF_DIR)
    return ref_cfg_mod, ref_mod


TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    patch_size=2,
    in_channels=192,
    audio_acoustic_hidden_dim=64,
    sliding_window=8,
    layer_types=["sliding_attention", "full_attention"],
    rope_theta=1_000_000.0,
)


def test_dit_decoder_forward_matches_reference(ref_modeling):
    import torch

    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig
    from acestep_tpu.models.dit import dit_decoder
    from acestep_tpu.utils.checkpoint import (
        _Src, _dit_layer, _stack_layers, _timestep_embedding)

    ref_cfg_mod, ref_mod = ref_modeling
    torch.manual_seed(0)
    ref_config = ref_cfg_mod.AceStepConfig(**TINY)
    ref_config._attn_implementation = "eager"
    model = ref_mod.AceStepDiTModel(ref_config).eval()

    # --- convert the live state dict through our converter helpers
    state = {f"decoder.{k}": v.detach().numpy()
             for k, v in model.state_dict().items()}
    src = _Src(state, jnp.float32)
    decoder = {
        "layers": _stack_layers(
            TINY["num_hidden_layers"],
            lambda i: _dit_layer(src, f"decoder.layers.{i}")),
        "proj_in": src.conv1d("decoder.proj_in.1"),
        "time_embed": _timestep_embedding(src, "decoder.time_embed"),
        "time_embed_r": _timestep_embedding(src, "decoder.time_embed_r"),
        "condition_embedder": src.linear("decoder.condition_embedder"),
        "norm_out": src.norm("decoder.norm_out"),
        "proj_out": src.conv1d_transpose("decoder.proj_out.1"),
        "scale_shift_table": src.tensor("decoder.scale_shift_table",
                                        squeeze=(0,)),
    }
    leftover = [n for n in src.unused() if "rotary" not in n]
    assert not leftover, f"unconverted reference tensors: {leftover}"

    cfg = DiTConfig.tiny(
        sliding_window=TINY["sliding_window"],
        layer_types=tuple(TINY["layer_types"]),
        attention_impl="dense",
    )

    # --- identical inputs both sides
    rng = np.random.default_rng(0)
    B, T, Lc = 2, 10, 7
    xt = rng.standard_normal((B, T, 64)).astype(np.float32)
    ctx = rng.standard_normal((B, T, 128)).astype(np.float32)
    enc = rng.standard_normal((B, Lc, 64)).astype(np.float32)
    t = np.asarray([0.7, 0.3], np.float32)

    with torch.no_grad():
        ref_out = model(
            hidden_states=torch.from_numpy(xt),
            timestep=torch.from_numpy(t),
            timestep_r=torch.from_numpy(t),
            attention_mask=torch.ones(B, T),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.ones(B, Lc),
            context_latents=torch.from_numpy(ctx),
            use_cache=False,
        )
    ref_np = (ref_out[0] if isinstance(ref_out, (tuple, list))
              else ref_out).numpy()

    ours = dit_decoder({"decoder": decoder}, cfg,
                       jnp.asarray(xt), jnp.asarray(t), jnp.asarray(t),
                       jnp.asarray(ctx), encoder_hidden_states=jnp.asarray(enc))
    ours_np = np.asarray(ours)

    assert ours_np.shape == ref_np.shape
    np.testing.assert_allclose(ours_np, ref_np, rtol=2e-4, atol=2e-4)


def test_dit_decoder_sliding_window_matches_reference(ref_modeling):
    """Long enough sequence that the sliding-window layer actually masks."""
    import torch

    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig
    from acestep_tpu.models.dit import dit_decoder
    from acestep_tpu.utils.checkpoint import (
        _Src, _dit_layer, _stack_layers, _timestep_embedding)

    ref_cfg_mod, ref_mod = ref_modeling
    torch.manual_seed(1)
    ref_config = ref_cfg_mod.AceStepConfig(**TINY)
    ref_config._attn_implementation = "eager"
    model = ref_mod.AceStepDiTModel(ref_config).eval()

    state = {f"decoder.{k}": v.detach().numpy()
             for k, v in model.state_dict().items()}
    src = _Src(state, jnp.float32)
    decoder = {
        "layers": _stack_layers(
            TINY["num_hidden_layers"],
            lambda i: _dit_layer(src, f"decoder.layers.{i}")),
        "proj_in": src.conv1d("decoder.proj_in.1"),
        "time_embed": _timestep_embedding(src, "decoder.time_embed"),
        "time_embed_r": _timestep_embedding(src, "decoder.time_embed_r"),
        "condition_embedder": src.linear("decoder.condition_embedder"),
        "norm_out": src.norm("decoder.norm_out"),
        "proj_out": src.conv1d_transpose("decoder.proj_out.1"),
        "scale_shift_table": src.tensor("decoder.scale_shift_table",
                                        squeeze=(0,)),
    }
    cfg = DiTConfig.tiny(sliding_window=TINY["sliding_window"],
                         layer_types=tuple(TINY["layer_types"]),
                         attention_impl="dense")

    rng = np.random.default_rng(1)
    B, T, Lc = 1, 64, 5          # 32 patches > window 8: band masking active
    xt = rng.standard_normal((B, T, 64)).astype(np.float32)
    ctx = rng.standard_normal((B, T, 128)).astype(np.float32)
    enc = rng.standard_normal((B, Lc, 64)).astype(np.float32)
    t = np.asarray([0.5], np.float32)

    with torch.no_grad():
        ref_out = model(
            hidden_states=torch.from_numpy(xt),
            timestep=torch.from_numpy(t),
            timestep_r=torch.from_numpy(t),
            attention_mask=torch.ones(B, T),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.ones(B, Lc),
            context_latents=torch.from_numpy(ctx),
            use_cache=False,
        )
    ref_np = (ref_out[0] if isinstance(ref_out, (tuple, list))
              else ref_out).numpy()
    ours = np.asarray(dit_decoder(
        {"decoder": decoder}, cfg, jnp.asarray(xt), jnp.asarray(t),
        jnp.asarray(t), jnp.asarray(ctx),
        encoder_hidden_states=jnp.asarray(enc)))
    np.testing.assert_allclose(ours, ref_np, rtol=5e-4, atol=5e-4)


def test_lm_forward_matches_transformers_qwen3():
    """Our Qwen3 trunk vs the real transformers implementation (tiny random
    weights converted through convert_lm_state)."""
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    import jax.numpy as jnp

    from acestep_tpu.config import LMConfig
    from acestep_tpu.models.lm import KVCache, lm_forward, lm_logits
    from acestep_tpu.utils.checkpoint import convert_lm_state

    cfg = LMConfig.tiny(vocab_size=97)
    hf_cfg = Qwen3Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=True,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(hf_cfg).eval()

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_lm_state(state, cfg, dtype=jnp.float32)

    ids = np.asarray([[3, 17, 42, 8, 55, 6]], np.int32)
    with torch.no_grad():
        ref_logits = model(torch.from_numpy(ids).long()).logits.numpy()

    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    hidden, _ = lm_forward(params, cfg, jnp.asarray(ids), cache,
                           start_pos=jnp.zeros((), jnp.int32))
    ours = np.asarray(lm_logits(params, cfg, hidden))
    np.testing.assert_allclose(ours, ref_logits, rtol=3e-4, atol=3e-4)


def test_condition_encoder_functionally_matches_reference(ref_modeling):
    """Our fixed-layout packing vs the reference's sorted pack_sequences:
    the packed sets must be equivalent under (maskless) cross-attention —
    exactly how the DiT consumes them (it drops padding masks, ref
    modeling_acestep_v15_turbo.py:1379-1382)."""
    import torch

    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig
    from acestep_tpu.models.dit import condition_encoder
    from acestep_tpu.utils.checkpoint import _Src, _encoder_stack

    ref_cfg_mod, ref_mod = ref_modeling
    tiny = dict(TINY)
    tiny.update(text_hidden_dim=32, timbre_hidden_dim=64,
                num_lyric_encoder_hidden_layers=2,
                num_timbre_encoder_hidden_layers=2)
    torch.manual_seed(2)
    ref_config = ref_cfg_mod.AceStepConfig(**tiny)
    ref_config._attn_implementation = "eager"
    ref_enc = ref_mod.AceStepConditionEncoder(ref_config).eval()

    state = {f"encoder.{k}": v.detach().numpy()
             for k, v in ref_enc.state_dict().items()}
    src = _Src(state, jnp.float32)
    encoder = {
        "text_projector": src.linear("encoder.text_projector"),
        "lyric_encoder": _encoder_stack(
            src, "encoder.lyric_encoder",
            tiny["num_lyric_encoder_hidden_layers"]),
        "timbre_encoder": {
            **_encoder_stack(src, "encoder.timbre_encoder",
                             tiny["num_timbre_encoder_hidden_layers"]),
            "special_token": src.tensor("encoder.timbre_encoder.special_token"),
        },
    }
    leftover = [n for n in src.unused() if "rotary" not in n]
    assert not leftover, f"unconverted: {leftover}"

    cfg = DiTConfig.tiny(text_hidden_dim=32,
                         num_lyric_encoder_hidden_layers=2,
                         num_timbre_encoder_hidden_layers=2,
                         attention_impl="dense")

    rng = np.random.default_rng(2)
    B, Lt, Ll, Lr = 2, 4, 6, 10   # Lr = 2 * pool_window_size(5)
    text_h = rng.standard_normal((B, Lt, 32)).astype(np.float32)
    text_m = np.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], np.int32)
    lyric_h = rng.standard_normal((B, Ll, 32)).astype(np.float32)
    lyric_m = np.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int32)
    refer = rng.standard_normal((B, Lr, 64)).astype(np.float32)
    order = np.asarray([0, 1], np.int32)

    with torch.no_grad():
        ref_out, ref_mask = ref_enc(
            text_hidden_states=torch.from_numpy(text_h),
            text_attention_mask=torch.from_numpy(text_m),
            lyric_hidden_states=torch.from_numpy(lyric_h),
            lyric_attention_mask=torch.from_numpy(lyric_m),
            refer_audio_acoustic_hidden_states_packed=torch.from_numpy(refer),
            refer_audio_order_mask=torch.from_numpy(order),
        )
    import jax

    with jax.default_matmul_precision("float32"):
        ours, ours_mask = condition_encoder(
            {"encoder": encoder}, cfg,
            text_hidden_states=jnp.asarray(text_h),
            text_attention_mask=jnp.asarray(text_m),
            lyric_hidden_states=jnp.asarray(lyric_h),
            lyric_attention_mask=jnp.asarray(lyric_m),
            refer_audio_packed=jnp.asarray(refer),
            refer_order_mask=jnp.asarray(order),
            max_refer_count=1,
        )
    ref_np, ours_np = ref_out.numpy(), np.asarray(ours)

    # identical packed length and per-row valid counts — the reference DiT
    # attends maskless over the WHOLE packed sequence, so totals must match
    assert ours_np.shape == ref_np.shape
    assert (np.asarray(ours_mask).sum(1) == ref_mask.numpy().sum(1)).all()

    # full-multiset equality (sorted rows): our fixed-layout concat is the
    # reference's sorted packing under a permutation
    for b in range(B):
        ra = ref_np[b][np.lexsort(ref_np[b].T)]
        oa = ours_np[b][np.lexsort(ours_np[b].T)]
        np.testing.assert_allclose(oa, ra, rtol=2e-3, atol=2e-3)

    # functional equivalence under maskless softmax cross-attention (how
    # the decoder consumes the packed sequence)
    q = rng.standard_normal((3, ref_np.shape[-1])).astype(np.float32)
    for b in range(B):
        lo = q @ ours_np[b].T
        lr = q @ ref_np[b].T
        ao = (np.exp(lo - lo.max(1, keepdims=True)) /
              np.exp(lo - lo.max(1, keepdims=True)).sum(1, keepdims=True)
              ) @ ours_np[b]
        ar = (np.exp(lr - lr.max(1, keepdims=True)) /
              np.exp(lr - lr.max(1, keepdims=True)).sum(1, keepdims=True)
              ) @ ref_np[b]
        np.testing.assert_allclose(ao, ar, rtol=2e-3, atol=2e-3)


def test_turbo_trajectory_matches_reference_generate_audio(ref_modeling):
    """Full 8-step ODE trajectory parity: the reference's generate_audio
    (real torch top model, random weights, precomputed LM hints so the
    FSQ dependency stays unused) vs our prepare_condition + sample_turbo,
    fed the exact same noise via the seed bridge."""
    import torch

    import jax
    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig
    from acestep_tpu.models.dit import prepare_condition
    from acestep_tpu.models.sampler import (
        ConditionSet, build_turbo_schedule, sample_turbo)
    from acestep_tpu.utils.checkpoint import convert_dit_state

    ref_cfg_mod, ref_mod = ref_modeling
    tiny = dict(TINY)
    tiny.update(text_hidden_dim=32, timbre_hidden_dim=64,
                num_lyric_encoder_hidden_layers=2,
                num_timbre_encoder_hidden_layers=1,
                num_attention_pooler_hidden_layers=1,
                fsq_dim=64)
    torch.manual_seed(3)
    ref_config = ref_cfg_mod.AceStepConfig(**tiny)
    ref_config._attn_implementation = "eager"
    model = ref_mod.AceStepConditionGenerationModel(ref_config).eval()

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # the FSQ stub holds no params; its two projections are unused under
    # precomputed hints — synthesize zeros so the converter stays strict
    state.setdefault("tokenizer.quantizer.layers.0.project_in.weight",
                     np.zeros((6, tiny["fsq_dim"]), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_in.bias",
                     np.zeros((6,), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.weight",
                     np.zeros((tiny["fsq_dim"], 6), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.bias",
                     np.zeros((tiny["fsq_dim"],), np.float32))
    cfg = DiTConfig.tiny(
        text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
        num_timbre_encoder_hidden_layers=1,
        num_attention_pooler_hidden_layers=1, fsq_dim=64,
        sliding_window=TINY["sliding_window"],
        layer_types=tuple(TINY["layer_types"]),
        attention_impl="dense")
    params = convert_dit_state(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    B, T, Lt, Ll = 1, 20, 4, 6
    text_h = rng.standard_normal((B, Lt, 32)).astype(np.float32)
    text_m = np.ones((B, Lt), np.int32)
    lyric_h = rng.standard_normal((B, Ll, 32)).astype(np.float32)
    lyric_m = np.ones((B, Ll), np.int32)
    refer = rng.standard_normal((B, 10, 64)).astype(np.float32)
    order = np.arange(B, dtype=np.int32)
    src = np.zeros((B, T, 64), np.float32)
    chunk = np.ones((B, T, 64), np.float32)
    hints = rng.standard_normal((B, T, 64)).astype(np.float32)

    torch_kw = dict(
        text_hidden_states=torch.from_numpy(text_h),
        text_attention_mask=torch.from_numpy(text_m),
        lyric_hidden_states=torch.from_numpy(lyric_h),
        lyric_attention_mask=torch.from_numpy(lyric_m),
        refer_audio_acoustic_hidden_states_packed=torch.from_numpy(refer),
        refer_audio_order_mask=torch.from_numpy(order).long(),
        src_latents=torch.from_numpy(src),
        chunk_masks=torch.from_numpy(chunk),
        is_covers=torch.zeros(B),
        precomputed_lm_hints_25Hz=torch.from_numpy(hints),
        silence_latent=torch.zeros(1, T, 64),
        attention_mask=torch.ones(B, T),
    )
    with torch.no_grad():
        ref_out = model.generate_audio(seed=5, fix_nfe=8, infer_method="ode",
                                       shift=3.0, **torch_kw)
        noise = model.prepare_noise(
            torch.cat([torch.from_numpy(src), torch.from_numpy(chunk)],
                      dim=-1), seed=5).numpy()
    ref_np = ref_out["target_latents"].numpy()

    with jax.default_matmul_precision("float32"):
        enc, _m, ctx = prepare_condition(
            params, cfg,
            text_hidden_states=jnp.asarray(text_h),
            text_attention_mask=jnp.asarray(text_m),
            lyric_hidden_states=jnp.asarray(lyric_h),
            lyric_attention_mask=jnp.asarray(lyric_m),
            refer_audio_packed=jnp.asarray(refer),
            refer_order_mask=jnp.asarray(order),
            src_latents=jnp.asarray(src),
            chunk_masks=jnp.asarray(chunk),
            is_covers=jnp.zeros((B,), jnp.int32),
            precomputed_lm_hints_25hz=jnp.asarray(hints),
        )
        cond = ConditionSet.build(params, cfg, enc, ctx)
        ours = sample_turbo(params, cfg, x_init=jnp.asarray(noise),
                            schedule=tuple(build_turbo_schedule(3.0)),
                            cond=cond, infer_method="ode")
    ours_np = np.asarray(ours)
    assert ours_np.shape == ref_np.shape
    np.testing.assert_allclose(ours_np, ref_np, rtol=5e-3, atol=5e-3)


def test_base_cfg_apg_trajectory_matches_reference():
    """Base-model 6-step continuous-schedule trajectory with CFG + APG
    guidance (momentum buffer carried across steps) vs the real reference
    base model — the 'APG numerics' hard part from the build plan."""
    import torch

    import jax
    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig
    from acestep_tpu.models.dit import prepare_condition
    from acestep_tpu.models.sampler import (
        ConditionSet, build_continuous_schedule, sample_guided)
    from acestep_tpu.utils.checkpoint import convert_dit_state

    base_dir = "/root/reference/acestep/models/base"
    if "vector_quantize_pytorch" not in sys.modules:
        stub = types.ModuleType("vector_quantize_pytorch")

        class ResidualFSQ(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        stub.ResidualFSQ = ResidualFSQ
        sys.modules["vector_quantize_pytorch"] = stub
    sys.path.insert(0, base_dir)
    try:
        import configuration_acestep_v15 as ref_cfg_mod
        import modeling_acestep_v15_base as ref_mod
    finally:
        sys.path.remove(base_dir)

    tiny = dict(TINY)
    tiny.update(text_hidden_dim=32, timbre_hidden_dim=64,
                num_lyric_encoder_hidden_layers=2,
                num_timbre_encoder_hidden_layers=1,
                num_attention_pooler_hidden_layers=1, fsq_dim=64)
    torch.manual_seed(4)
    ref_config = ref_cfg_mod.AceStepConfig(**tiny)
    ref_config._attn_implementation = "eager"
    model = ref_mod.AceStepConditionGenerationModel(ref_config).eval()

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    state.setdefault("tokenizer.quantizer.layers.0.project_in.weight",
                     np.zeros((6, 64), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_in.bias",
                     np.zeros((6,), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.weight",
                     np.zeros((64, 6), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.bias",
                     np.zeros((64,), np.float32))
    cfg = DiTConfig.tiny(
        text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
        num_timbre_encoder_hidden_layers=1,
        num_attention_pooler_hidden_layers=1, fsq_dim=64,
        sliding_window=TINY["sliding_window"],
        layer_types=tuple(TINY["layer_types"]),
        attention_impl="dense", model_version="base")
    params = convert_dit_state(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(4)
    B, T = 1, 20
    text_h = rng.standard_normal((B, 4, 32)).astype(np.float32)
    lyric_h = rng.standard_normal((B, 6, 32)).astype(np.float32)
    refer = rng.standard_normal((B, 10, 64)).astype(np.float32)
    src = np.zeros((B, T, 64), np.float32)
    chunk = np.ones((B, T, 64), np.float32)
    hints = rng.standard_normal((B, T, 64)).astype(np.float32)
    steps, gscale, shift = 6, 4.0, 1.0

    with torch.no_grad():
        ref_out = model.generate_audio(
            text_hidden_states=torch.from_numpy(text_h),
            text_attention_mask=torch.ones(B, 4),
            lyric_hidden_states=torch.from_numpy(lyric_h),
            lyric_attention_mask=torch.ones(B, 6),
            refer_audio_acoustic_hidden_states_packed=torch.from_numpy(refer),
            refer_audio_order_mask=torch.arange(B).long(),
            src_latents=torch.from_numpy(src),
            chunk_masks=torch.from_numpy(chunk),
            is_covers=torch.zeros(B),
            precomputed_lm_hints_25Hz=torch.from_numpy(hints),
            silence_latent=torch.zeros(1, T, 64),
            seed=9, infer_steps=steps, diffusion_guidance_sale=gscale,
            infer_method="ode", shift=shift, use_progress_bar=False,
        )
        noise = model.prepare_noise(
            torch.cat([torch.from_numpy(src), torch.from_numpy(chunk)],
                      dim=-1), seed=9).numpy()
    ref_np = ref_out["target_latents"].numpy()

    with jax.default_matmul_precision("float32"):
        enc, _m, ctx = prepare_condition(
            params, cfg,
            text_hidden_states=jnp.asarray(text_h),
            text_attention_mask=jnp.ones((B, 4), jnp.int32),
            lyric_hidden_states=jnp.asarray(lyric_h),
            lyric_attention_mask=jnp.ones((B, 6), jnp.int32),
            refer_audio_packed=jnp.asarray(refer),
            refer_order_mask=jnp.arange(B, dtype=jnp.int32),
            src_latents=jnp.asarray(src),
            chunk_masks=jnp.asarray(chunk),
            is_covers=jnp.zeros((B,), jnp.int32),
            precomputed_lm_hints_25hz=jnp.asarray(hints),
        )
        cond = ConditionSet.build(params, cfg, enc, ctx)
        null = jnp.broadcast_to(
            params["null_condition_emb"].astype(enc.dtype), enc.shape)
        null_cond = ConditionSet.build(params, cfg, null, ctx)
        ours = sample_guided(
            params, cfg, x_init=jnp.asarray(noise),
            schedule=build_continuous_schedule(steps, shift=shift),
            cond=cond, null_cond=null_cond, guidance_scale=gscale,
            cfg_interval=(0.0, 1.0), use_adg=False, infer_method="ode")
    ours_np = np.asarray(ours)
    assert ours_np.shape == ref_np.shape
    np.testing.assert_allclose(ours_np, ref_np, rtol=5e-3, atol=5e-3)


def test_turbo_cover_noise_trajectory_matches_reference(ref_modeling):
    """Cover mode: is_covers=1 (hints replace src in context), trajectory
    starts from renoised src at the truncated schedule point
    (cover_noise_strength semantics, ref turbo :1921-1936)."""
    import torch

    import jax
    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig
    from acestep_tpu.models.dit import prepare_condition
    from acestep_tpu.models.sampler import (
        ConditionSet, build_turbo_schedule, renoise, sample_turbo,
        truncate_for_cover_noise)
    from acestep_tpu.utils.checkpoint import convert_dit_state

    ref_cfg_mod, ref_mod = ref_modeling
    tiny = dict(TINY)
    tiny.update(text_hidden_dim=32, timbre_hidden_dim=64,
                num_lyric_encoder_hidden_layers=2,
                num_timbre_encoder_hidden_layers=1,
                num_attention_pooler_hidden_layers=1, fsq_dim=64)
    torch.manual_seed(6)
    ref_config = ref_cfg_mod.AceStepConfig(**tiny)
    ref_config._attn_implementation = "eager"
    model = ref_mod.AceStepConditionGenerationModel(ref_config).eval()

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    state.setdefault("tokenizer.quantizer.layers.0.project_in.weight",
                     np.zeros((6, 64), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_in.bias",
                     np.zeros((6,), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.weight",
                     np.zeros((64, 6), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.bias",
                     np.zeros((64,), np.float32))
    cfg = DiTConfig.tiny(
        text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
        num_timbre_encoder_hidden_layers=1,
        num_attention_pooler_hidden_layers=1, fsq_dim=64,
        sliding_window=TINY["sliding_window"],
        layer_types=tuple(TINY["layer_types"]), attention_impl="dense")
    params = convert_dit_state(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(6)
    B, T = 1, 20
    text_h = rng.standard_normal((B, 4, 32)).astype(np.float32)
    lyric_h = rng.standard_normal((B, 6, 32)).astype(np.float32)
    refer = rng.standard_normal((B, 10, 64)).astype(np.float32)
    src = rng.standard_normal((B, T, 64)).astype(np.float32)
    chunk = np.ones((B, T, 64), np.float32)
    hints = rng.standard_normal((B, T, 64)).astype(np.float32)
    strength = 0.5

    with torch.no_grad():
        ref_out = model.generate_audio(
            text_hidden_states=torch.from_numpy(text_h),
            text_attention_mask=torch.ones(B, 4),
            lyric_hidden_states=torch.from_numpy(lyric_h),
            lyric_attention_mask=torch.ones(B, 6),
            refer_audio_acoustic_hidden_states_packed=torch.from_numpy(refer),
            refer_audio_order_mask=torch.arange(B).long(),
            src_latents=torch.from_numpy(src),
            chunk_masks=torch.from_numpy(chunk),
            is_covers=torch.ones(B),
            precomputed_lm_hints_25Hz=torch.from_numpy(hints),
            silence_latent=torch.zeros(1, T, 64),
            seed=11, fix_nfe=8, infer_method="ode", shift=3.0,
            cover_noise_strength=strength,
        )
        noise = model.prepare_noise(
            torch.cat([torch.from_numpy(src), torch.from_numpy(chunk)],
                      dim=-1), seed=11).numpy()
    ref_np = ref_out["target_latents"].numpy()

    with jax.default_matmul_precision("float32"):
        enc, _m, ctx = prepare_condition(
            params, cfg,
            text_hidden_states=jnp.asarray(text_h),
            text_attention_mask=jnp.ones((B, 4), jnp.int32),
            lyric_hidden_states=jnp.asarray(lyric_h),
            lyric_attention_mask=jnp.ones((B, 6), jnp.int32),
            refer_audio_packed=jnp.asarray(refer),
            refer_order_mask=jnp.arange(B, dtype=jnp.int32),
            src_latents=jnp.asarray(src),
            chunk_masks=jnp.asarray(chunk),
            is_covers=jnp.ones((B,), jnp.int32),
            precomputed_lm_hints_25hz=jnp.asarray(hints),
        )
        cond = ConditionSet.build(params, cfg, enc, ctx)
        schedule, start_t = truncate_for_cover_noise(
            build_turbo_schedule(3.0), strength)
        x_init = renoise(jnp.asarray(src), jnp.asarray(start_t),
                         jnp.asarray(noise))
        ours = sample_turbo(params, cfg, x_init=x_init,
                            schedule=tuple(schedule), cond=cond,
                            infer_method="ode")
    ours_np = np.asarray(ours)
    np.testing.assert_allclose(ours_np, ref_np, rtol=5e-3, atol=5e-3)


def test_sft_custom_timesteps_adg_trajectory_matches_reference():
    """SFT-model trajectory with CUSTOM timesteps + ADG guidance vs the real
    reference sft model (its one difference from base is the timesteps
    parameter, ref models/sft/modeling_acestep_v15_base.py:1811,1864-1875).
    Closes the last sampler-family parity gap (turbo/base covered above)."""
    import torch

    import jax
    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig
    from acestep_tpu.models.dit import prepare_condition
    from acestep_tpu.models.sampler import ConditionSet, sample_guided
    from acestep_tpu.utils.checkpoint import convert_dit_state

    sft_dir = "/root/reference/acestep/models/sft"
    if "vector_quantize_pytorch" not in sys.modules:
        stub = types.ModuleType("vector_quantize_pytorch")

        class ResidualFSQ(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        stub.ResidualFSQ = ResidualFSQ
        sys.modules["vector_quantize_pytorch"] = stub
    # the sft package reuses base module names: import under unique names
    import importlib.util

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    sys.path.insert(0, sft_dir)
    try:
        ref_cfg_mod = load("sft_configuration_acestep_v15",
                           os.path.join(sft_dir, "configuration_acestep_v15.py"))
        ref_mod = load("sft_modeling_acestep_v15_base",
                       os.path.join(sft_dir, "modeling_acestep_v15_base.py"))
    finally:
        sys.path.remove(sft_dir)

    tiny = dict(TINY)
    tiny.update(text_hidden_dim=32, timbre_hidden_dim=64,
                num_lyric_encoder_hidden_layers=2,
                num_timbre_encoder_hidden_layers=1,
                num_attention_pooler_hidden_layers=1, fsq_dim=64)
    torch.manual_seed(11)
    ref_config = ref_cfg_mod.AceStepConfig(**tiny)
    ref_config._attn_implementation = "eager"
    model = ref_mod.AceStepConditionGenerationModel(ref_config).eval()

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    state.setdefault("tokenizer.quantizer.layers.0.project_in.weight",
                     np.zeros((6, 64), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_in.bias",
                     np.zeros((6,), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.weight",
                     np.zeros((64, 6), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.bias",
                     np.zeros((64,), np.float32))
    cfg = DiTConfig.tiny(
        text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
        num_timbre_encoder_hidden_layers=1,
        num_attention_pooler_hidden_layers=1, fsq_dim=64,
        sliding_window=TINY["sliding_window"],
        layer_types=tuple(TINY["layer_types"]),
        attention_impl="dense", model_version="sft")
    params = convert_dit_state(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(11)
    B, T = 1, 20
    text_h = rng.standard_normal((B, 4, 32)).astype(np.float32)
    lyric_h = rng.standard_normal((B, 6, 32)).astype(np.float32)
    refer = rng.standard_normal((B, 10, 64)).astype(np.float32)
    src = np.zeros((B, T, 64), np.float32)
    chunk = np.ones((B, T, 64), np.float32)
    hints = rng.standard_normal((B, T, 64)).astype(np.float32)
    gscale = 3.5
    schedule = [0.97, 0.76, 0.5, 0.28, 0.085, 0.0]

    with torch.no_grad():
        ref_out = model.generate_audio(
            text_hidden_states=torch.from_numpy(text_h),
            text_attention_mask=torch.ones(B, 4),
            lyric_hidden_states=torch.from_numpy(lyric_h),
            lyric_attention_mask=torch.ones(B, 6),
            refer_audio_acoustic_hidden_states_packed=torch.from_numpy(refer),
            refer_audio_order_mask=torch.arange(B).long(),
            src_latents=torch.from_numpy(src),
            chunk_masks=torch.from_numpy(chunk),
            is_covers=torch.zeros(B),
            precomputed_lm_hints_25Hz=torch.from_numpy(hints),
            silence_latent=torch.zeros(1, T, 64),
            seed=13, diffusion_guidance_sale=gscale,
            infer_method="ode", use_adg=True,
            timesteps=torch.tensor(schedule, dtype=torch.float32),
            use_progress_bar=False,
        )
        noise = model.prepare_noise(
            torch.cat([torch.from_numpy(src), torch.from_numpy(chunk)],
                      dim=-1), seed=13).numpy()
    ref_np = ref_out["target_latents"].numpy()

    with jax.default_matmul_precision("float32"):
        enc, _m, ctx = prepare_condition(
            params, cfg,
            text_hidden_states=jnp.asarray(text_h),
            text_attention_mask=jnp.ones((B, 4), jnp.int32),
            lyric_hidden_states=jnp.asarray(lyric_h),
            lyric_attention_mask=jnp.ones((B, 6), jnp.int32),
            refer_audio_packed=jnp.asarray(refer),
            refer_order_mask=jnp.arange(B, dtype=jnp.int32),
            src_latents=jnp.asarray(src),
            chunk_masks=jnp.asarray(chunk),
            is_covers=jnp.zeros((B,), jnp.int32),
            precomputed_lm_hints_25hz=jnp.asarray(hints),
        )
        cond = ConditionSet.build(params, cfg, enc, ctx)
        null = jnp.broadcast_to(
            params["null_condition_emb"].astype(enc.dtype), enc.shape)
        null_cond = ConditionSet.build(params, cfg, null, ctx)
        ours = sample_guided(
            params, cfg, x_init=jnp.asarray(noise),
            schedule=schedule,
            cond=cond, null_cond=null_cond, guidance_scale=gscale,
            cfg_interval=(0.0, 1.0), use_adg=True, infer_method="ode")
    ours_np = np.asarray(ours)
    assert ours_np.shape == ref_np.shape
    np.testing.assert_allclose(ours_np, ref_np, rtol=5e-3, atol=5e-3)


def test_base_sde_trajectory_matches_reference(monkeypatch):
    """Base-model SDE trajectory with shift=3: the reference renoises at
    the UNSHIFTED linear timestep 1-(i+1)/n (base :1972), not the shifted
    schedule value. Per-step noise is zeroed on both sides (the reference
    draws unseedable torch noise inside renoise), which makes the update
    deterministic and exposes exactly the renoise-timestep semantics."""
    import torch

    import jax
    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig
    from acestep_tpu.models.dit import prepare_condition
    from acestep_tpu.models.sampler import (
        ConditionSet, build_continuous_schedule, sample_guided)
    from acestep_tpu.utils.checkpoint import convert_dit_state

    base_dir = "/root/reference/acestep/models/base"
    if "vector_quantize_pytorch" not in sys.modules:
        stub = types.ModuleType("vector_quantize_pytorch")

        class ResidualFSQ(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        stub.ResidualFSQ = ResidualFSQ
        sys.modules["vector_quantize_pytorch"] = stub
    sys.path.insert(0, base_dir)
    try:
        import configuration_acestep_v15 as ref_cfg_mod
        import modeling_acestep_v15_base as ref_mod
    finally:
        sys.path.remove(base_dir)

    tiny = dict(TINY)
    tiny.update(text_hidden_dim=32, timbre_hidden_dim=64,
                num_lyric_encoder_hidden_layers=2,
                num_timbre_encoder_hidden_layers=1,
                num_attention_pooler_hidden_layers=1, fsq_dim=64)
    torch.manual_seed(11)
    ref_config = ref_cfg_mod.AceStepConfig(**tiny)
    ref_config._attn_implementation = "eager"
    model = ref_mod.AceStepConditionGenerationModel(ref_config).eval()

    # zero the per-step SDE noise (deterministic renoise on both sides)
    def zero_renoise(x, t, noise=None):
        if isinstance(t, torch.Tensor) and t.ndim != x.ndim:
            t = t.unsqueeze(-1).unsqueeze(-1)
        return (1 - t) * x

    monkeypatch.setattr(model, "renoise", zero_renoise)

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    state.setdefault("tokenizer.quantizer.layers.0.project_in.weight",
                     np.zeros((6, 64), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_in.bias",
                     np.zeros((6,), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.weight",
                     np.zeros((64, 6), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.bias",
                     np.zeros((64,), np.float32))
    cfg = DiTConfig.tiny(
        text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
        num_timbre_encoder_hidden_layers=1,
        num_attention_pooler_hidden_layers=1, fsq_dim=64,
        sliding_window=TINY["sliding_window"],
        layer_types=tuple(TINY["layer_types"]),
        attention_impl="dense", model_version="base")
    params = convert_dit_state(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(11)
    B, T = 1, 20
    text_h = rng.standard_normal((B, 4, 32)).astype(np.float32)
    lyric_h = rng.standard_normal((B, 6, 32)).astype(np.float32)
    refer = rng.standard_normal((B, 10, 64)).astype(np.float32)
    src = np.zeros((B, T, 64), np.float32)
    chunk = np.ones((B, T, 64), np.float32)
    hints = rng.standard_normal((B, T, 64)).astype(np.float32)
    steps, gscale, shift = 6, 4.0, 3.0      # shift != 1 is the point

    with torch.no_grad():
        ref_out = model.generate_audio(
            text_hidden_states=torch.from_numpy(text_h),
            text_attention_mask=torch.ones(B, 4),
            lyric_hidden_states=torch.from_numpy(lyric_h),
            lyric_attention_mask=torch.ones(B, 6),
            refer_audio_acoustic_hidden_states_packed=torch.from_numpy(refer),
            refer_audio_order_mask=torch.arange(B).long(),
            src_latents=torch.from_numpy(src),
            chunk_masks=torch.from_numpy(chunk),
            is_covers=torch.zeros(B),
            precomputed_lm_hints_25Hz=torch.from_numpy(hints),
            silence_latent=torch.zeros(1, T, 64),
            seed=13, infer_steps=steps, diffusion_guidance_sale=gscale,
            infer_method="sde", shift=shift, use_progress_bar=False,
        )
        noise = model.prepare_noise(
            torch.cat([torch.from_numpy(src), torch.from_numpy(chunk)],
                      dim=-1), seed=13).numpy()
    ref_np = ref_out["target_latents"].numpy()

    # zero our per-step SDE noise the same way
    real_normal = jax.random.normal
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape, dtype=None: jnp.zeros(
                            shape, dtype or jnp.float32))
    try:
        with jax.default_matmul_precision("float32"):
            enc, _m, ctx = prepare_condition(
                params, cfg,
                text_hidden_states=jnp.asarray(text_h),
                text_attention_mask=jnp.ones((B, 4), jnp.int32),
                lyric_hidden_states=jnp.asarray(lyric_h),
                lyric_attention_mask=jnp.ones((B, 6), jnp.int32),
                refer_audio_packed=jnp.asarray(refer),
                refer_order_mask=jnp.arange(B, dtype=jnp.int32),
                src_latents=jnp.asarray(src),
                chunk_masks=jnp.asarray(chunk),
                is_covers=jnp.zeros((B,), jnp.int32),
                precomputed_lm_hints_25hz=jnp.asarray(hints),
            )
            cond = ConditionSet.build(params, cfg, enc, ctx)
            null = jnp.broadcast_to(
                params["null_condition_emb"].astype(enc.dtype), enc.shape)
            null_cond = ConditionSet.build(params, cfg, null, ctx)
            ours = sample_guided(
                params, cfg, x_init=jnp.asarray(noise),
                schedule=build_continuous_schedule(steps, shift=shift),
                cond=cond, null_cond=null_cond, guidance_scale=gscale,
                cfg_interval=(0.0, 1.0), use_adg=False, infer_method="sde")
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    ours_np = np.asarray(ours)
    assert ours_np.shape == ref_np.shape
    np.testing.assert_allclose(ours_np, ref_np, rtol=5e-3, atol=5e-3)


# ------------------------------------------------------------------
# Full-module Oobleck VAE cross-check (VERDICT r3 item 4)
# ------------------------------------------------------------------


def _build_torch_oobleck(cfg, seed=0):
    """Hand-built torch AutoencoderOobleck per the in-repo spec
    (/root/reference/acestep/models/mlx/vae_model.py:24-336, which mirrors
    diffusers' torch module graph and state-dict naming exactly).

    Encoder convs use the legacy ``torch.nn.utils.weight_norm``
    (weight_g/weight_v keys); decoder convs use the parametrize-style API
    (parametrizations.weight.original0/1) — so one state dict exercises
    BOTH naming schemes handled by ``_fuse_weight_norm``."""
    import math as _math

    import torch
    from torch import nn

    wn_legacy = torch.nn.utils.weight_norm
    wn_param = torch.nn.utils.parametrizations.weight_norm

    class Snake1d(nn.Module):
        def __init__(self, dim):
            super().__init__()
            # diffusers stores (1, C, 1), logscale=True
            self.alpha = nn.Parameter(torch.randn(1, dim, 1) * 0.3)
            self.beta = nn.Parameter(torch.randn(1, dim, 1) * 0.3)

        def forward(self, x):                       # (B, C, L)
            alpha = torch.exp(self.alpha)
            beta = torch.exp(self.beta)
            return x + (beta + 1e-9).reciprocal() * torch.sin(alpha * x).pow(2)

    class ResUnit(nn.Module):
        def __init__(self, dim, dilation, wn):
            super().__init__()
            pad = ((7 - 1) * dilation) // 2
            self.snake1 = Snake1d(dim)
            self.conv1 = wn(nn.Conv1d(dim, dim, 7, dilation=dilation,
                                      padding=pad))
            self.snake2 = Snake1d(dim)
            self.conv2 = wn(nn.Conv1d(dim, dim, 1))

        def forward(self, x):
            y = self.conv1(self.snake1(x))
            y = self.conv2(self.snake2(y))
            pad = (x.shape[-1] - y.shape[-1]) // 2
            if pad > 0:
                x = x[..., pad:-pad]
            return x + y

    class EncBlock(nn.Module):
        def __init__(self, in_dim, out_dim, stride, wn):
            super().__init__()
            self.res_unit1 = ResUnit(in_dim, 1, wn)
            self.res_unit2 = ResUnit(in_dim, 3, wn)
            self.res_unit3 = ResUnit(in_dim, 9, wn)
            self.snake1 = Snake1d(in_dim)
            self.conv1 = wn(nn.Conv1d(in_dim, out_dim, 2 * stride,
                                      stride=stride,
                                      padding=_math.ceil(stride / 2)))

        def forward(self, x):
            x = self.res_unit1(x)
            x = self.res_unit2(x)
            x = self.snake1(self.res_unit3(x))
            return self.conv1(x)

    class DecBlock(nn.Module):
        def __init__(self, in_dim, out_dim, stride, wn):
            super().__init__()
            self.snake1 = Snake1d(in_dim)
            self.conv_t1 = wn(nn.ConvTranspose1d(
                in_dim, out_dim, 2 * stride, stride=stride,
                padding=_math.ceil(stride / 2)))
            self.res_unit1 = ResUnit(out_dim, 1, wn)
            self.res_unit2 = ResUnit(out_dim, 3, wn)
            self.res_unit3 = ResUnit(out_dim, 9, wn)

        def forward(self, x):
            x = self.conv_t1(self.snake1(x))
            return self.res_unit3(self.res_unit2(self.res_unit1(x)))

    class Encoder(nn.Module):
        def __init__(self, wn):
            super().__init__()
            cm = [1] + list(cfg.channel_multiples)
            h = cfg.encoder_hidden_size
            self.conv1 = wn(nn.Conv1d(cfg.audio_channels, h, 7, padding=3))
            self.block = nn.ModuleList([
                EncBlock(h * cm[i], h * cm[i + 1], s, wn)
                for i, s in enumerate(cfg.downsampling_ratios)])
            self.snake1 = Snake1d(h * cm[-1])
            self.conv2 = wn(nn.Conv1d(h * cm[-1],
                                      2 * cfg.decoder_input_channels, 3,
                                      padding=1))

        def forward(self, x):
            x = self.conv1(x)
            for b in self.block:
                x = b(x)
            return self.conv2(self.snake1(x))

    class Decoder(nn.Module):
        def __init__(self, wn):
            super().__init__()
            cm = [1] + list(cfg.channel_multiples)
            ch = cfg.decoder_channels
            n = len(cfg.downsampling_ratios)
            self.conv1 = wn(nn.Conv1d(cfg.decoder_input_channels,
                                      ch * cm[-1], 7, padding=3))
            self.block = nn.ModuleList([
                DecBlock(ch * cm[n - i], ch * cm[n - i - 1], s, wn)
                for i, s in enumerate(list(cfg.downsampling_ratios)[::-1])])
            self.snake1 = Snake1d(ch)
            self.conv2 = wn(nn.Conv1d(ch, cfg.audio_channels, 7, padding=3,
                                      bias=False))

        def forward(self, x):
            x = self.conv1(x)
            for b in self.block:
                x = b(x)
            return self.conv2(self.snake1(x))

    class VAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder(wn_legacy)
            self.decoder = Decoder(wn_param)

    torch.manual_seed(seed)
    return VAE().eval()


def test_oobleck_vae_full_module_matches_torch():
    """Encoder moments + decoder audio + tiled decode vs the hand-built
    torch Oobleck graph through ``convert_vae_state`` (closes the last
    cross-implementation hole on the audio path — the conv/weight-norm
    primitives were already torch-verified in test_checkpoint.py)."""
    import torch

    import jax
    import jax.numpy as jnp

    from acestep_tpu.config import VAEConfig
    from acestep_tpu.models.vae import vae_decode, vae_encode_moments
    from acestep_tpu.models.vae_tiled import tiled_decode
    from acestep_tpu.utils.checkpoint import convert_vae_state

    cfg = VAEConfig(encoder_hidden_size=8, downsampling_ratios=(2, 4),
                    channel_multiples=(1, 2), decoder_channels=8,
                    decoder_input_channels=4, audio_channels=2)
    model = _build_torch_oobleck(cfg, seed=3)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_vae_state(state, cfg, dtype=jnp.float32)

    torch.manual_seed(1)
    hop = cfg.hop_length                      # 8
    audio = torch.randn(2, cfg.audio_channels, 48 * hop)
    latents = torch.randn(2, cfg.decoder_input_channels, 128)

    with torch.no_grad():
        enc = model.encoder(audio)            # (B, 2*latent, T)
        mean_t, scale_t = enc.chunk(2, dim=1)
        std_t = torch.nn.functional.softplus(scale_t) + 1e-4
        dec_t = model.decoder(latents)        # (B, 2, L)

    with jax.default_matmul_precision("float32"):
        mean_j, std_j = vae_encode_moments(
            params, cfg, jnp.asarray(audio.numpy().transpose(0, 2, 1)))
        dec_j = np.asarray(vae_decode(
            params, cfg, jnp.asarray(latents.numpy().transpose(0, 2, 1))))
        # overlap 24 covers this decoder's receptive field (measured ±19
        # latent frames), so interior window seams are exact — torch
        # default init AMPLIFIES through the conv stack, so an overlap
        # short of the receptive field shows O(1) truncation error with
        # random weights (trained weights decay; production: 16 @ 256)
        tiled_j = np.asarray(tiled_decode(
            params, cfg, jnp.asarray(latents.numpy().transpose(0, 2, 1)),
            chunk_size=64, overlap=24))

    np.testing.assert_allclose(np.asarray(mean_j),
                               mean_t.numpy().transpose(0, 2, 1),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(std_j),
                               std_t.numpy().transpose(0, 2, 1),
                               atol=1e-4, rtol=1e-3)
    ref_dec = dec_t.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(dec_j, ref_dec, atol=1e-4, rtol=1e-3)
    # tiled vs torch away from the SIGNAL edges: the first/last window is
    # zero-padded where direct decode has per-layer conv padding instead,
    # so the outermost receptive-field reach of frames differs by
    # construction (every tiled decoder shares this edge semantic)
    lo, hi = 20 * hop, (128 - 20) * hop
    np.testing.assert_allclose(tiled_j[:, lo:hi], ref_dec[:, lo:hi],
                               atol=1e-4, rtol=1e-3)
    assert np.max(np.abs(dec_j - ref_dec)) < 1e-3
