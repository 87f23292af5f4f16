"""AceStep DiT stack, TPU-native.

Re-implements the capability of the reference model family
(/root/reference/acestep/models/turbo/modeling_acestep_v15_turbo.py) as pure
functions over param pytrees:

- Transformer layer stacks run under `lax.scan` over stacked layer params
  (one compiled layer body instead of 24 unrolled ones).
- The condition "packing" uses fixed-layout concat [lyrics, timbre, text].
  The reference sorts valid tokens first (pack_sequences, ref :135-166) but
  its DiT decoder drops all padding masks (ref :1379-1382: the cross mask is
  built from attention_mask=None), so cross-attn is permutation-invariant
  over the packed MULTISET and fixed concat is exactly equivalent — verified
  against the real reference encoder in tests/test_reference_parity.py.
  Convention: max_refer_count defaults to 1 (this stack packs exactly one
  timbre reference per item), keeping the packed length identical to the
  reference's; a larger count would append zero rows the reference doesn't
  have, shifting maskless cross-attention.
- Cross-attention K/V over the condition sequence are precomputed once per
  trajectory (`decoder_cross_kv`) — the XLA-native analogue of the
  reference's EncoderDecoderCache (ref :307-330).

Geometry (hidden 2048, 24 layers, GQA 16Q/8KV, head_dim 128, patch 2,
sliding window 128 on alternating layers) comes from DiTConfig.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import DiTConfig
from acestep_tpu.ops.basic import (
    attention, attention_flash, attention_kv, cross_kv, init_attention,
    init_linear, init_mlp, init_rms_norm, linear, mlp, rms_norm, rope_cos_sin,
    timestep_sinusoidal,
)
from acestep_tpu.ops.conv import (
    conv1d, conv1d_transpose, init_conv1d, init_conv1d_transpose,
)
from acestep_tpu.ops.fsq import fsq_indices_to_codes, fsq_quantize
from acestep_tpu.ops.masks import bidirectional_mask

# ==================================================================
# Init
# ==================================================================


def _init_encoder_layer(key, cfg: DiTConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "input_layernorm": init_rms_norm(cfg.hidden_size),
        "self_attn": init_attention(k1, cfg.hidden_size, cfg.num_attention_heads,
                                    cfg.num_key_value_heads, cfg.head_dim),
        "post_attention_layernorm": init_rms_norm(cfg.hidden_size),
        "mlp": init_mlp(k2, cfg.hidden_size, cfg.intermediate_size),
    }


def _init_dit_layer(key, cfg: DiTConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "self_attn_norm": init_rms_norm(cfg.hidden_size),
        "self_attn": init_attention(k1, cfg.hidden_size, cfg.num_attention_heads,
                                    cfg.num_key_value_heads, cfg.head_dim),
        "cross_attn_norm": init_rms_norm(cfg.hidden_size),
        "cross_attn": init_attention(k2, cfg.hidden_size, cfg.num_attention_heads,
                                     cfg.num_key_value_heads, cfg.head_dim),
        "mlp_norm": init_rms_norm(cfg.hidden_size),
        "mlp": init_mlp(k3, cfg.hidden_size, cfg.intermediate_size),
        # AdaLN modulation table (ref AceStepDiTLayer, :469)
        "scale_shift_table": jax.random.normal(k4, (6, cfg.hidden_size))
        / cfg.hidden_size ** 0.5,
    }


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _init_layer_stack(key, cfg: DiTConfig, n: int, maker) -> dict:
    keys = jax.random.split(key, n)
    return _stack([maker(k, cfg) for k in keys])


def _init_timestep_embedding(key, cfg: DiTConfig, in_channels: int = 256) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    h = cfg.hidden_size
    return {
        "linear_1": init_linear(k1, in_channels, h),
        "linear_2": init_linear(k2, h, h),
        "time_proj": init_linear(k3, h, 6 * h),
    }


def init_dit_params(key, cfg: DiTConfig) -> dict:
    """Full parameter tree for AceStepConditionGenerationModel."""
    ks = jax.random.split(key, 24)
    h = cfg.hidden_size
    decoder = {
        "layers": _init_layer_stack(ks[0], cfg, cfg.num_hidden_layers, _init_dit_layer),
        "proj_in": init_conv1d(ks[1], cfg.in_channels, h, cfg.patch_size),
        "time_embed": _init_timestep_embedding(ks[2], cfg),
        "time_embed_r": _init_timestep_embedding(ks[3], cfg),
        "condition_embedder": init_linear(ks[4], h, h),
        "norm_out": init_rms_norm(h),
        "proj_out": init_conv1d_transpose(ks[5], h, cfg.audio_acoustic_hidden_dim,
                                          cfg.patch_size),
        "scale_shift_table": jax.random.normal(ks[6], (2, h)) / h ** 0.5,
    }
    encoder = {
        "text_projector": init_linear(ks[7], cfg.text_hidden_dim, h, bias=False),
        "lyric_encoder": {
            "embed_tokens": init_linear(ks[8], cfg.text_hidden_dim, h),
            "layers": _init_layer_stack(ks[9], cfg,
                                        cfg.num_lyric_encoder_hidden_layers,
                                        _init_encoder_layer),
            "norm": init_rms_norm(h),
        },
        "timbre_encoder": {
            "embed_tokens": init_linear(ks[10], cfg.timbre_hidden_dim, h),
            "layers": _init_layer_stack(ks[11], cfg,
                                        cfg.num_timbre_encoder_hidden_layers,
                                        _init_encoder_layer),
            "norm": init_rms_norm(h),
            # Kept for checkpoint parity; the reference never prepends it
            # (ref :1084 is commented out).
            "special_token": jax.random.normal(ks[16], (1, 1, h)),
        },
    }
    klev = len(cfg.fsq_levels)
    tokenizer = {
        "audio_acoustic_proj": init_linear(ks[12], cfg.audio_acoustic_hidden_dim, h),
        "pooler": {
            "embed_tokens": init_linear(ks[17], h, h),
            "special_token": jax.random.normal(ks[13], (1, 1, h)) * 0.02,
            "layers": _init_layer_stack(ks[18], cfg,
                                        cfg.num_attention_pooler_hidden_layers,
                                        _init_encoder_layer),
            "norm": init_rms_norm(h),
        },
        "fsq": {
            "project_in": init_linear(ks[14], cfg.fsq_dim, klev),
            "project_out": init_linear(ks[19], klev, cfg.fsq_dim),
        },
    }
    detokenizer = {
        "embed_tokens": init_linear(ks[15], h, h),
        "special_tokens": jax.random.normal(ks[20], (cfg.pool_window_size, h)) * 0.02,
        "layers": _init_layer_stack(ks[21], cfg,
                                    cfg.num_attention_pooler_hidden_layers,
                                    _init_encoder_layer),
        "norm": init_rms_norm(h),
        "proj_out": init_linear(ks[22], h, cfg.audio_acoustic_hidden_dim),
    }
    return {
        "decoder": decoder,
        "encoder": encoder,
        "tokenizer": tokenizer,
        "detokenizer": detokenizer,
        "null_condition_emb": jax.random.normal(ks[23], (1, 1, h)),
    }


def _sliding_flags(cfg: DiTConfig, n_layers: int) -> jnp.ndarray:
    return jnp.asarray(
        np.array([cfg.layer_is_sliding(i) for i in range(n_layers)], dtype=bool)
    )


# patchified length above which the banded Pallas kernel beats XLA's dense
# masked attention (v5e head-to-head, 8-step trajectory, batch 1, warm:
# L=750: dense 0.173 s vs flash 0.216; L=3750: 1.396 vs 1.157; L=7500:
# 4.468 vs 3.114 — flash wins ~17-30% beyond a few thousand patches)
FLASH_MIN_PATCHES = 2048


def resolve_attention_impl(cfg: DiTConfig, seq_len: Optional[int] = None) -> str:
    """Attention impl ladder (the reference's FA2 -> sdpa -> eager,
    init_service_loader.py:45-71). 'auto' is length-aware: dense XLA for
    short sequences, the GQA-grouped banded Pallas kernel beyond
    FLASH_MIN_PATCHES on TPU backends."""
    impl = getattr(cfg, "attention_impl", "auto")
    if impl == "flash":
        return "flash" if cfg.layers_alternate() else "dense"
    if impl == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if (on_tpu and cfg.layers_alternate()
                and seq_len is not None and seq_len >= FLASH_MIN_PATCHES):
            return "flash"
    return "dense"


# ==================================================================
# Encoder stack (pre-norm self-attn + SwiGLU; ref AceStepEncoderLayer :371-437)
# ==================================================================


def encoder_stack(p_layers: dict, cfg: DiTConfig, x: jnp.ndarray, *,
                  full_mask: Optional[jnp.ndarray],
                  sliding_mask: Optional[jnp.ndarray],
                  sliding_flags: jnp.ndarray,
                  rope) -> jnp.ndarray:
    eps = cfg.rms_norm_eps

    def body(h, xs):
        lp, is_sliding = xs
        if sliding_mask is None:
            mask = full_mask
        elif full_mask is None:
            # ONLY valid when L <= window+1 (attention_pooler /
            # audio_detokenize, L=5-6): the band is then all-True, so
            # full layers are unaffected. Callers with longer sequences
            # must pass an explicit full_mask (see timbre_encoder).
            mask = sliding_mask
        else:
            mask = jnp.where(is_sliding, sliding_mask, full_mask)
        a = attention(lp["self_attn"], rms_norm(lp["input_layernorm"], h, eps),
                      num_heads=cfg.num_attention_heads,
                      num_kv_heads=cfg.num_key_value_heads,
                      head_dim=cfg.head_dim, mask=mask, rope=rope, eps=eps)
        h = h + a
        h = h + mlp(lp["mlp"], rms_norm(lp["post_attention_layernorm"], h, eps))
        return h, None

    x, _ = jax.lax.scan(body, x, (p_layers, sliding_flags))
    return x


# ==================================================================
# Condition encoders
# ==================================================================


def lyric_encoder(p: dict, cfg: DiTConfig, lyric_embs: jnp.ndarray,
                  lyric_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L, text_hidden_dim) + (B, L) -> (B, L, H).

    Bidirectional, alternating sliding/full with the padding mask applied
    (ref AceStepLyricEncoder :599-728).
    """
    x = linear(p["embed_tokens"], lyric_embs)
    L = x.shape[1]
    n = jax.tree.leaves(p["layers"])[0].shape[0]
    rope = rope_cos_sin(L, cfg.head_dim, cfg.rope_theta, dtype=x.dtype)
    full = bidirectional_mask(L, lyric_mask)
    sliding = bidirectional_mask(L, lyric_mask, window=cfg.sliding_window)
    x = encoder_stack(p["layers"], cfg, x, full_mask=full, sliding_mask=sliding,
                      sliding_flags=_sliding_flags(cfg, n), rope=rope)
    return rms_norm(p["norm"], x, cfg.rms_norm_eps)


def unpack_by_order(packed: jnp.ndarray, order_mask: jnp.ndarray,
                    batch_size: int, max_count: int):
    """Scatter N packed vectors into (B, max_count, D) by batch id.

    Static-shape version of the reference's one-hot unpack
    (ref unpack_timbre_embeddings :1020-1070). Items beyond max_count per
    batch are dropped.
    """
    N, D = packed.shape
    same = order_mask[:, None] == order_mask[None, :]
    before = jnp.sum(jnp.tril(same, -1), axis=1)          # rank within group
    valid = before < max_count
    slot = jnp.where(valid, order_mask * max_count + before, batch_size * max_count)
    one_hot = jax.nn.one_hot(slot, batch_size * max_count + 1, dtype=packed.dtype)
    out = (one_hot.T @ packed)[:-1].reshape(batch_size, max_count, D)
    mask = (jnp.sum(one_hot, axis=0) > 0)[:-1].reshape(batch_size, max_count)
    return out, mask.astype(jnp.int32)


def timbre_encoder(p: dict, cfg: DiTConfig, refs_packed: jnp.ndarray,
                   order_mask: jnp.ndarray, batch_size: int,
                   max_count: int):
    """(N, T, 64) packed reference latents -> (B, max_count, H) timbre embs.

    Geometry-only masks (the reference passes attention_mask=None,
    ref :1077+); the first position's output is the timbre vector
    (no CLS prepend — ref :1084 commented out, :1172).
    """
    x = linear(p["embed_tokens"], refs_packed)
    L = x.shape[1]
    n = jax.tree.leaves(p["layers"])[0].shape[0]
    rope = rope_cos_sin(L, cfg.head_dim, cfg.rope_theta, dtype=x.dtype)
    # full_attention layers attend UNRESTRICTED over the 750-frame
    # reference (ref :1122-1150 builds the band only for sliding layers);
    # passing full_mask=None here would band every layer
    full = bidirectional_mask(L)
    sliding = bidirectional_mask(L, window=cfg.sliding_window)
    x = encoder_stack(p["layers"], cfg, x, full_mask=full,
                      sliding_mask=sliding,
                      sliding_flags=_sliding_flags(cfg, n), rope=rope)
    x = rms_norm(p["norm"], x, cfg.rms_norm_eps)
    cls = x[:, 0, :]
    return unpack_by_order(cls, order_mask, batch_size, max_count)


def condition_encoder(p: dict, cfg: DiTConfig, *,
                      text_hidden_states, text_attention_mask,
                      lyric_hidden_states, lyric_attention_mask,
                      refer_audio_packed, refer_order_mask,
                      max_refer_count: int = 1):
    """Returns (encoder_hidden_states, encoder_attention_mask).

    Fixed layout [lyrics | timbre | text]; equivalent to the reference's
    sorted packing under maskless cross-attention (see module docstring).
    """
    enc_p = p["encoder"] if "encoder" in p else p
    B = text_hidden_states.shape[0]
    text = linear(enc_p["text_projector"], text_hidden_states)
    lyric = lyric_encoder(enc_p["lyric_encoder"], cfg, lyric_hidden_states,
                          lyric_attention_mask)
    timbre, timbre_mask = timbre_encoder(enc_p["timbre_encoder"], cfg,
                                         refer_audio_packed, refer_order_mask,
                                         B, max_refer_count)
    enc = jnp.concatenate([lyric, timbre.astype(lyric.dtype), text], axis=1)
    enc_mask = jnp.concatenate(
        [lyric_attention_mask.astype(jnp.int32), timbre_mask,
         text_attention_mask.astype(jnp.int32)], axis=1)
    return enc, enc_mask


# ==================================================================
# 5 Hz audio tokenizer / detokenizer
# ==================================================================


def attention_pooler(p: dict, cfg: DiTConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, P, H) patches -> (B, T, H) via CLS-token pooling
    (ref AttentionPooler :731-856)."""
    B, T, P, H = x.shape
    x = linear(p["embed_tokens"], x)
    cls = jnp.broadcast_to(p["special_token"].astype(x.dtype), (B, T, 1, H))
    x = jnp.concatenate([cls, x], axis=2).reshape(B * T, P + 1, H)
    n = jax.tree.leaves(p["layers"])[0].shape[0]
    rope = rope_cos_sin(P + 1, cfg.head_dim, cfg.rope_theta, dtype=x.dtype)
    sliding = bidirectional_mask(P + 1, window=cfg.sliding_window)
    x = encoder_stack(p["layers"], cfg, x, full_mask=None, sliding_mask=sliding,
                      sliding_flags=_sliding_flags(cfg, n), rope=rope)
    x = rms_norm(p["norm"], x, cfg.rms_norm_eps)
    return x[:, 0, :].reshape(B, T, H)


def audio_tokenize(params: dict, cfg: DiTConfig, latents: jnp.ndarray):
    """25 Hz latents (B, T, 64), T % pool_window == 0 -> (quantized (B, T/5, H),
    indices (B, T/5)). Ref AceStepAudioTokenizer :1178-1220."""
    p = params["tokenizer"]
    B, T, _ = latents.shape
    P = cfg.pool_window_size
    x = linear(p["audio_acoustic_proj"], latents)
    x = x.reshape(B, T // P, P, cfg.hidden_size)
    pooled = attention_pooler(p["pooler"], cfg, x)
    z = linear(p["fsq"]["project_in"], pooled)
    codes, indices = fsq_quantize(z, cfg.fsq_levels)
    quantized = linear(p["fsq"]["project_out"], codes)
    return quantized, indices


def audio_codes_to_quantized(params: dict, cfg: DiTConfig,
                             indices: jnp.ndarray) -> jnp.ndarray:
    """5 Hz code ids (B, T5) -> quantized hidden (B, T5, H) — the
    ResidualFSQ.get_output_from_indices path (ref :1640)."""
    codes = fsq_indices_to_codes(indices, cfg.fsq_levels)
    return linear(params["tokenizer"]["fsq"]["project_out"], codes)


def audio_detokenize(params: dict, cfg: DiTConfig,
                     quantized: jnp.ndarray) -> jnp.ndarray:
    """(B, T5, H) -> 25 Hz LM hints (B, T5*P, 64).
    Ref AudioTokenDetokenizer :859-991."""
    p = params["detokenizer"]
    B, T, H = quantized.shape
    P = cfg.pool_window_size
    x = linear(p["embed_tokens"], quantized)
    x = x[:, :, None, :] + p["special_tokens"].astype(x.dtype)[None, None]
    x = x.reshape(B * T, P, H)
    n = jax.tree.leaves(p["layers"])[0].shape[0]
    rope = rope_cos_sin(P, cfg.head_dim, cfg.rope_theta, dtype=x.dtype)
    sliding = bidirectional_mask(P, window=cfg.sliding_window)
    x = encoder_stack(p["layers"], cfg, x, full_mask=None, sliding_mask=sliding,
                      sliding_flags=_sliding_flags(cfg, n), rope=rope)
    x = rms_norm(p["norm"], x, cfg.rms_norm_eps)
    x = linear(p["proj_out"], x)
    return x.reshape(B, T * P, cfg.audio_acoustic_hidden_dim)


# ==================================================================
# DiT decoder
# ==================================================================


def _timestep_embed(p: dict, t: jnp.ndarray, dtype):
    """Ref TimestepEmbedding.forward :245-251."""
    emb = timestep_sinusoidal(t, 256).astype(dtype)
    temb = linear(p["linear_2"], jax.nn.silu(linear(p["linear_1"], emb)))
    proj = linear(p["time_proj"], jax.nn.silu(temb))
    return temb, proj.reshape(t.shape[0], 6, -1)


def decoder_cross_kv(params: dict, cfg: DiTConfig, enc: jnp.ndarray):
    """Precompute per-layer cross-attn K/V for a fixed condition sequence.

    Returns stacked (n_layers, B, Lk, Hkv, D) k and v. Applies the decoder's
    condition_embedder first (ref :1356)."""
    enc = linear(params["decoder"]["condition_embedder"], enc)

    def one_layer(lp):
        return cross_kv(lp["cross_attn"], enc,
                        num_kv_heads=cfg.num_key_value_heads,
                        head_dim=cfg.head_dim, eps=cfg.rms_norm_eps)

    return jax.vmap(one_layer, in_axes=(0,))(params["decoder"]["layers"])


def dit_decoder(params: dict, cfg: DiTConfig, xt: jnp.ndarray,
                timestep: jnp.ndarray, timestep_r: jnp.ndarray,
                context_latents: jnp.ndarray,
                encoder_hidden_states: Optional[jnp.ndarray] = None,
                cross_kv_cache=None, remat: bool = False) -> jnp.ndarray:
    """One denoising forward: (B, T, 64) noisy latents -> (B, T, 64) velocity.

    Ref AceStepDiTModel.forward :1300-1504. Padding masks are intentionally
    dropped (ref :1379-1382); self-attn uses geometry-only full/sliding
    masks, cross-attn is unmasked.

    remat=True rematerializes each scan layer on the backward pass
    (jax.checkpoint) — activation memory per layer instead of per stack,
    the standard trade for training the 24-layer model.
    """
    p = params["decoder"]
    eps = cfg.rms_norm_eps
    dtype = xt.dtype
    B, T0, _ = xt.shape

    temb_t, proj_t = _timestep_embed(p["time_embed"], timestep, dtype)
    temb_r, proj_r = _timestep_embed(p["time_embed_r"], timestep - timestep_r, dtype)
    temb = temb_t + temb_r
    tproj = proj_t + proj_r                                  # (B, 6, H)

    h = jnp.concatenate([context_latents.astype(dtype), xt], axis=-1)
    pad = (-T0) % cfg.patch_size
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    h = conv1d(p["proj_in"], h, stride=cfg.patch_size)       # (B, L, H)
    L = h.shape[1]

    if cross_kv_cache is None:
        enc = linear(p["condition_embedder"], encoder_hidden_states.astype(dtype))
        kv = None
    else:
        kv = cross_kv_cache

    rope = rope_cos_sin(L, cfg.head_dim, cfg.rope_theta, dtype=dtype)

    def layer_apply(lp, hh, layer_kv, *, self_attn_fn):
        """One AdaLN DiT layer given a self-attention closure."""
        table = lp["scale_shift_table"][None].astype(dtype)  # (1, 6, H)
        mods = table + tproj                                  # (B, 6, H)
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            mods[:, i:i + 1] for i in range(6)
        ]
        norm_h = rms_norm(lp["self_attn_norm"], hh, eps) * (1 + scale_msa) + shift_msa
        hh = hh + self_attn_fn(lp["self_attn"], norm_h.astype(dtype)) * gate_msa

        norm_h = rms_norm(lp["cross_attn_norm"], hh, eps)
        if layer_kv is None:
            ca = attention(lp["cross_attn"], norm_h,
                           num_heads=cfg.num_attention_heads,
                           num_kv_heads=cfg.num_key_value_heads,
                           head_dim=cfg.head_dim, kv_src=enc, eps=eps)
        else:
            k_l, v_l = layer_kv
            ca = attention_kv(lp["cross_attn"], norm_h, k_l, v_l,
                              num_heads=cfg.num_attention_heads,
                              head_dim=cfg.head_dim, eps=eps)
        hh = hh + ca

        norm_h = rms_norm(lp["mlp_norm"], hh, eps) * (1 + c_scale) + c_shift
        hh = hh + mlp(lp["mlp"], norm_h.astype(dtype)) * c_gate
        return hh.astype(dtype)

    def dense_attn(window):
        mask = bidirectional_mask(L, window=window)

        def fn(ap, x_in):
            return attention(ap, x_in,
                             num_heads=cfg.num_attention_heads,
                             num_kv_heads=cfg.num_key_value_heads,
                             head_dim=cfg.head_dim, mask=mask, rope=rope,
                             eps=eps)
        return fn

    def flash_attn(window):
        def fn(ap, x_in):
            return attention_flash(ap, x_in,
                                   num_heads=cfg.num_attention_heads,
                                   num_kv_heads=cfg.num_key_value_heads,
                                   head_dim=cfg.head_dim, rope=rope,
                                   window=window, eps=eps)
        return fn

    impl = resolve_attention_impl(cfg, seq_len=L)
    if cfg.unroll_layers and not remat:
        # Unrolled layer loop (opt-in, inference): static per-layer slices
        # of the stacked params read the weights in place, where the scan
        # below dynamic-slices ~each layer's tree per iteration — traffic
        # XLA may materialize as an HBM copy (the LM decode stack measured
        # scan 7.0 vs unrolled 5.8 ms/step on the same pattern). Masks and
        # windows become static per layer too.
        mk = flash_attn if impl == "flash" else dense_attn
        sliding_fn = mk(cfg.sliding_window)
        full_fn = mk(None)
        for i in range(cfg.num_hidden_layers):
            lp = jax.tree.map(lambda a, i=i: a[i], p["layers"])
            layer_kv = (None if kv is None
                        else jax.tree.map(lambda a, i=i: a[i], kv))
            h = layer_apply(
                lp, h, layer_kv,
                self_attn_fn=sliding_fn if cfg.layer_is_sliding(i)
                else full_fn)
    elif impl == "flash":
        # Paired scan: layer_types strictly alternate [sliding, full], so one
        # scan step applies a (banded flash, full flash) pair. The window is
        # static per sub-layer — no traced mask select, no L x L logits.
        make = flash_attn
        n_pairs = cfg.num_hidden_layers // 2

        def pair(tree):
            return jax.tree.map(
                lambda x: x.reshape(n_pairs, 2, *x.shape[1:]), tree)

        sliding_fn = make(cfg.sliding_window)
        full_fn = make(None)

        def body(carry, xs):
            lp2 = xs[0]
            kv2 = xs[1] if kv is not None else None
            hh = carry
            hh = layer_apply(jax.tree.map(lambda x: x[0], lp2), hh,
                             None if kv2 is None else jax.tree.map(
                                 lambda x: x[0], kv2),
                             self_attn_fn=sliding_fn)
            hh = layer_apply(jax.tree.map(lambda x: x[1], lp2), hh,
                             None if kv2 is None else jax.tree.map(
                                 lambda x: x[1], kv2),
                             self_attn_fn=full_fn)
            return hh, None

        xs = (pair(p["layers"]),) if kv is None else (pair(p["layers"]),
                                                      pair(kv))
        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, xs)
    else:
        flags = _sliding_flags(cfg, cfg.num_hidden_layers)
        full_mask = bidirectional_mask(L)
        sliding_mask = bidirectional_mask(L, window=cfg.sliding_window)

        def body(carry, xs):
            if kv is None:
                lp, is_sliding = xs
                layer_kv = None
            else:
                lp, is_sliding, layer_kv = xs
            mask = jnp.where(is_sliding, sliding_mask, full_mask)

            def attn_fn(ap, x_in):
                return attention(ap, x_in,
                                 num_heads=cfg.num_attention_heads,
                                 num_kv_heads=cfg.num_key_value_heads,
                                 head_dim=cfg.head_dim, mask=mask, rope=rope,
                                 eps=eps)
            return layer_apply(lp, carry, layer_kv,
                               self_attn_fn=attn_fn), None

        xs = (p["layers"], flags) if kv is None else (p["layers"], flags, kv)
        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, xs)

    table = p["scale_shift_table"][None].astype(dtype)        # (1, 2, H)
    mods = table + temb[:, None]
    shift, scale = mods[:, 0:1], mods[:, 1:2]
    h = rms_norm(p["norm_out"], h, eps) * (1 + scale) + shift
    h = conv1d_transpose(p["proj_out"], h.astype(dtype), stride=cfg.patch_size)
    return h[:, :T0]


def dit_decoder_attn_capture(params: dict, cfg: DiTConfig, xt: jnp.ndarray,
                             timestep: jnp.ndarray, timestep_r: jnp.ndarray,
                             context_latents: jnp.ndarray,
                             encoder_hidden_states: jnp.ndarray,
                             capture: dict,
                             early_exit: Optional[int] = None) -> dict:
    """Run the decoder capturing cross-attention probabilities.

    `capture` maps layer index -> list of head indices (the reference's
    `custom_layers_config`, handler.py:129, used with early exit for LRC
    alignment, lyric_timestamp.py). Returns {layer: (B, n_heads, Tq, Tk)}.
    Flash/fused attention never materializes probs, so this dedicated
    unrolled path (≤ early_exit layers) exists solely for alignment/scoring.
    """
    if not capture:
        raise ValueError("capture must map at least one layer -> heads")
    p = params["decoder"]
    eps = cfg.rms_norm_eps
    dtype = xt.dtype
    B, T0, _ = xt.shape
    n_layers = (early_exit if early_exit is not None
                else max(capture) + 1)
    if max(capture) >= n_layers:
        raise ValueError(
            f"capture layer {max(capture)} is not run under "
            f"early_exit={early_exit} — it would be silently skipped")

    temb_t, proj_t = _timestep_embed(p["time_embed"], timestep, dtype)
    temb_r, proj_r = _timestep_embed(p["time_embed_r"],
                                     timestep - timestep_r, dtype)
    tproj = proj_t + proj_r

    h = jnp.concatenate([context_latents.astype(dtype), xt], axis=-1)
    pad = (-T0) % cfg.patch_size
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    h = conv1d(p["proj_in"], h, stride=cfg.patch_size)
    L = h.shape[1]
    enc = linear(p["condition_embedder"], encoder_hidden_states.astype(dtype))

    rope = rope_cos_sin(L, cfg.head_dim, cfg.rope_theta, dtype=dtype)
    full = bidirectional_mask(L)
    sliding = bidirectional_mask(L, window=cfg.sliding_window)

    captured = {}
    for i in range(n_layers):
        lp = jax.tree.map(lambda x: x[i], p["layers"])
        table = lp["scale_shift_table"][None].astype(dtype)
        mods = table + tproj
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            mods[:, j:j + 1] for j in range(6)
        ]
        mask = sliding if cfg.layer_is_sliding(i) else full

        norm_h = rms_norm(lp["self_attn_norm"], h, eps) * (1 + scale_msa) + shift_msa
        a = attention(lp["self_attn"], norm_h.astype(dtype),
                      num_heads=cfg.num_attention_heads,
                      num_kv_heads=cfg.num_key_value_heads,
                      head_dim=cfg.head_dim, mask=mask, rope=rope, eps=eps)
        h = h + a * gate_msa

        norm_h = rms_norm(lp["cross_attn_norm"], h, eps)
        ca, probs = attention(lp["cross_attn"], norm_h,
                              kv_src=enc,
                              num_heads=cfg.num_attention_heads,
                              num_kv_heads=cfg.num_key_value_heads,
                              head_dim=cfg.head_dim, eps=eps,
                              return_weights=True)
        if i in capture:
            heads = jnp.asarray(capture[i], jnp.int32)
            captured[i] = probs[:, heads].astype(jnp.float32)
        h = h + ca

        norm_h = rms_norm(lp["mlp_norm"], h, eps) * (1 + c_scale) + c_shift
        h = (h + mlp(lp["mlp"], norm_h.astype(dtype)) * c_gate).astype(dtype)

    return captured


# ==================================================================
# Condition preparation (ref prepare_condition :1603-1649)
# ==================================================================


def prepare_condition(params: dict, cfg: DiTConfig, *,
                      text_hidden_states, text_attention_mask,
                      lyric_hidden_states, lyric_attention_mask,
                      refer_audio_packed, refer_order_mask,
                      src_latents, chunk_masks, is_covers,
                      silence_latent=None,
                      tokenize_latents=None,
                      precomputed_lm_hints_25hz=None,
                      audio_codes=None,
                      audio_codes_valid_frames=None,
                      max_refer_count: int = 1):
    """Build (encoder_hidden_states, encoder_attention_mask, context_latents).

    LM-hint source precedence mirrors the reference: precomputed 25 Hz hints
    > audio codes > tokenize(src)->detokenize roundtrip.

    audio_codes_valid_frames (B,) int32 gives the per-row number of hint
    frames actually backed by codes; frames beyond it take the SILENCE
    latent. This reproduces the reference's precomputed-hints assembly
    (conditioning_text.py:33-55): short code hints are silence-padded to
    the batch length, and a hint-less row in a mixed batch gets silence
    hints — never the detokenization of its all-zero padding in the
    batched codes matrix.
    """
    enc, enc_mask = condition_encoder(
        params, cfg,
        text_hidden_states=text_hidden_states,
        text_attention_mask=text_attention_mask,
        lyric_hidden_states=lyric_hidden_states,
        lyric_attention_mask=lyric_attention_mask,
        refer_audio_packed=refer_audio_packed,
        refer_order_mask=refer_order_mask,
        max_refer_count=max_refer_count,
    )
    T = src_latents.shape[1]

    def fit_to_T(hints):
        """Crop/zero-pad hints to exactly T frames (codes cover a multiple
        of pool_window frames, which may undershoot a non-multiple T)."""
        hints = hints[:, :T, :]
        short = T - hints.shape[1]
        if short > 0:
            hints = jnp.pad(hints, ((0, 0), (0, short), (0, 0)))
        return hints

    def roundtrip_hints():
        x = src_latents if tokenize_latents is None else tokenize_latents
        pad = (-x.shape[1]) % cfg.pool_window_size
        if pad:
            filler = (silence_latent[:1, :pad, :] if silence_latent is not None
                      else jnp.zeros_like(x[:1, :pad]))
            x2 = jnp.concatenate(
                [x, jnp.broadcast_to(filler, (x.shape[0], pad, x.shape[2]))],
                axis=1)
        else:
            x2 = x
        q, _ = audio_tokenize(params, cfg, x2)
        return audio_detokenize(params, cfg, q)[:, :T, :]

    if precomputed_lm_hints_25hz is not None:
        lm_hints = fit_to_T(precomputed_lm_hints_25hz)
    elif audio_codes is not None:
        q = audio_codes_to_quantized(params, cfg, audio_codes)
        lm_hints = fit_to_T(audio_detokenize(params, cfg, q))
        if audio_codes_valid_frames is not None and silence_latent is not None:
            valid = (jnp.arange(T)[None, :]
                     < audio_codes_valid_frames[:, None])          # (B, T)
            sil = jnp.broadcast_to(
                silence_latent[:1, :T, :].astype(lm_hints.dtype),
                lm_hints.shape)
            lm_hints = jnp.where(valid[..., None], lm_hints, sil)
    else:
        lm_hints = roundtrip_hints()

    is_c = is_covers.reshape(-1, 1, 1).astype(src_latents.dtype)
    src = jnp.where(is_c > 0, lm_hints.astype(src_latents.dtype), src_latents)
    context_latents = jnp.concatenate([src, chunk_masks.astype(src.dtype)], axis=-1)
    return enc, enc_mask, context_latents


# ==================================================================
# Flow-matching training loss (ref forward/training_losses :1651-1728)
# ==================================================================


def sample_t_r(key, batch_size: int, *, data_proportion: float = 0.0,
               timestep_mu: float = -0.4, timestep_sigma: float = 1.0,
               use_meanflow: bool = True):
    """Logit-normal timestep sampling (ref sample_t_r :169-194)."""
    k1, k2 = jax.random.split(key)
    t = jax.nn.sigmoid(jax.random.normal(k1, (batch_size,)) * timestep_sigma + timestep_mu)
    r = jax.nn.sigmoid(jax.random.normal(k2, (batch_size,)) * timestep_sigma + timestep_mu)
    t, r = jnp.maximum(t, r), jnp.minimum(t, r)
    if not use_meanflow:
        data_proportion = 1.0
    data_size = int(batch_size * data_proportion)
    zero_mask = jnp.arange(batch_size) < data_size
    r = jnp.where(zero_mask, t, r)
    return t, r


def training_loss(params: dict, cfg: DiTConfig, key, *,
                  hidden_states, attention_mask,
                  text_hidden_states, text_attention_mask,
                  lyric_hidden_states, lyric_attention_mask,
                  refer_audio_packed, refer_order_mask,
                  src_latents, chunk_masks, is_covers,
                  silence_latent=None, cfg_ratio: float = 0.15,
                  max_refer_count: int = 1,
                  discrete_timesteps: Optional[tuple] = None):
    """Flow-matching MSE with CFG condition dropout.

    Timestep source: continuous logit-normal by default (training_v2 'fixed'
    semantics, ref training_v2/timestep_sampling.py:20-60); pass
    `discrete_timesteps` (e.g. the turbo shift-3 schedule) for the v1
    trainer's discrete sampling (ref training/trainer.py:303-324)."""
    enc, enc_mask, context_latents = prepare_condition(
        params, cfg,
        text_hidden_states=text_hidden_states,
        text_attention_mask=text_attention_mask,
        lyric_hidden_states=lyric_hidden_states,
        lyric_attention_mask=lyric_attention_mask,
        refer_audio_packed=refer_audio_packed,
        refer_order_mask=refer_order_mask,
        src_latents=src_latents, chunk_masks=chunk_masks, is_covers=is_covers,
        silence_latent=silence_latent, max_refer_count=max_refer_count,
    )
    bsz = hidden_states.shape[0]
    k_drop, k_noise, k_t = jax.random.split(key, 3)

    keep = (jax.random.uniform(k_drop, (bsz, 1, 1)) >= cfg_ratio)
    null = params["null_condition_emb"].astype(enc.dtype)
    enc = jnp.where(keep, enc, jnp.broadcast_to(null, enc.shape))

    x0 = hidden_states
    x1 = jax.random.normal(k_noise, x0.shape, x0.dtype)
    if discrete_timesteps is not None:
        pool = jnp.asarray(discrete_timesteps, jnp.float32)
        idx = jax.random.randint(k_t, (bsz,), 0, pool.shape[0])
        t = pool[idx]
    else:
        t, _ = sample_t_r(k_t, bsz, data_proportion=cfg.data_proportion,
                          timestep_mu=cfg.timestep_mu,
                          timestep_sigma=cfg.timestep_sigma, use_meanflow=False)
    t = t.astype(x0.dtype)
    xt = t[:, None, None] * x1 + (1.0 - t[:, None, None]) * x0

    v = dit_decoder(params, cfg, xt, t, t, context_latents,
                    encoder_hidden_states=enc, remat=True)
    flow = x1 - x0
    sq = (v.astype(jnp.float32) - flow.astype(jnp.float32)) ** 2
    # mask padded frames out of the MSE (bucketed batches pad short songs)
    m = attention_mask.astype(jnp.float32)[:, :, None]
    return jnp.sum(sq * m) / jnp.maximum(jnp.sum(m) * sq.shape[-1], 1.0)
