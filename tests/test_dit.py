"""DiT model + sampler tests on a tiny config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit
from acestep_tpu.models.sampler import (
    ConditionSet, build_continuous_schedule, build_turbo_schedule,
    sample_guided, sample_turbo, truncate_for_cover_noise,
)

CFG = DiTConfig.tiny()
B, T = 2, 20          # 20 latent frames (multiple of patch 2 and pool 5)
LT, LL = 7, 11        # text / lyric lengths
NREF = 3


@pytest.fixture(scope="module")
def params():
    return dit.init_dit_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def batch():
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 8)
    return dict(
        text_hidden_states=jax.random.normal(ks[0], (B, LT, CFG.text_hidden_dim)),
        text_attention_mask=jnp.ones((B, LT)),
        lyric_hidden_states=jax.random.normal(ks[1], (B, LL, CFG.text_hidden_dim)),
        lyric_attention_mask=jnp.asarray([[1.0] * LL, [1.0] * 6 + [0.0] * (LL - 6)]),
        refer_audio_packed=jax.random.normal(ks[2], (NREF, 10, CFG.timbre_hidden_dim)),
        refer_order_mask=jnp.asarray([0, 0, 1]),
        src_latents=jax.random.normal(ks[3], (B, T, CFG.audio_acoustic_hidden_dim)),
        chunk_masks=jnp.ones((B, T, CFG.audio_acoustic_hidden_dim)),
        is_covers=jnp.asarray([0, 1]),
        silence_latent=jax.random.normal(ks[4], (1, T, CFG.audio_acoustic_hidden_dim)),
    )


@pytest.mark.slow
def test_condition_encoder_shapes(params, batch):
    enc, mask = dit.condition_encoder(
        params, CFG,
        text_hidden_states=batch["text_hidden_states"],
        text_attention_mask=batch["text_attention_mask"],
        lyric_hidden_states=batch["lyric_hidden_states"],
        lyric_attention_mask=batch["lyric_attention_mask"],
        refer_audio_packed=batch["refer_audio_packed"],
        refer_order_mask=batch["refer_order_mask"],
        max_refer_count=2,
    )
    assert enc.shape == (B, LL + 2 + LT, CFG.hidden_size)
    assert mask.shape == (B, LL + 2 + LT)
    # sample 0 has 2 refs, sample 1 has 1 ref
    np.testing.assert_array_equal(np.asarray(mask[:, LL:LL + 2]), [[1, 1], [1, 0]])


def test_unpack_by_order():
    packed = jnp.arange(8.0).reshape(4, 2)
    order = jnp.asarray([0, 1, 0, 1])
    out, mask = dit.unpack_by_order(packed, order, 2, 3)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0, 1])
    np.testing.assert_allclose(np.asarray(out[0, 1]), [4, 5])
    np.testing.assert_allclose(np.asarray(out[1, 0]), [2, 3])
    np.testing.assert_array_equal(np.asarray(mask), [[1, 1, 0], [1, 1, 0]])


@pytest.mark.slow
def test_tokenize_detokenize_roundtrip_shapes(params, batch):
    q, idx = dit.audio_tokenize(params, CFG, batch["src_latents"])
    assert q.shape == (B, T // 5, CFG.hidden_size)
    assert idx.shape == (B, T // 5)
    assert int(idx.min()) >= 0 and int(idx.max()) < 64_000
    hints = dit.audio_detokenize(params, CFG, q)
    assert hints.shape == (B, T, CFG.audio_acoustic_hidden_dim)
    # codes -> quantized path must agree with tokenize's quantized output
    q2 = dit.audio_codes_to_quantized(params, CFG, idx)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)


@pytest.mark.slow
def test_code_hints_silence_padded_per_row(params, batch):
    """Reference conditioning_text.py:33-55: hint frames beyond each row's
    real codes take the SILENCE latent — a hint-less row in a mixed batch
    gets full-silence hints, and a short hint row gets a silence tail,
    never the detokenization of the zero padding in the codes matrix."""
    T5 = T // CFG.pool_window_size
    codes = jnp.asarray(
        np.random.RandomState(0).randint(1, 50, (B, T5)), jnp.int32)
    half_frames = (T5 // 2) * CFG.pool_window_size
    valid = jnp.asarray([half_frames, 0], jnp.int32)   # row1: no hints

    b = dict(batch, is_covers=jnp.asarray([1, 1]))
    kw = {k: b[k] for k in (
        "text_hidden_states", "text_attention_mask", "lyric_hidden_states",
        "lyric_attention_mask", "refer_audio_packed", "refer_order_mask",
        "src_latents", "chunk_masks", "is_covers", "silence_latent")}
    _, _, ctx = dit.prepare_condition(
        params, CFG, audio_codes=codes, audio_codes_valid_frames=valid, **kw)
    D = CFG.audio_acoustic_hidden_dim
    hints = np.asarray(ctx[..., :D])      # is_cover rows: src == lm hints
    sil = np.asarray(b["silence_latent"][0])
    # row 1 (no codes): silence everywhere
    np.testing.assert_allclose(hints[1], sil, rtol=1e-5, atol=1e-5)
    # row 0: silence beyond its real half-length hints, NOT silence within
    np.testing.assert_allclose(hints[0, half_frames:], sil[half_frames:],
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(hints[0, :half_frames], sil[:half_frames])
    # without the mask, zero-code detokenization leaks into both regions
    _, _, ctx_raw = dit.prepare_condition(
        params, CFG, audio_codes=codes, **kw)
    raw = np.asarray(ctx_raw[..., :D])
    assert not np.allclose(raw[1], sil)


@pytest.mark.slow
def test_decoder_forward_and_kv_cache_equivalence(params, batch):
    enc, mask, ctx = dit.prepare_condition(
        params, CFG, max_refer_count=2,
        silence_latent=batch["silence_latent"],
        **{k: batch[k] for k in (
            "text_hidden_states", "text_attention_mask", "lyric_hidden_states",
            "lyric_attention_mask", "refer_audio_packed", "refer_order_mask",
            "src_latents", "chunk_masks", "is_covers")},
    )
    assert ctx.shape == (B, T, 2 * CFG.audio_acoustic_hidden_dim)
    xt = jax.random.normal(jax.random.PRNGKey(3), (B, T, CFG.audio_acoustic_hidden_dim))
    t = jnp.full((B,), 0.5)
    v1 = dit.dit_decoder(params, CFG, xt, t, t, ctx, encoder_hidden_states=enc)
    assert v1.shape == xt.shape
    kv = dit.decoder_cross_kv(params, CFG, enc)
    v2 = dit.dit_decoder(params, CFG, xt, t, t, ctx, cross_kv_cache=kv)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


@pytest.mark.slow
def test_decoder_odd_length_padding(params, batch):
    # T=19 not divisible by patch 2: must pad internally and crop back.
    xt = jax.random.normal(jax.random.PRNGKey(4), (B, 19, CFG.audio_acoustic_hidden_dim))
    ctx = jnp.zeros((B, 19, 2 * CFG.audio_acoustic_hidden_dim))
    enc = jax.random.normal(jax.random.PRNGKey(5), (B, 4, CFG.hidden_size))
    t = jnp.full((B,), 0.3)
    v = dit.dit_decoder(params, CFG, xt, t, t, ctx, encoder_hidden_states=enc)
    assert v.shape == (B, 19, CFG.audio_acoustic_hidden_dim)


def test_turbo_schedules():
    assert build_turbo_schedule(3.0) == list(
        (1.0, 0.9545454545454546, 0.9, 0.8333333333333334, 0.75,
         0.6428571428571429, 0.5, 0.3))
    assert build_turbo_schedule(2.4) == build_turbo_schedule(2.0)
    # custom timesteps snap to valid set, trailing zeros dropped
    snapped = build_turbo_schedule(3.0, timesteps=[0.99, 0.52, 0.0])
    assert snapped == [1.0, 0.5]
    sched, start = truncate_for_cover_noise(build_turbo_schedule(1.0), 0.6)
    assert start == 0.375 and sched[0] == 0.375


@pytest.mark.slow
def test_sample_turbo_runs_ode_and_sde(params, batch):
    enc, _, ctx = dit.prepare_condition(
        params, CFG, max_refer_count=2,
        silence_latent=batch["silence_latent"],
        **{k: batch[k] for k in (
            "text_hidden_states", "text_attention_mask", "lyric_hidden_states",
            "lyric_attention_mask", "refer_audio_packed", "refer_order_mask",
            "src_latents", "chunk_masks", "is_covers")},
    )
    cond = ConditionSet.build(params, CFG, enc, ctx)
    noise = jax.random.normal(jax.random.PRNGKey(7), (B, T, CFG.audio_acoustic_hidden_dim))
    sched = build_turbo_schedule(3.0)[:3]
    x = sample_turbo(params, CFG, x_init=noise, schedule=sched, cond=cond)
    assert x.shape == noise.shape and bool(jnp.isfinite(x).all())
    x2 = sample_turbo(params, CFG, x_init=noise, schedule=sched, cond=cond,
                      infer_method="sde", key=jax.random.PRNGKey(8))
    assert bool(jnp.isfinite(x2).all())
    # determinism
    x3 = sample_turbo(params, CFG, x_init=noise, schedule=sched, cond=cond)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x3))


def test_sample_guided_cfg(params, batch):
    enc, _, ctx = dit.prepare_condition(
        params, CFG, max_refer_count=2,
        silence_latent=batch["silence_latent"],
        **{k: batch[k] for k in (
            "text_hidden_states", "text_attention_mask", "lyric_hidden_states",
            "lyric_attention_mask", "refer_audio_packed", "refer_order_mask",
            "src_latents", "chunk_masks", "is_covers")},
    )
    cond = ConditionSet.build(params, CFG, enc, ctx)
    null_enc = jnp.broadcast_to(params["null_condition_emb"], enc.shape)
    null_cond = ConditionSet.build(params, CFG, null_enc, ctx)
    noise = jax.random.normal(jax.random.PRNGKey(9), (B, T, CFG.audio_acoustic_hidden_dim))
    sched = build_continuous_schedule(4, shift=3.0)
    x = sample_guided(params, CFG, x_init=noise, schedule=sched, cond=cond,
                      null_cond=null_cond, guidance_scale=7.0)
    assert x.shape == noise.shape and bool(jnp.isfinite(x).all())
    x_adg = sample_guided(params, CFG, x_init=noise, schedule=sched, cond=cond,
                          null_cond=null_cond, guidance_scale=7.0, use_adg=True)
    assert bool(jnp.isfinite(x_adg).all())


def test_training_loss(params, batch):
    loss = dit.training_loss(
        params, CFG, jax.random.PRNGKey(11),
        hidden_states=batch["src_latents"],
        attention_mask=jnp.ones((B, T)),
        max_refer_count=2,
        silence_latent=batch["silence_latent"],
        **{k: batch[k] for k in (
            "text_hidden_states", "text_attention_mask", "lyric_hidden_states",
            "lyric_attention_mask", "refer_audio_packed", "refer_order_mask",
            "src_latents", "chunk_masks", "is_covers")},
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


@pytest.mark.slow
def test_training_loss_grads(params, batch):
    def loss_fn(p):
        return dit.training_loss(
            p, CFG, jax.random.PRNGKey(12),
            hidden_states=batch["src_latents"],
            attention_mask=jnp.ones((B, T)),
            max_refer_count=2,
            silence_latent=batch["silence_latent"],
            **{k: batch[k] for k in (
                "text_hidden_states", "text_attention_mask", "lyric_hidden_states",
                "lyric_attention_mask", "refer_audio_packed", "refer_order_mask",
                "src_latents", "chunk_masks", "is_covers")},
        )

    g = jax.grad(loss_fn)(params)
    gnorm = jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda x: float(jnp.sum(x * x)), g))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_decoder_unrolled_matches_scan(params, batch):
    """cfg.unroll_layers swaps the lax.scan layer loop for static
    per-layer slices; the dense-path forward must match, with and
    without the precomputed cross-KV cache, and remat must fall back
    to the scan (the flash pairing is covered by test_dit_flash_path
    on the scan path and shares layer_apply with the unroll)."""
    import dataclasses

    enc, mask, ctx = dit.prepare_condition(
        params, CFG, max_refer_count=2,
        silence_latent=batch["silence_latent"],
        **{k: batch[k] for k in (
            "text_hidden_states", "text_attention_mask", "lyric_hidden_states",
            "lyric_attention_mask", "refer_audio_packed", "refer_order_mask",
            "src_latents", "chunk_masks", "is_covers")},
    )
    xt = jax.random.normal(jax.random.PRNGKey(6),
                           (B, T, CFG.audio_acoustic_hidden_dim))
    t = jnp.full((B,), 0.5)
    cfg_u = dataclasses.replace(CFG, unroll_layers=True)
    ref = dit.dit_decoder(params, CFG, xt, t, t, ctx,
                          encoder_hidden_states=enc)
    out = dit.dit_decoder(params, cfg_u, xt, t, t, ctx,
                          encoder_hidden_states=enc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    kv = dit.decoder_cross_kv(params, CFG, enc)
    out_kv = dit.dit_decoder(params, cfg_u, xt, t, t, ctx, cross_kv_cache=kv)
    np.testing.assert_allclose(np.asarray(out_kv), np.asarray(ref), atol=1e-5)
    # remat requests fall back to the scan (training path unchanged)
    out_remat = dit.dit_decoder(params, cfg_u, xt, t, t, ctx,
                                encoder_hidden_states=enc, remat=True)
    np.testing.assert_allclose(np.asarray(out_remat), np.asarray(ref),
                               atol=1e-5)
