"""End-to-end pipeline tests on tiny configs (structural, CPU).

Mirrors the reference's mock-heavy handler tests (SURVEY §4) but drives the
REAL model stack end-to-end with tiny geometry instead of mocking it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.pipeline.handler import AceStepHandler


@pytest.fixture(scope="module")
def handler():
    h = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        # latent channels must match the DiT's 64-dim acoustic space
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        dtype=jnp.float32,
        frame_bucket=20, min_frames=20, refer_frames=10,
    )
    h.initialize_service(seed=0)
    return h


def test_text2music_runs_and_shapes(handler):
    res = handler.generate_music(
        "an upbeat synthpop song", "la la la",
        audio_duration=20 / 25,  # 20 frames
        seeds=7,
    )
    assert len(res.audios) == 1
    T = res.extra["frames"]
    assert res.pred_latents.shape == (1, T, 64)
    # tiny VAE hop=8: audio frames = T*8... but handler crops to T_req*VAE_HOP
    assert res.audios[0].ndim == 2 and res.audios[0].shape[1] == 2
    assert np.all(np.isfinite(res.audios[0]))
    assert res.seeds == [7]
    assert "diffusion_time_cost" in res.time_costs


def test_same_seed_deterministic(handler):
    kw = dict(audio_duration=0.8, seeds=123, normalize=False)
    a = handler.generate_music("song A", "x", **kw)
    b = handler.generate_music("song A", "x", **kw)
    np.testing.assert_array_equal(a.pred_latents, b.pred_latents)


def test_different_seeds_differ(handler):
    kw = dict(audio_duration=0.8, normalize=False)
    a = handler.generate_music("song A", "x", seeds=1, **kw)
    b = handler.generate_music("song A", "x", seeds=2, **kw)
    assert not np.allclose(a.pred_latents, b.pred_latents)


def test_batch_generation(handler):
    res = handler.generate_music(
        ["song A", "song B"], ["la", "da"], audio_duration=0.8,
        seeds=[1, 2],
    )
    assert len(res.audios) == 2
    assert res.pred_latents.shape[0] == 2
    assert not np.allclose(res.pred_latents[0], res.pred_latents[1])


def test_cover_via_audio_codes(handler):
    codes = "".join(f"<|audio_code_{i * 100}|>" for i in range(4))
    res = handler.generate_music(
        "cover song", "la", audio_code_hints=codes, audio_duration=0.8,
        seeds=5,
    )
    assert res.extra["task"] == "cover"
    assert np.all(np.isfinite(res.pred_latents))


@pytest.mark.slow
def test_tier_duration_ceiling_applies_to_derived_lengths(handler):
    """The tier max-duration guard must clamp lengths derived from src
    audio or code hints, not only explicit audio_duration — the jitted
    diffusion program has no OOM ladder to catch the overshoot."""
    import dataclasses

    from acestep_tpu.runtime_config import get_tier_config

    orig = handler.tier
    try:
        handler.tier = dataclasses.replace(
            get_tier_config(8.0), max_duration_s=1.6)   # 40 latent frames
        # src audio 4x over the ceiling (tiny VAE hop=8 samples/frame)
        hop = handler.vae_cfg.hop_length
        src = np.zeros((int(4 * 1.6 * 25) * hop, 2), np.float32)
        res = handler.generate_music("cover it", "la", src_audio=src,
                                     task="cover", seeds=1)
        assert res.extra["frames"] <= int(1.6 * 25)
        # code hints over the ceiling clamp the same way
        n_codes = int(4 * 1.6 * 25) // handler.cfg.pool_window_size
        codes = "".join(f"<|audio_code_{i % 50}|>" for i in range(n_codes))
        res = handler.generate_music("cover it", "la",
                                     audio_code_hints=codes, seeds=1)
        assert res.extra["frames"] <= int(1.6 * 25)
    finally:
        handler.tier = orig


def test_mixed_code_hint_batch_roundtrips_hintless_rows(handler):
    """A batch where only SOME rows carry code hints: per the reference,
    every row under the cover task is is_cover=True, but a hint-less row's
    LM hints come from the tokenize-roundtrip of its OWN src/silence
    (conditioning_target.py:42 decodes hints per row) — NOT from
    detokenizing its all-zero padding in the batched codes matrix."""
    codes = "".join(f"<|audio_code_{i * 10}|>" for i in range(4))
    codes_b = "".join(f"<|audio_code_{i * 11 + 3}|>" for i in range(4))
    kw = dict(audio_duration=0.8, normalize=False)
    res = handler.generate_music(
        ["with codes", "without codes"], ["la", "la"],
        audio_code_hints=[codes, None], seeds=[1, 2], batch_size=2, **kw)
    assert res.extra["task"] == "cover"          # batch-level auto-switch
    assert res.extra["is_covers"] == [True, True]
    assert np.all(np.isfinite(res.pred_latents))
    # the hint-less row is conditioned on silence hints of its own — fully
    # independent of what codes the OTHER row carries (the dit-level test
    # pins the silence semantics itself)
    res2 = handler.generate_music(
        ["with codes", "without codes"], ["la", "la"],
        audio_code_hints=[codes_b, None], seeds=[1, 2], batch_size=2, **kw)
    np.testing.assert_array_equal(res.pred_latents[1], res2.pred_latents[1])
    assert not np.allclose(res.pred_latents[0], res2.pred_latents[0])


def test_unspecified_duration_is_random_10_to_120s(handler, monkeypatch):
    """Reference padding_utils.py:78-81: no duration, no src, no codes ->
    a random 10-120 s song, not a fixed default."""
    import random as _random

    drawn = {}

    def fake_uniform(a, b):
        drawn["range"] = (a, b)
        return 11.0

    monkeypatch.setattr(_random, "uniform", fake_uniform)
    res = handler.generate_music("surprise me", "la", seeds=1)
    assert drawn["range"] == (10.0, 120.0)
    assert res.extra["frames"] == int(11.0 * 25)


def test_text2music_ignores_src_audio(handler):
    """Reference generate_music_request.py:118: text2music does not use
    src_audio — and codes win over src when both are present (:121)."""
    hop = handler.vae_cfg.hop_length
    src = np.random.RandomState(1).randn(20 * hop, 2).astype(np.float32)
    kw = dict(audio_duration=0.8, seeds=11, normalize=False)
    pure = handler.generate_music("a song", "la", **kw)
    with_src = handler.generate_music("a song", "la", src_audio=src, **kw)
    np.testing.assert_array_equal(with_src.pred_latents, pure.pred_latents)
    # codes + src: identical to codes alone (src is ignored, not encoded)
    codes = "".join(f"<|audio_code_{i * 7}|>" for i in range(4))
    a = handler.generate_music("a song", "la", audio_code_hints=codes, **kw)
    b = handler.generate_music("a song", "la", audio_code_hints=codes,
                               src_audio=src, **kw)
    np.testing.assert_array_equal(b.pred_latents, a.pred_latents)


def test_repaint_span(handler):
    # 20 frames at hop 1920/48k: repaint seconds map via SAMPLE_RATE//VAE_HOP
    res = handler.generate_music(
        "repaint", "la", task="repaint", audio_duration=0.8,
        repainting_start=0.0, repainting_end=0.3, seeds=3,
    )
    kind, s, e = res.extra["spans"][0]
    assert kind == "repainting"
    assert 0 <= s < e <= res.pred_latents.shape[1]


def test_per_item_repaint_spans(handler):
    """Reference service API takes per-item repaint lists
    (service_generate_request.py:86-101, conditioning_masks.py:35-64):
    each row gets its own span; a None row keeps the full span."""
    res = handler.generate_music(
        ["fix head", "fix tail", "leave alone"], ["la"] * 3,
        task="repaint", audio_duration=0.8, batch_size=3,
        repainting_start=[0.0, 0.4, None],
        repainting_end=[0.4, 0.8, None], seeds=[1, 2, 3])
    assert res.extra["spans"][0] == ("repainting", 0, 10)
    assert res.extra["spans"][1] == ("repainting", 10, 20)
    assert res.extra["spans"][2][0] == "full"
    assert np.all(np.isfinite(res.pred_latents))


def test_track_instructions_match_reference_formatting():
    """The model is trained on the reference's exact instruction strings:
    UPPERCASED track names/classes, ' | ' separators, and no membership
    gate on track_name (reference task_utils.py:66-100)."""
    from acestep_tpu.pipeline import text as textlib

    assert textlib.resolve_instruction("extract", track_name="vocals") == \
        "Extract the VOCALS track from the audio:"
    assert textlib.resolve_instruction("lego", track_name="guitar") == \
        "Generate the GUITAR track based on the audio context:"
    assert textlib.resolve_instruction(
        "complete", track_classes=["drums", "bass"]) == \
        "Complete the input track with DRUMS | BASS:"
    # arbitrary names format rather than silently falling to the default
    assert "THEREMIN" in textlib.resolve_instruction(
        "extract", track_name="theremin")
    assert textlib.resolve_instruction("extract") == \
        "Extract the track from the audio:"


def test_repaint_outpainting_extends_timeline(handler):
    """Reference padding_utils.py:37-67: a negative repainting_start
    extends the song left of the src audio, an end past the src duration
    extends it right; the repaint span shifts into the padded timeline so
    only the NEW material regenerates."""
    hop = handler.vae_cfg.hop_length
    src = np.random.RandomState(0).randn(20 * hop, 2).astype(np.float32) * .1

    # extend LEFT by 0.8 s (20 frames): new span covers only the new head
    res = handler.generate_music(
        "intro extension", "la", src_audio=src, task="repaint",
        repainting_start=-0.8, repainting_end=0.0, seeds=3)
    assert res.extra["frames"] == 40            # 20 new + 20 src
    assert res.extra["spans"][0] == ("repainting", 0, 20)

    # extend RIGHT to 1.6 s: span covers only the new tail
    res = handler.generate_music(
        "outro extension", "la", src_audio=src, task="repaint",
        repainting_start=0.8, repainting_end=1.6, seeds=3)
    assert res.extra["frames"] == 40
    assert res.extra["spans"][0] == ("repainting", 20, 40)

    # a negative end means "to the end of the source" (no extension)
    res = handler.generate_music(
        "tail repaint", "la", src_audio=src, task="repaint",
        repainting_start=0.4, repainting_end=-1, seeds=3)
    assert res.extra["frames"] == 20
    assert res.extra["spans"][0] == ("repainting", 10, 20)


@pytest.mark.slow
def test_refer_audio_conditioning(handler):
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal((handler.vae_cfg.hop_length * 12, 2)) * 0.1
           ).astype(np.float32)
    a = handler.generate_music("with ref", "la", refer_audios=ref,
                               audio_duration=0.8, seeds=9, normalize=False)
    b = handler.generate_music("with ref", "la", audio_duration=0.8, seeds=9,
                               normalize=False)
    assert not np.allclose(a.pred_latents, b.pred_latents)


def test_invalid_infer_method_rejected(handler):
    """Unknown sampler methods fail loudly (reference diffusion.py) rather
    than silently falling back to ODE."""
    with pytest.raises(ValueError, match="infer_method"):
        handler.generate_music("x", "la", audio_duration=0.8,
                               infer_method="euler", seeds=1)


def test_short_reference_audio_loops_to_budget(handler):
    """Reference io_audio.py:92-93 tiles short reference audio to the 30 s
    timbre budget — silence-padding would dilute the timbre signal."""
    sr = 48000
    short = np.random.RandomState(2).randn(sr * 2, 2).astype(np.float32) * .1
    out = handler._sample_reference_segments(short)
    assert out.shape[0] == 30 * sr
    np.testing.assert_array_equal(out[: sr * 2], short)   # looped content
    np.testing.assert_array_equal(out[sr * 2: sr * 4], short)
    # long audio still samples head/middle/tail
    long = np.random.RandomState(3).randn(sr * 45, 2).astype(np.float32)
    out2 = handler._sample_reference_segments(long)
    assert out2.shape[0] == 30 * sr
    np.testing.assert_array_equal(out2[: sr * 10], long[: sr * 10])


def test_silent_reference_audio_rejected(handler):
    """Reference generate_music_request.py:99-110: a silent/empty
    reference upload fails the request with an explicit message instead
    of silently conditioning on nothing."""
    silent = np.zeros((handler.vae_cfg.hop_length * 12, 2), np.float32)
    with pytest.raises(ValueError, match="silent"):
        handler.generate_music("with ref", "la", refer_audios=silent,
                               audio_duration=0.8, seeds=9)


def test_save_audio(handler, tmp_path):
    res = handler.generate_music("save me", "la", audio_duration=0.8, seeds=1,
                                 save_dir=str(tmp_path))
    assert res.audio_paths and res.audio_paths[0].endswith(".wav")
    import wave
    with wave.open(res.audio_paths[0], "rb") as f:
        assert f.getnchannels() == 2


def test_uninitialized_raises():
    h = AceStepHandler(dit_config=DiTConfig.tiny(fsq_dim=64),
                       vae_config=VAEConfig.tiny())
    with pytest.raises(RuntimeError):
        h.generate_music("x", "y")


def test_audio_cover_strength_non_cover_branch(handler):
    codes = "".join(f"<|audio_code_{i}|>" for i in range(4))
    res = handler.generate_music(
        "partial cover", "la", audio_code_hints=codes,
        audio_cover_strength=0.5, audio_duration=0.8, seeds=4,
    )
    assert np.all(np.isfinite(res.pred_latents))


@pytest.fixture(scope="module")
def base_handler():
    h = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64, model_version="base"),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        dtype=jnp.float32,
        frame_bucket=20, min_frames=20, refer_frames=10,
    )
    h.initialize_service(seed=0)
    return h


def test_base_model_guided_sampler(base_handler):
    res = base_handler.generate_music(
        "orchestral swell", "[inst]", audio_duration=0.8, seeds=5,
        infer_steps=4, guidance_scale=4.0)
    assert np.isfinite(res.audios[0]).all()
    # APG guidance variant
    res2 = base_handler.generate_music(
        "orchestral swell", "[inst]", audio_duration=0.8, seeds=5,
        infer_steps=4, guidance_scale=4.0, use_adg=True)
    assert np.isfinite(res2.audios[0]).all()


@pytest.mark.slow
def test_sft_custom_timesteps():
    h = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64, model_version="sft"),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        dtype=jnp.float32,
        frame_bucket=20, min_frames=20, refer_frames=10,
    )
    h.initialize_service(seed=0)
    res = h.generate_music(
        "piano etude", "[inst]", audio_duration=0.8, seeds=3,
        timesteps=[0.97, 0.76, 0.5, 0.28, 0.085], guidance_scale=3.0)
    assert np.isfinite(res.audios[0]).all()
    assert len(res.extra["schedule"]) == 6          # appended terminal 0.0
    assert res.extra["schedule"][-1] == 0.0


def test_warmup_compiles_buckets(handler):
    timings = handler.warmup(durations=(0.8,), batch_sizes=(1,),
                             infer_steps=4)
    assert "b1_d0" in timings and timings["b1_d0"] >= 0


def test_invalid_code_hints_ignored(handler):
    """Junk hint strings must not crash or silently engage cover mode."""
    res = handler.generate_music("song", "la", audio_code_hints="no codes here",
                                 audio_duration=0.8, seeds=1)
    assert res.extra["task"] == "text2music"
    assert np.all(np.isfinite(res.pred_latents))


def test_short_list_params_broadcast(handler):
    res = handler.generate_music(
        ["a", "b"], ["la", "da"], vocal_languages=["en"],
        audio_duration=0.8, seeds=[1, 2])
    assert len(res.audios) == 2


def test_repaint_resolves_task_instruction(handler):
    res = handler.generate_music(
        "fix the middle", "la", task="repaint", audio_duration=0.8,
        repainting_start=0.0, repainting_end=0.3, seeds=2)
    assert res.extra["task"] == "repaint"


def test_oom_degradation_ladder(handler, monkeypatch):
    """RESOURCE_EXHAUSTED during decode walks the ladder (halve groups,
    then the window) and still completes (reference vae_decode_chunks
    OOM fallback)."""
    calls = []
    real_decode_fn = handler._decode_fn

    def fake_decode_fn(shape, chunk, groups):
        calls.append((chunk, groups))
        if len(calls) < 3:       # first two plans "OOM"
            def boom(p, z):
                raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory "
                                   "allocating 1.0G")
            return boom
        return real_decode_fn(shape, chunk, groups)

    monkeypatch.setattr(handler, "_decode_fn", fake_decode_fn)
    z = np.zeros((1, 40, 64), np.float32)
    audio = handler.decode_latents(z)
    assert audio.shape[0] == 1 and np.all(np.isfinite(audio))
    # ladder: same chunk smaller groups first, then smaller chunk
    assert len(calls) == 3
    assert calls[1][1] < calls[0][1] or calls[1][0] < calls[0][0]


def test_oom_ladder_reraises_non_oom(handler, monkeypatch):
    def fake_decode_fn(shape, chunk, groups):
        def boom(p, z):
            raise RuntimeError("INVALID_ARGUMENT: shape mismatch")
        return boom

    monkeypatch.setattr(handler, "_decode_fn", fake_decode_fn)
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        handler.decode_latents(np.zeros((1, 40, 64), np.float32))


def test_tier_caps_decode_plan(handler):
    from acestep_tpu.runtime_config import get_tier_config

    orig = handler.tier
    try:
        handler.tier = get_tier_config(8.0)     # small-HBM tier
        chunk, _ = handler._decode_plan(4000)
        assert chunk <= handler.tier.decode_chunk
    finally:
        handler.tier = orig


def test_int16_wire_format_matches_exact_transfer(handler):
    """The int16+peak device->host wire format reconstructs audio to
    16-bit precision relative to the per-item peak (what a 16-bit export
    keeps); ACESTEP_EXACT_AUDIO_TRANSFER=1 restores exact f32."""
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, 40, 64)).astype(np.float32)

    assert not handler._exact_transfer
    quantized = handler.decode_latents(z)
    try:
        handler._exact_transfer = True
        exact = handler.decode_latents(z)
    finally:
        handler._exact_transfer = False

    assert quantized.shape == exact.shape
    assert quantized.dtype == np.float32
    peak = np.abs(exact).max(axis=(1, 2), keepdims=True)
    err = np.abs(quantized - exact)
    # within one quantization step of the int16 grid (plus bf16 noise floor)
    assert np.all(err <= peak / 32767.0 + 1e-6), err.max()


def test_segmented_decode_matches_whole(handler):
    """Long-song segmented decode (overlapped dispatch/transfer) equals the
    single-program decode away from the int16 quantization floor."""
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, 120, 64)).astype(np.float32)

    whole = handler.decode_latents(z)
    orig = handler._seg_frames
    try:
        handler._seg_frames = 40      # force 3 segments
        seg = handler.decode_latents(z)
    finally:
        handler._seg_frames = orig

    assert seg.shape == whole.shape
    peak = np.abs(whole).max()
    # global signal edges see zero-pad context instead of true conv boundary
    # handling (the documented tiled-decode edge convention); the interior —
    # including the inter-segment joins, which carry real margin context —
    # must match to the int16 quantization floor
    hop = handler.vae_cfg.hop_length
    edge = 16 * hop
    interior = np.abs(seg - whole)[:, edge:-edge]
    assert np.max(interior) <= 4 * peak / 32767.0, np.max(interior)
    assert np.all(np.isfinite(seg))


def test_batch_group_decode_matches_whole(handler):
    """Batch-axis decode groups (overlapped dispatch/transfer) are exact:
    items are independent, so grouping must reproduce the whole-batch
    result to the int16 quantization floor."""
    rng = np.random.default_rng(2)
    z = rng.standard_normal((4, 30, 64)).astype(np.float32)

    whole = handler.decode_latents(z)
    orig = handler._seg_frames
    try:
        handler._seg_frames = 60      # 4*30=120 frames >= 60 -> 2 groups
        grouped = handler.decode_latents(z)
    finally:
        handler._seg_frames = orig

    assert grouped.shape == whole.shape
    peak = np.abs(whole).max(axis=(1, 2), keepdims=True)
    assert np.all(np.abs(grouped - whole) <= 2 * peak / 32767.0 + 1e-7)


def test_prepare_seeds_single_seed_varies_batch():
    """Reference task_utils semantics: a single fixed seed pins item 0 and
    the rest are random (replication would render identical songs); short
    lists pad with random instead of cycling."""
    from acestep_tpu.pipeline.text import prepare_seeds

    out = prepare_seeds(4, 7)
    assert out[0] == 7
    assert len(set(out)) > 1          # items 1..3 are random, not copies
    out2 = prepare_seeds(4, [5, 6])
    assert out2[:2] == [5, 6]
    assert out2[2] != 5 or out2[3] != 6   # padded random, not cycled
    assert prepare_seeds(3, [1, 2, 3]) == [1, 2, 3]


def test_dev_const_cache_lru_byte_cap():
    """Device-constant cache evicts by BYTES in LRU order: a hit must
    refresh recency, and inserting past the cap evicts the coldest
    entry, never unbounded growth (round-4 review finding: a count cap
    let ~2 GB of silence broadcasts pin HBM on 16 GB tiers)."""
    h = AceStepHandler(dit_config=DiTConfig.tiny())
    h.silence_latent = np.zeros((1, 64, h.cfg.audio_acoustic_hidden_dim),
                                np.float32)
    one = 4 * 32 * h.cfg.audio_acoustic_hidden_dim * 4   # bytes per entry
    h._dev_const_cap = 3 * one
    a = h._dev_ones(4, 32)
    h._dev_silence(4, 32)
    h._dev_ones(8, 16)                    # same bytes, distinct key
    assert len(h._dev_const) == 3
    # touch the oldest -> it becomes most-recent
    assert h._dev_ones(4, 32) is a
    h._dev_ones(16, 8)                    # evicts the NEW oldest (silence)
    assert ("sil", 4, 32) not in h._dev_const
    assert ("ones", 4, 32) in h._dev_const
    assert h._dev_const_bytes <= h._dev_const_cap
    # clearing resets the byte ledger
    h._clear_dev_const()
    assert h._dev_const_bytes == 0 and not h._dev_const
    # an entry larger than the cap still caches (cache never refuses),
    # after evicting everything else
    h._dev_ones(4, 32)
    big = h._dev_ones(64, 64)
    assert big.shape == (64, 64, h.cfg.audio_acoustic_hidden_dim)
    assert ("ones", 4, 32) not in h._dev_const


def test_decode_latents_device_resident_input(handler):
    """decode_latents accepts a device-resident jax.Array (the diffusion
    stage's hand-off) and must produce exactly what the host-numpy input
    does — including on the segmented long-song path, whose slicing/
    padding then runs on device."""
    rng = np.random.default_rng(7)
    z = rng.standard_normal((1, 120, 64)).astype(np.float32)

    host = handler.decode_latents(z)
    dev = handler.decode_latents(jnp.asarray(z))
    np.testing.assert_array_equal(np.asarray(dev), host)

    orig = handler._seg_frames
    try:
        handler._seg_frames = 40      # force 3 segments
        host_seg = handler.decode_latents(z)
        dev_seg = handler.decode_latents(jnp.asarray(z))
    finally:
        handler._seg_frames = orig
    np.testing.assert_array_equal(np.asarray(dev_seg), host_seg)


def test_empty_sequence_code_hint_is_no_hint(handler):
    """An empty SEQUENCE hint parses as 'no hint' like None/'' (round-4
    review pin): a batch of only-empty hints must stay text2music, and a
    mixed batch follows the reference per-row rule (instruction-derived
    is_cover OR has_code_hint, conditioning_masks.py:59 — under a cover
    task the no-hint row is still instruction-classified as cover)."""
    assert handler._parse_code_hint([]) is None
    assert handler._parse_code_hint(()) is None
    res = handler.generate_music(["song"], ["la"], audio_code_hints=[[]],
                                 audio_duration=0.8)
    assert res.extra["task"] == "text2music"
    assert res.extra["is_covers"] == [False]
    res2 = handler.generate_music(
        ["song a", "song b"], ["la", "la"],
        audio_code_hints=["<|audio_code_5|><|audio_code_6|>", []],
        audio_duration=0.8)
    assert res2.extra["task"] == "cover"
    assert np.all(np.isfinite(res2.pred_latents))
    assert res2.extra["is_covers"] == [True, True]


@pytest.mark.slow
def test_text_encoder_wiring(monkeypatch, tmp_path):
    """initialize_service must construct the Qwen3-Embedding text encoder
    when its checkpoint resolves (round-4 review pin: QwenTextEmbedder was
    fully implemented but UNREACHABLE — real-checkpoint inference silently
    conditioned on hash embeddings), and fall back to hash otherwise."""
    import acestep_tpu.llm.tokenizer as tok_mod
    import acestep_tpu.utils.checkpoint as ckpt_mod
    from acestep_tpu.config import LMConfig
    from acestep_tpu.llm.tokenizer import SimpleTokenizer
    from acestep_tpu.models.lm import init_lm_params
    from acestep_tpu.pipeline.embedder import (HashTextEmbedder,
                                               QwenTextEmbedder)

    lm_cfg = LMConfig.tiny()
    lm_params = init_lm_params(jax.random.PRNGKey(0), lm_cfg)
    monkeypatch.setenv("ACESTEP_TEXT_ENCODER_DIR", str(tmp_path))
    monkeypatch.setattr(LMConfig, "from_checkpoint",
                        classmethod(lambda cls, d: lm_cfg))
    monkeypatch.setattr(ckpt_mod, "load_lm_checkpoint",
                        lambda d, c, dt: lm_params)
    monkeypatch.setattr(tok_mod, "load_hf_tokenizer",
                        lambda d: SimpleTokenizer(num_audio_codes=8))

    h = AceStepHandler(dit_config=DiTConfig.tiny(fsq_dim=64),
                       vae_config=VAEConfig.tiny(decoder_input_channels=64),
                       dtype=jnp.float32,
                       frame_bucket=20, min_frames=20, refer_frames=10)
    h.initialize_service(seed=0)
    assert isinstance(h.text_embedder, QwenTextEmbedder)

    # loader failure -> hash fallback, not a crash
    monkeypatch.setattr(ckpt_mod, "load_lm_checkpoint",
                        lambda d, c, dt: (_ for _ in ()).throw(OSError("x")))
    h2 = AceStepHandler(dit_config=DiTConfig.tiny(fsq_dim=64),
                        vae_config=VAEConfig.tiny(decoder_input_channels=64),
                        dtype=jnp.float32,
                        frame_bucket=20, min_frames=20, refer_frames=10)
    h2.initialize_service(seed=0)
    assert isinstance(h2.text_embedder, HashTextEmbedder)

    # no env var, no checkpoint_dir -> hash, no resolution attempted
    monkeypatch.delenv("ACESTEP_TEXT_ENCODER_DIR")
    h3 = AceStepHandler(dit_config=DiTConfig.tiny(fsq_dim=64),
                        vae_config=VAEConfig.tiny(decoder_input_channels=64),
                        dtype=jnp.float32,
                        frame_bucket=20, min_frames=20, refer_frames=10)
    h3.initialize_service(seed=0)
    assert isinstance(h3.text_embedder, HashTextEmbedder)


def test_repaint_empty_list_means_no_repaint(handler):
    """repainting_start=[] must behave like None, not crash row 0."""
    res = handler.generate_music(
        "plain", "la", task="repaint", audio_duration=0.8,
        repainting_start=[], repainting_end=[], seeds=5)
    assert res.extra["spans"][0][0] == "full"


def test_mixed_batch_outpaint_keeps_other_rows_spans(handler):
    """One row extending the timeline left must not widen another row's
    implicit span onto the foreign padding: a None coordinate means the
    start/end of THAT row's source, pinned before the pad shift."""
    hop = handler.vae_cfg.hop_length
    src = np.random.RandomState(0).randn(20 * hop, 2).astype(np.float32) * .1
    res = handler.generate_music(
        ["extend intro", "repaint head"], ["la"] * 2,
        src_audio=src, task="repaint", batch_size=2,
        repainting_start=[-0.8, None],       # row0: +0.8 s left pad
        repainting_end=[0.0, 0.4],           # row1: repaint src 0-0.4 s
        seeds=[1, 2])
    assert res.extra["frames"] == 40         # 20 pad + 20 src
    # row0 repaints exactly the new 20-frame head
    assert res.extra["spans"][0] == ("repainting", 0, 20)
    # row1's implicit start is ITS source start (frame 20 after the
    # shift), and 0.4 s of source = 10 frames
    assert res.extra["spans"][1] == ("repainting", 20, 30)
