"""Scoring tests: DTW, aligner, LRC, alignment score, PMI, handler LRC."""

import numpy as np
import pytest

from acestep_tpu.scoring import (
    MusicStampsAligner,
    calculate_reward_score,
    dtw,
    format_lrc,
    lyric_alignment_score,
    median_filter,
)
from acestep_tpu.scoring.alignment import SentenceTimestamp, preprocess_attention


def test_dtw_identity_diagonal():
    # diagonal-dominant cost => diagonal path
    n = 8
    cost = np.ones((n, n), np.float32)
    np.fill_diagonal(cost, 0.0)
    text_idx, time_idx = dtw(cost)
    assert text_idx[0] == 0 and time_idx[0] == 0
    assert text_idx[-1] == n - 1 and time_idx[-1] == n - 1
    on_diag = sum(1 for a, b in zip(text_idx, time_idx) if a == b)
    assert on_diag == n


def test_dtw_monotonic_rectangular():
    cost = np.random.default_rng(0).random((5, 12)).astype(np.float32)
    text_idx, time_idx = dtw(cost)
    assert (np.diff(text_idx) >= 0).all()
    assert (np.diff(time_idx) >= 0).all()
    assert text_idx[-1] == 4 and time_idx[-1] == 11


def test_median_filter_removes_spikes():
    x = np.zeros((3, 20), np.float32)
    x[:, 10] = 100.0
    y = median_filter(x, 5)
    assert y.max() == 0.0
    assert median_filter(x, 1) is x


def _synthetic_capture(n_tokens=10, n_frames=40, lyric_len=10, heads=2):
    """Attention concentrated on a monotonic diagonal band."""
    attn = np.full((n_frames, lyric_len + 6), 1e-4, np.float32)
    for f in range(n_frames):
        tok = min(int(f / n_frames * n_tokens), n_tokens - 1)
        attn[f, tok] = 1.0
    attn /= attn.sum(-1, keepdims=True)
    probs = np.tile(attn[None, None], (1, heads, 1, 1))
    return {2: probs, 5: probs}


def test_aligner_monotonic_lrc():
    captured = _synthetic_capture()
    token_strs = list("abcd\nefgh\n")
    aligner = MusicStampsAligner(patch_size=2)
    tokens, sentences, lrc = aligner.get_timestamps_and_lrc(
        captured, token_strs, lyric_len=10)
    assert len(tokens) == 10
    # timestamps monotonic
    starts = [t.start for t in tokens]
    assert all(b >= a for a, b in zip(starts, starts[1:]))
    assert len(sentences) == 2
    assert sentences[0].text == "abcd"
    assert lrc.splitlines()[0].startswith("[00:0")
    # second sentence starts later
    assert sentences[1].start >= sentences[0].start


def test_alignment_score_good_vs_noise():
    good = lyric_alignment_score(_synthetic_capture(), lyric_len=10)
    rng = np.random.default_rng(0)
    noise_map = rng.random((1, 2, 40, 16)).astype(np.float32)
    noise_map /= noise_map.sum(-1, keepdims=True)
    noisy = lyric_alignment_score({2: noise_map}, lyric_len=10)
    assert good["score"] > noisy["score"]
    assert 0.0 <= noisy["score"] <= 1.0 <= good["score"] + 1e-6 or \
        good["score"] <= 1.0


def test_format_lrc_times():
    sentences = [SentenceTimestamp(text="hello", start=61.25, end=63.0)]
    assert format_lrc(sentences) == "[01:01.25]hello"


def test_pmi_reward_score_prefers_condition():
    """With a tiny random LM the PMI should at least run end-to-end and
    produce symmetric results for identical prompts."""
    from acestep_tpu.llm.handler import LLMHandler

    handler = LLMHandler()
    handler.initialize()   # tiny random LM + simple tokenizer
    codes = "".join(f"<|audio_code_{i}|>" for i in range(10))
    out = calculate_reward_score(handler, codes, caption="energetic rock")
    assert set(out) >= {"pmi", "score", "num_codes"}
    assert 0.0 <= out["score"] <= 1.0
    # identical cond == uncond prompt -> pmi exactly 0
    out2 = calculate_reward_score(handler, codes, caption="NO USER INPUT")
    assert abs(out2["pmi"]) < 1e-3


@pytest.mark.slow
def test_handler_generate_lrc_smoke():
    from acestep_tpu.config import DiTConfig, VAEConfig
    from acestep_tpu.pipeline.handler import AceStepHandler

    handler = AceStepHandler(dit_config=DiTConfig.tiny(),
                             vae_config=VAEConfig.tiny(),
                             frame_bucket=16, min_frames=16)
    handler.initialize_service()
    T = 16
    pred = np.random.default_rng(0).standard_normal(
        (T, handler.cfg.audio_acoustic_hidden_dim)).astype(np.float32)
    out = handler.generate_lrc(pred, "a happy song", "la la\nla la",
                               capture={0: [0], 1: [0]})
    assert "lrc" in out and isinstance(out["lrc"], str)
    assert out["score"]["score"] >= 0.0
    assert len(out["tokens"]) > 0
