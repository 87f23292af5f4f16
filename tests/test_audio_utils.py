"""Audio IO / normalization / UUID tests (reference: audio_utils.py,
io_audio.py behaviors)."""

import numpy as np
import pytest

from acestep_tpu.utils.audio import (
    AudioSaver, generate_uuid_from_params, load_audio, load_wav,
    peak_normalize, resample, save_wav, to_channels,
)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((4800, 2)) * 0.1).astype(np.float32)
    p = tmp_path / "x.wav"
    save_wav(p, audio, 48000)
    back, sr = load_wav(p)
    assert sr == 48000
    assert back.shape == audio.shape
    np.testing.assert_allclose(back, audio, atol=1e-4)


def test_load_audio_resamples_and_stereo(tmp_path):
    rng = np.random.default_rng(1)
    mono = (rng.standard_normal((16000, 1)) * 0.1).astype(np.float32)
    p = tmp_path / "m.wav"
    save_wav(p, mono, 16000)
    out = load_audio(p, target_sr=48000, target_channels=2)
    assert out.shape[1] == 2
    assert abs(out.shape[0] - 48000) <= 4


def test_peak_normalize():
    audio = np.array([[0.5, -0.25]], np.float32).T @ np.ones((1, 2), np.float32)
    out = peak_normalize(audio, target_dbfs=-1.0)
    target = 10 ** (-1.0 / 20)
    assert abs(np.max(np.abs(out)) - target) < 1e-5
    silent = np.zeros((100, 2), np.float32)
    np.testing.assert_array_equal(peak_normalize(silent), silent)


def test_resample_length():
    x = np.ones((16000, 2), np.float32)
    y = resample(x, 16000, 48000)
    assert y.shape == (48000, 2)


def test_to_channels():
    x = np.ones((10, 1), np.float32)
    assert to_channels(x, 2).shape == (10, 2)
    y = np.ones((10, 2), np.float32)
    assert to_channels(y, 1).shape == (10, 1)
    # 5.1 -> stereo keeps the first two channels (reference io_audio.py:31)
    z = np.arange(60, dtype=np.float32).reshape(10, 6)
    out = to_channels(z, 2)
    np.testing.assert_array_equal(out, z[:, :2])


def test_load_audio_clamps_to_unit_range(tmp_path):
    """Reference io_audio.py:37: loaded audio is clamped to [-1, 1] (a
    resample can overshoot around hard transients)."""
    from acestep_tpu.utils.audio import load_audio, save_wav

    # square wave at full scale, then resample 44.1k -> 48k (overshoots)
    sq = np.tile(np.repeat(np.array([1.0, -1.0], np.float32), 50), 40)
    save_wav(str(tmp_path / "sq.wav"), np.stack([sq, sq], 1), 44100)
    out = load_audio(str(tmp_path / "sq.wav"))
    assert float(np.max(np.abs(out))) <= 1.0


def test_uuid_stable_and_distinct():
    a = generate_uuid_from_params({"caption": "x", "seed": 1})
    b = generate_uuid_from_params({"seed": 1, "caption": "x"})
    c = generate_uuid_from_params({"caption": "x", "seed": 2})
    assert a == b
    assert a != c
    assert len(a.split("-")) == 5


def test_audio_saver_wav(tmp_path):
    saver = AudioSaver(tmp_path)
    audio = np.zeros((1000, 2), np.float32)
    out = saver.save_audio(audio, "test", "wav")
    assert out.endswith("test.wav")
    back, sr = load_wav(out)
    assert back.shape == (1000, 2)
    assert "wav" in saver.available_formats()

def test_saver_invalid_format_falls_back_to_default(tmp_path):
    """Unknown formats fall back to the saver default instead of failing
    the job (reference audio_utils_test
    test_save_audio_invalid_format_fallback)."""
    from acestep_tpu.utils.audio import AudioSaver

    saver = AudioSaver(str(tmp_path), default_format="flac")
    audio = np.zeros((480, 2), np.float32)
    out = saver.save_audio(audio, "t", "invalid_format", sr=48000)
    assert out.endswith("t.flac")
    # m4a is recognized (AAC container); needs ffmpeg like the reference
    from acestep_tpu.utils.audio import _ffmpeg
    if _ffmpeg():
        out = saver.save_audio(audio, "t2", "m4a", sr=48000)
        assert out.endswith("t2.m4a")
    else:
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="requires ffmpeg"):
            saver.save_audio(audio, "t2", "m4a", sr=48000)
