"""Audio IO / normalization / UUID tests (reference: audio_utils.py,
io_audio.py behaviors)."""

import os

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


@pytest.mark.slow
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


def test_loudness_normalize_stereo_sums_channel_energy():
    """BS.1770 sums per-channel mean-square energies: re-measuring the
    normalized output must land on the target (a cross-channel mean would
    come out ~3 LU hot on stereo)."""
    from acestep_tpu.utils.audio import loudness_normalize

    t = np.arange(48000 * 2) / 48000.0
    sine = 0.25 * np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
    stereo = np.stack([sine, sine], axis=1)
    out = loudness_normalize(stereo, target_lufs=-14.0)

    def measure(x):
        from scipy.signal import lfilter
        b1 = [1.53512485958697, -2.69169618940638, 1.19839281085285]
        a1 = [1.0, -1.69065929318241, 0.73248077421585]
        b2 = [1.0, -2.0, 1.0]
        a2 = [1.0, -1.99004745483398, 0.99007225036621]
        y = lfilter(b2, a2, lfilter(b1, a1, x, axis=0), axis=0)
        return -0.691 + 10 * np.log10(np.sum(np.mean(np.square(y), axis=0)))

    assert abs(measure(out) - (-14.0)) < 0.5


def test_save_wav_float32_is_ieee_float():
    """subtype='FLOAT32' must write a format-3 (IEEE float) WAV, not
    int32 PCM under a float-sounding name."""
    import tempfile

    from acestep_tpu.utils.audio import save_wav

    audio = (np.random.RandomState(0).randn(1000, 2) * 0.1).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = save_wav(os.path.join(d, "f.wav"), audio, 48000,
                        subtype="FLOAT32")
        raw = open(path, "rb").read()
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        fmt_tag = int.from_bytes(raw[20:22], "little")
        assert fmt_tag == 3                       # IEEE float
        bits = int.from_bytes(raw[34:36], "little")
        assert bits == 32
        data = np.frombuffer(raw[44:], dtype="<f4").reshape(-1, 2)
        np.testing.assert_allclose(data, audio, atol=1e-7)


def test_load_audio_24bit_wav_falls_back_to_ffmpeg(tmp_path):
    """A 24-bit WAV must use the ffmpeg fallback instead of dying in the
    stdlib reader (parity with the FLAC branch)."""
    import shutil as _shutil

    from acestep_tpu.utils.audio import load_audio

    # hand-build a minimal 24-bit PCM WAV header + a few frames
    frames = 480
    data = b"\x00\x00\x40" * (frames * 2)        # ~0.5 amplitude, stereo
    hdr = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVEfmt " +
           (16).to_bytes(4, "little") + (1).to_bytes(2, "little") +
           (2).to_bytes(2, "little") + (48000).to_bytes(4, "little") +
           (48000 * 6).to_bytes(4, "little") + (6).to_bytes(2, "little") +
           (24).to_bytes(2, "little") + b"data" +
           len(data).to_bytes(4, "little"))
    p = tmp_path / "x.wav"
    p.write_bytes(hdr + data)
    if _shutil.which("ffmpeg"):
        out = load_audio(str(p))
        assert out.shape[1] == 2 and len(out) > 0
        assert 0.3 < np.max(np.abs(out)) < 0.7
    else:
        with pytest.raises(Exception):
            load_audio(str(p))


def test_lora_signature_tracks_active_adapter():
    """UUID signature encodes the ACTIVE adapter only: switching actives
    changes it; loading an unused adapter doesn't."""
    from acestep_tpu.lora.manager import LoraManager

    svc = LoraManager(base_params={})
    svc.add("a", {"meta": {"kind": "lora"}}, scale=1.0)
    sig_a = svc.signature()
    svc.add("b", {"meta": {"kind": "lora"}}, scale=1.0)   # b becomes active
    sig_b = svc.signature()
    assert sig_a != sig_b and sig_b.startswith("b@")
    svc._active = "a"
    assert svc.signature() == sig_a     # unused 'b' doesn't perturb it
    # inactive-adapter operations don't force a re-merge
    svc._dirty = False
    svc.set_scale(2.0, adapter_name="b")
    assert svc._dirty is False
    svc.unload("b")
    assert svc._dirty is False
