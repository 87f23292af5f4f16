"""Native FLAC codec tests: roundtrip, format pinning, CRC/MD5 integrity,
native-vs-Python byte identity, and AudioSaver/load_audio integration."""

import hashlib
import os

import numpy as np
import pytest

from acestep_tpu.utils import flac


def _sine(n=10000, ch=2, amp=0.5):
    t = np.arange(n) / 30.0
    x = np.sin(t)[:, None] * (amp * 32767 * np.linspace(1.0, 0.6, ch))
    return x.astype(np.int16)


@pytest.mark.parametrize("name,x", [
    ("silence", np.zeros((5000, 2), np.int16)),
    ("constant", np.full((3000, 1), -1234, np.int16)),
    ("sine", _sine()),
    ("noise", np.random.default_rng(0).integers(
        -32768, 32768, (4097, 2)).astype(np.int16)),
    ("mono_ramp", np.arange(-3000, 3000, dtype=np.int16)),
    ("tiny", np.array([[5, -5], [7, -9], [100, 3]], np.int16)),
    ("one_sample", np.array([[32767, -32768]], np.int16)),
    ("block_exact", _sine(flac.BLOCK_SIZE * 2)),
])
def test_roundtrip_exact(name, x):
    enc = flac.encode_flac(x, 48000)
    dec, sr = flac.decode_flac(enc)
    expect = x[:, None] if x.ndim == 1 else x
    assert sr == 48000
    np.testing.assert_array_equal(dec, expect)


def test_compression_beats_raw_on_tonal_audio():
    x = _sine(48000)
    enc = flac.encode_flac(x, 48000)
    assert len(enc) < 0.5 * x.nbytes


def test_stream_header_golden():
    """Container structure pinned: magic, STREAMINFO layout, frame sync."""
    x = np.zeros((100, 2), np.int16)
    enc = flac.encode_flac(x, 48000)
    assert enc[:4] == b"fLaC"
    assert enc[4] == 0x80 and enc[7] == 34        # last block, STREAMINFO 34B
    info = enc[8:42]
    assert int.from_bytes(info[0:2], "big") == flac.BLOCK_SIZE
    # 20-bit sample rate starting at byte 10
    assert (int.from_bytes(info[10:13], "big") >> 4) == 48000
    # channels-1 (3 bits) and bps-1 (5 bits)
    assert ((info[12] >> 1) & 0x7) == 1
    assert (((info[12] & 1) << 4) | (info[13] >> 4)) == 15
    # MD5 is the real digest of the raw little-endian pcm
    assert info[18:34] == hashlib.md5(x.astype("<i2").tobytes()).digest()
    # first frame sync code
    assert enc[42] == 0xFF and (enc[43] >> 2) == 0b111110


def test_corrupt_frame_detected():
    enc = bytearray(flac.encode_flac(_sine(4000), 48000))
    enc[60] ^= 0xFF                                # flip payload bits
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(enc))


def test_truncated_stream_detected():
    enc = flac.encode_flac(_sine(9000), 48000)
    with pytest.raises((ValueError, IndexError)):
        flac.decode_flac(enc[: len(enc) // 2])


def test_native_and_python_bytes_identical():
    from acestep_tpu.utils import flac_native

    if flac_native.native_rice_encode is None:
        pytest.skip("no compiler for the native kernel")
    x = _sine(20000)
    enc_native = flac.encode_flac(x, 48000)
    saved = (flac_native.native_rice_encode, flac_native.native_rice_decode,
             flac_native.native_crc16)
    try:
        flac_native.native_rice_encode = None
        flac_native.native_rice_decode = None
        flac_native.native_crc16 = None
        enc_py = flac.encode_flac(x, 48000)
        dec_py, _ = flac.decode_flac(enc_native)
    finally:
        (flac_native.native_rice_encode, flac_native.native_rice_decode,
         flac_native.native_crc16) = saved
    assert enc_native == enc_py
    np.testing.assert_array_equal(dec_py, x)


def test_audio_saver_flac_roundtrip(tmp_path):
    from acestep_tpu.utils.audio import AudioSaver, load_audio

    saver = AudioSaver(str(tmp_path))
    assert "flac" in saver.available_formats()
    audio = (_sine(6000).astype(np.float32)) / 32767.0
    path = saver.save_audio(audio, "song", fmt="flac")
    assert path.endswith(".flac") and os.path.getsize(path) > 0
    back = load_audio(path)
    assert back.shape == audio.shape
    np.testing.assert_allclose(back, audio, atol=1.0 / 32000)


def test_facade_default_format_is_flac(tmp_path):
    """Matches the reference's GenerationConfig default (inference.py:190),
    now that FLAC encodes natively."""
    from acestep_tpu.inference import GenerationConfig

    assert GenerationConfig().audio_format == "flac"
