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


# ---------------------------------------------------------------------------
# Decoder coverage for features OUR encoder never emits but real-world
# encoders (libFLAC/ffmpeg) use: LPC subframes, stereo decorrelation,
# wasted bits. No external codec exists in this image, so the streams are
# hand-assembled bit-for-bit from the spec (RFC 9639) and decode is checked
# against the known signal (CRC-8/16 + MD5 all verified by the decoder).
# ---------------------------------------------------------------------------

import hashlib

from acestep_tpu.utils.flac import (
    BitWriter,
    _write_residual,
    crc8,
    crc16,
    decode_flac,
)


def _streaminfo(nb, sr, ch, bps, total, md5):
    bw = BitWriter()
    bw.write(nb, 16)            # min block size
    bw.write(nb, 16)            # max block size
    bw.write(0, 24)             # min frame size (unknown)
    bw.write(0, 24)             # max frame size
    bw.write(sr, 20)
    bw.write(ch - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    body = bw.getvalue() + md5
    assert len(body) == 34
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + body


def _frame(chan_code, nb, subframe_bits_fns):
    """Assemble one frame: header+crc8, subframes, pad, crc16."""
    hw = BitWriter()
    hw.write(0b11111111111110, 14)
    hw.write(0, 1)              # reserved
    hw.write(0, 1)              # fixed blocking
    hw.write(7, 4)              # block size: 16-bit value follows
    hw.write(0, 4)              # sample rate: from STREAMINFO
    hw.write(chan_code, 4)
    hw.write(4, 3)              # bps: 16-bit
    hw.write(0, 1)              # reserved
    hw.write(0, 8)              # frame number 0 (utf8, 1 byte)
    hw.write(nb - 1, 16)
    header = hw.getvalue()
    bw = BitWriter()
    for b in header:
        bw.write(b, 8)
    bw.write(crc8(header), 8)
    for fn in subframe_bits_fns:
        fn(bw)
    bw.align()
    body = bw.getvalue()
    return body + crc16(body).to_bytes(2, "big")


def _verbatim_subframe(x, bps, wasted=0):
    def write(bw):
        bw.write(0, 1)
        bw.write(1, 6)                       # VERBATIM
        if wasted:
            bw.write(1, 1)                   # wasted flag
            bw.write(1, wasted)              # unary k-1: (k-1) zeros + 1
            shift_x = [v >> wasted for v in x]
        else:
            bw.write(0, 1)
            shift_x = x
        for v in shift_x:
            bw.write(int(v) & ((1 << (bps - wasted)) - 1), bps - wasted)
    return write


def _lpc_subframe(signal, coefs, shift, bps):
    order = len(coefs)
    res = []
    for i in range(order, len(signal)):
        pred = sum(coefs[j] * signal[i - 1 - j] for j in range(order))
        res.append(signal[i] - (pred >> shift))
    precision = 15

    def write(bw):
        bw.write(0, 1)
        bw.write(0b100000 | (order - 1), 6)  # LPC
        bw.write(0, 1)                       # no wasted bits
        for w in signal[:order]:
            bw.write(int(w) & ((1 << bps) - 1), bps)
        bw.write(precision - 1, 4)
        bw.write(shift & 0x1F, 5)
        for c in coefs:
            bw.write(int(c) & ((1 << precision) - 1), precision)
        _write_residual(bw, np.asarray(res, np.int64))
    return write


def _build(chan_code, nb, subs, expected):
    md5 = hashlib.md5(expected.astype("<i2").tobytes()).digest()
    stream = _streaminfo(nb, 48000, expected.shape[1], 16,
                         nb, md5) + _frame(chan_code, nb, subs)
    audio, sr = decode_flac(stream)
    assert sr == 48000
    np.testing.assert_array_equal(audio, expected)


def test_decode_lpc_subframe():
    rng = np.random.default_rng(0)
    nb = 512
    sig = np.cumsum(rng.integers(-50, 50, nb)).astype(np.int64)
    coefs, shift = [3, -2, 1], 2             # arbitrary order-3 predictor
    expected = np.stack([sig, sig], axis=1).astype(np.int16)
    subs = [_lpc_subframe(list(sig), coefs, shift, 16)] * 2
    _build(1, nb, subs, expected)


def test_decode_stereo_decorrelation_modes():
    rng = np.random.default_rng(1)
    nb = 256
    L = rng.integers(-3000, 3000, nb).astype(np.int64)
    R = rng.integers(-3000, 3000, nb).astype(np.int64)
    expected = np.stack([L, R], axis=1).astype(np.int16)
    side = L - R
    mid = (L + R) >> 1
    # left/side
    _build(8, nb, [_verbatim_subframe(list(L), 16),
                   _verbatim_subframe(list(side), 17)], expected)
    # right/side
    _build(9, nb, [_verbatim_subframe(list(side), 17),
                   _verbatim_subframe(list(R), 16)], expected)
    # mid/side
    _build(10, nb, [_verbatim_subframe(list(mid), 16),
                    _verbatim_subframe(list(side), 17)], expected)


def test_decode_wasted_bits():
    rng = np.random.default_rng(2)
    nb = 128
    sig = (rng.integers(-2000, 2000, nb) << 2).astype(np.int64)  # 2 low zeros
    expected = np.stack([sig, sig], axis=1).astype(np.int16)
    subs = [_verbatim_subframe(list(sig), 16, wasted=2)] * 2
    _build(1, nb, subs, expected)
