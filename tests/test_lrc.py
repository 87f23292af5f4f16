"""LRC parsing / WebVTT conversion parity.

Ports the reference's results-UI test semantics
(`acestep/ui/gradio/events/results/lrc_utils_test.py`): timestamp
grammar (2-digit centiseconds vs 3-digit milliseconds), line filtering,
the 2 s merge window, end-time resolution order, and the VTT timestamp
format, plus the stateless /lrc_to_vtt serving route.
"""
import numpy as np

from acestep_tpu.utils.lrc import (format_vtt_timestamp, lrc_to_vtt,
                                   parse_lrc_to_subtitles)
from tests.test_serving import server_env  # noqa: F401 (fixture)


def test_empty_input_returns_empty():
    assert parse_lrc_to_subtitles("") == []
    assert parse_lrc_to_subtitles("   \n  ") == []
    assert lrc_to_vtt("") is None
    assert lrc_to_vtt(None) is None


def test_single_line_defaults_to_five_seconds():
    subs = parse_lrc_to_subtitles("[00:10.50] hello world")
    assert len(subs) == 1
    assert subs[0]["text"] == "hello world"
    assert subs[0]["timestamp"] == [10.5, 15.5]


def test_multiple_lines_end_at_next_start():
    subs = parse_lrc_to_subtitles(
        "[00:00.00]first\n[00:04.00]second\n[00:08.00]third")
    assert [s["text"] for s in subs] == ["first", "second", "third"]
    assert subs[0]["timestamp"] == [0.0, 4.0]
    assert subs[1]["timestamp"] == [4.0, 8.0]
    assert subs[2]["timestamp"] == [8.0, 13.0]      # last: +5 s


def test_lines_without_timestamps_and_empty_text_ignored():
    subs = parse_lrc_to_subtitles(
        "just a comment\n[00:02.00]real line\n[00:09.00]\n[ti:title tag]")
    assert len(subs) == 1
    assert subs[0]["text"] == "real line"


def test_centisecond_vs_millisecond_fractions():
    # two digits are centiseconds (lrc_utils.py:53-56)
    subs2 = parse_lrc_to_subtitles("[00:01.25]a")
    assert np.isclose(subs2[0]["timestamp"][0], 1.25)
    # three digits are milliseconds
    subs3 = parse_lrc_to_subtitles("[00:01.250]a")
    assert np.isclose(subs3[0]["timestamp"][0], 1.25)
    subs3b = parse_lrc_to_subtitles("[00:01.025]a")
    assert np.isclose(subs3b[0]["timestamp"][0], 1.025)


def test_close_lines_merge_within_two_seconds():
    subs = parse_lrc_to_subtitles(
        "[00:00.00]one\n[00:01.00]two\n[00:01.90]three\n[00:05.00]far")
    # first three start within 2 s of the FIRST line's start -> one cue
    assert len(subs) == 2
    assert subs[0]["text"] == "one\ntwo\nthree"
    assert subs[1]["text"] == "far"
    assert subs[0]["timestamp"][1] == 5.0           # ends at next start


def test_explicit_second_timestamp_is_end():
    subs = parse_lrc_to_subtitles("[00:02.00]line[00:06.50]")
    assert subs[0]["timestamp"] == [2.0, 6.5]


def test_total_duration_closes_last_line():
    subs = parse_lrc_to_subtitles("[00:10.00]tail", total_duration=12.0)
    assert subs[0]["timestamp"] == [10.0, 12.0]
    # duration before the start falls back to +5 s
    subs = parse_lrc_to_subtitles("[00:10.00]tail", total_duration=8.0)
    assert subs[0]["timestamp"] == [10.0, 15.0]


def test_nonpositive_span_widens_to_three_seconds():
    subs = parse_lrc_to_subtitles("[00:04.00]a[00:04.00]")
    assert subs[0]["timestamp"] == [4.0, 7.0]


def test_vtt_timestamp_format():
    assert format_vtt_timestamp(0.0) == "00:00:00.000"
    assert format_vtt_timestamp(65.25) == "00:01:05.250"
    assert format_vtt_timestamp(3723.5) == "01:02:03.500"


def test_lrc_to_vtt_document():
    vtt = lrc_to_vtt("[00:00.00]hello\n[00:04.00]world", total_duration=8.0)
    lines = vtt.split("\n")
    assert lines[0] == "WEBVTT"
    assert "00:00:00.000 --> 00:00:04.000" in vtt
    assert "00:00:04.000 --> 00:00:08.000" in vtt
    assert "hello" in vtt and "world" in vtt
    # numbered cues
    assert "1" in lines and "2" in lines
    # untimestamped text yields no cues -> None (clears the track)
    assert lrc_to_vtt("no timestamps here") is None


def test_lrc_to_vtt_route(server_env):
    """The stateless serving route returns the VTT document."""
    from tests.test_serving import _post

    _state, _handler, port = server_env
    status, out = _post(port, "/lrc_to_vtt",
                        {"lrc": "[00:01.00]sync me", "duration": 4.0})
    assert status == 200
    vtt = out["data"]["vtt"]
    assert vtt.startswith("WEBVTT")
    assert "00:00:01.000 --> 00:00:04.000" in vtt
    assert "sync me" in vtt
    # JSON cue list rides alongside for the studio player
    assert out["data"]["cues"] == [
        {"text": "sync me", "timestamp": [1.0, 4.0]}]
    # duration may be LM-metadata strings; bad values fall back to None
    for dur in ("4", "4s", "N/A", None):
        status, out = _post(port, "/lrc_to_vtt",
                            {"lrc": "[00:01.00]x", "duration": dur})
        assert status == 200 and out["data"]["vtt"].startswith("WEBVTT")
    # empty LRC clears the track
    status, out = _post(port, "/lrc_to_vtt", {"lrc": ""})
    assert status == 200 and out["data"]["vtt"] is None

def test_vtt_timestamp_rounds_not_truncates():
    # 65.07 is not exactly representable; truncation yields .069
    assert format_vtt_timestamp(65.07) == "00:01:05.070"
