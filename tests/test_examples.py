"""Examples library validation: all blueprints parse and satisfy the
metadata schema the FSM/constants enforce (reference examples/ contract:
200 text2music + 200 simple_mode driving random-sample endpoints)."""

import glob
import json
import os

from acestep_tpu.constants import (
    BPM_MAX,
    BPM_MIN,
    DURATION_MAX,
    DURATION_MIN,
    VALID_KEYSCALES,
    VALID_LANGUAGES,
    VALID_TIME_SIGNATURES,
)

ROOT = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(subdir):
    files = sorted(glob.glob(os.path.join(ROOT, subdir, "example_*.json")))
    out = []
    for path in files:
        with open(path, "r", encoding="utf-8") as f:
            out.append((path, json.load(f)))
    return out


def test_counts_match_reference():
    assert len(_load("text2music")) >= 200
    assert len(_load("simple_mode")) >= 200


def test_text2music_blueprints_valid():
    for path, ex in _load("text2music"):
        assert ex.get("caption", "").strip(), path
        assert "lyrics" in ex, path
        if ex.get("bpm") is not None:
            assert BPM_MIN <= int(ex["bpm"]) <= BPM_MAX, path
        if ex.get("duration"):
            assert DURATION_MIN <= float(ex["duration"]) <= DURATION_MAX, path
        if ex.get("keyscale"):
            assert ex["keyscale"] in VALID_KEYSCALES, path
        if ex.get("language"):
            assert ex["language"] in VALID_LANGUAGES, path
        if ex.get("timesignature"):
            assert int(ex["timesignature"]) in VALID_TIME_SIGNATURES, path


def test_simple_mode_blueprints_valid():
    for path, ex in _load("simple_mode"):
        query = ex.get("query") or ex.get("caption") or ""
        assert query.strip(), path


def test_blueprints_are_diverse():
    captions = [ex.get("caption", "") for _, ex in _load("text2music")]
    assert len(set(captions)) >= 0.9 * len(captions)
    langs = {ex.get("language") for _, ex in _load("text2music")
             if ex.get("language")}
    assert len(langs) >= 5        # multi-language library
