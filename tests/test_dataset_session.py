"""Interactive dataset session tests (scan/edit/label/save/preprocess).

Reference workflow being mirrored: acestep/api/train_api_dataset_service.py
routes over dataset_builder_modules/ builder state."""

import json
import os
import wave

import numpy as np
import pytest

from acestep_tpu.training.dataset_session import (
    DatasetSession,
    Sample,
    audio_duration_s,
    select_genre_indices,
)


def _write_wav(path, seconds=0.2, sr=48000):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(b"\x00\x00" * 2 * int(sr * seconds))


class _CodesHandler:
    def audio_to_codes(self, audio):
        return "<|audio_code_1|>" * 5


class _FakeLLM:
    def understand(self, codes, seed=0):
        assert codes.startswith("<|audio_code_")
        return {"caption": "a dusty lofi loop", "genres": ["lofi", "chill"],
                "bpm": "80", "keyscale": "C major",
                "timesignature": "4", "language": "en"}

    def format_sample(self, caption="", lyrics="", seed=0):
        return {"lyrics": f"[Verse]\n{lyrics.strip()}"}


def test_scan_reads_sidecars_and_durations(tmp_path):
    _write_wav(tmp_path / "a_song.wav", seconds=1.0)
    (tmp_path / "a_song.txt").write_text("la la la")
    _write_wav(tmp_path / "b_song.wav")
    (tmp_path / "b_song.json").write_text(json.dumps(
        {"caption": "piano etude", "metas": {"bpm": 95, "keyscale": "A minor"},
         "vocal_language": "ja"}))

    s = DatasetSession()
    n = s.scan_directory(str(tmp_path))
    assert n == 2
    by_name = {x.filename: x for x in s.samples}
    a, b = by_name["a_song.wav"], by_name["b_song.wav"]
    assert a.raw_lyrics == "la la la" and not a.is_instrumental
    assert a.lyrics == "la la la"
    assert a.duration == 1
    assert b.caption == "piano etude" and b.bpm == 95
    # all_instrumental default normalizes non-vocal samples: language
    # resets to unknown (reference metadata.py:15-29 semantics)
    assert b.keyscale == "A minor" and b.language == "unknown"
    assert b.is_instrumental           # all_instrumental default
    assert a.id and b.id and a.id != b.id


def test_scan_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        DatasetSession().scan_directory(str(tmp_path / "nope"))
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        DatasetSession().scan_directory(str(tmp_path / "empty"))


def test_audio_duration_header_only(tmp_path):
    _write_wav(tmp_path / "x.wav", seconds=2.5)
    assert abs(audio_duration_s(str(tmp_path / "x.wav")) - 2.5) < 0.01


def test_custom_tag_positions():
    s = Sample(caption="jazz trio", genre="jazz, bebop", custom_tag="mytag")
    assert s.get_full_caption("prepend") == "mytag, jazz trio"
    assert s.get_full_caption("append") == "jazz trio, mytag"
    assert s.get_full_caption("replace") == "mytag"
    assert s.get_full_genre("prepend") == "mytag, jazz, bebop"
    # empty caption: the tag stands alone
    assert Sample(custom_tag="t").get_full_caption("prepend") == "t"
    # no tag: caption unchanged
    assert Sample(caption="c").get_full_caption("replace") == "c"


def test_training_prompt_override_and_ratio():
    s = Sample(caption="cap", genre="gen")
    assert s.get_training_prompt(use_genre=False) == "cap"
    assert s.get_training_prompt(use_genre=True) == "gen"
    s.prompt_override = "caption"
    assert s.get_training_prompt(use_genre=True) == "cap"
    s.prompt_override = "genre"
    assert s.get_training_prompt(use_genre=False) == "gen"
    # ratio split is deterministic and sized correctly
    idx = select_genre_indices(10, 30)
    assert len(idx) == 3 and idx == select_genre_indices(10, 30)
    assert select_genre_indices(10, 0) == set()
    assert len(select_genre_indices(10, 100)) == 10


def test_set_all_instrumental_respects_raw_lyrics(tmp_path):
    _write_wav(tmp_path / "vocal.wav")
    (tmp_path / "vocal.txt").write_text("words here")
    _write_wav(tmp_path / "inst.wav")
    s = DatasetSession()
    s.scan_directory(str(tmp_path))
    s.set_all_instrumental(True)
    by_name = {x.filename: x for x in s.samples}
    assert not by_name["vocal.wav"].is_instrumental
    assert by_name["vocal.wav"].lyrics == "words here"
    assert by_name["inst.wav"].is_instrumental
    assert by_name["inst.wav"].lyrics == "[Instrumental]"
    s.set_all_instrumental(False)
    assert not by_name["inst.wav"].is_instrumental


def test_save_load_round_trip_reference_schema(tmp_path):
    _write_wav(tmp_path / "a.wav")
    s = DatasetSession()
    s.scan_directory(str(tmp_path))
    s.metadata.name = "my_set"
    s.set_custom_tag("tagx", "append")
    s.metadata.genre_ratio = 40
    s.samples[0].caption = "hello"
    path = s.save(str(tmp_path / "ds.json"))

    raw = json.load(open(path))
    assert set(raw) == {"metadata", "samples"}    # reference schema shape
    assert raw["metadata"]["custom_tag"] == "tagx"
    assert raw["samples"][0]["caption"] == "hello"
    assert raw["samples"][0]["labeled"] is False

    s2 = DatasetSession()
    assert s2.load(path) == 1
    assert s2.metadata.name == "my_set"
    assert s2.metadata.genre_ratio == 40
    assert s2.samples[0].caption == "hello"
    assert s2.samples[0].custom_tag == "tagx"


def test_load_reference_written_dataset(tmp_path):
    """A dataset JSON with the reference's exact field set loads (ids and
    unknown fields tolerated)."""
    payload = {
        "metadata": {"name": "ref_set", "custom_tag": "", "tag_position":
                     "prepend", "created_at": "2025-01-01T00:00:00",
                     "num_samples": 1, "all_instrumental": False,
                     "genre_ratio": 0},
        "samples": [{"id": "abcd1234", "audio_path": "/x/y.wav",
                     "filename": "y.wav", "caption": "c", "genre": "g",
                     "lyrics": "[Verse] hi", "raw_lyrics": "hi",
                     "formatted_lyrics": "", "bpm": 120, "keyscale": "C",
                     "timesignature": "4", "duration": 30,
                     "language": "en", "is_instrumental": False,
                     "custom_tag": "", "labeled": True,
                     "prompt_override": None, "not_a_field": 1}],
    }
    p = tmp_path / "ref.json"
    p.write_text(json.dumps(payload))
    s = DatasetSession()
    assert s.load(str(p)) == 1
    assert s.samples[0].id == "abcd1234" and s.samples[0].bpm == 120
    assert s.labeled_count() == 1


def test_update_sample_whitelist():
    s = DatasetSession()
    s.samples = [Sample(audio_path="/a.wav", filename="a.wav")]
    out = s.update_sample(0, {"caption": "new cap", "bpm": "90",
                              "audio_path": "/evil", "id": "evil",
                              "is_instrumental": False})
    assert out.caption == "new cap" and out.bpm == 90
    assert out.audio_path == "/a.wav" and out.id != "evil"
    assert not out.is_instrumental
    with pytest.raises(IndexError):
        s.update_sample(5, {})


def test_label_all_fills_fields_and_callbacks(tmp_path):
    _write_wav(tmp_path / "untitled_take.wav")
    s = DatasetSession()
    s.scan_directory(str(tmp_path))
    events = []
    status = s.label_all(
        _CodesHandler(), _FakeLLM(),
        progress_callback=lambda m: events.append(("p", m)),
        sample_labeled_callback=lambda i, smp, st: events.append(("s", st)))
    assert "1/1" in status or "Labeled" in status
    smp = s.samples[0]
    assert smp.caption == "a dusty lofi loop"
    assert smp.genre == "lofi, chill"
    assert smp.bpm == 80 and smp.keyscale == "C major"
    assert smp.labeled
    assert any(k == "p" for k, _ in events)
    assert any(k == "s" and "✅" in v for k, v in events)
    # only_unlabeled skips everything on the second pass
    assert s.label_all(_CodesHandler(), _FakeLLM(),
                       only_unlabeled=True) == "All samples already labeled"


def test_label_all_skip_metas_and_format_lyrics(tmp_path):
    _write_wav(tmp_path / "vocal.wav")
    (tmp_path / "vocal.txt").write_text("raw words")
    s = DatasetSession()
    s.scan_directory(str(tmp_path))
    s.label_all(_CodesHandler(), _FakeLLM(), skip_metas=True,
                format_lyrics=True)
    smp = s.samples[0]
    assert smp.bpm is None and smp.keyscale == ""     # metas skipped
    assert smp.formatted_lyrics.startswith("[Verse]")
    assert smp.lyrics == smp.formatted_lyrics
    assert smp.raw_lyrics == "raw words"              # original preserved
    assert smp.language == "unknown"                  # raw lyrics: LM lang
    # skip_metas skips language too                   # not applied


def test_label_all_without_llm_falls_back(tmp_path):
    _write_wav(tmp_path / "my_cool_track.wav")
    s = DatasetSession()
    s.scan_directory(str(tmp_path))
    s.label_all(None, None)
    assert s.samples[0].caption == "my cool track"
    assert s.samples[0].labeled


def test_label_all_per_sample_failure_is_soft(tmp_path):
    _write_wav(tmp_path / "ok.wav")
    _write_wav(tmp_path / "zz_bad.wav")

    class FlakyHandler(_CodesHandler):
        def audio_to_codes(self, audio):
            raise RuntimeError("encode blew up")

    s = DatasetSession()
    s.scan_directory(str(tmp_path))
    seen = []
    s.label_all(FlakyHandler(), _FakeLLM(),
                sample_labeled_callback=lambda i, smp, st:
                seen.append(st))
    assert all("⚠️" in st for st in seen)     # both failed, none raised
    assert not s.samples[0].labeled


def test_manifest_entries_apply_tag_and_ratio(tmp_path):
    for i in range(4):
        _write_wav(tmp_path / f"s{i}.wav")
    s = DatasetSession()
    s.scan_directory(str(tmp_path))
    for i, smp in enumerate(s.samples):
        smp.caption = f"cap{i}"
        smp.genre = f"gen{i}"
    s.set_custom_tag("TAG", "prepend")
    s.metadata.genre_ratio = 50
    entries = s.to_manifest_entries()
    assert len(entries) == 4
    used_genre = [e for e in entries if "gen" in e["caption"]]
    assert len(used_genre) == 2                # 50% of 4
    assert all(e["caption"].startswith("TAG, ") for e in entries)
    assert all(e["lyrics"] == "[Instrumental]" for e in entries)
    assert all(e["filename"].endswith(".npz") for e in entries)


def test_preprocess_writes_tensors(tmp_path):
    from tests.test_training import _FakeHandler

    _write_wav(tmp_path / "one.wav")
    _write_wav(tmp_path / "two.wav")
    s = DatasetSession()
    s.scan_directory(str(tmp_path))
    out_dir = str(tmp_path / "tensors")
    msgs = []
    n = s.preprocess(_FakeHandler(), out_dir,
                     progress_callback=msgs.append)
    assert n == 2
    files = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
    assert len(files) == 2
    assert msgs and msgs[-1].startswith("Encoding 2/2")
    # ids are the filenames: stable across runs -> skip_existing works
    n2 = s.preprocess(_FakeHandler(), out_dir, skip_existing=True)
    assert n2 == 2
