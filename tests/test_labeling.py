"""Dataset labeling services (training/labeling.py): CSV metadata,
external transcription/caption adapters (fake transports — zero egress),
word-timestamp lyric building, and manifest curation.

Reference capabilities mirrored: dataset_builder_modules/csv_metadata.py,
scripts/lora_data_prepare/{whisper,elevenlabs}_transcription.py +
gemini_caption.py, dataset_builder_modules/update_sample.py.
"""

import base64
import json
import wave

import pytest


def _write_wav(path, seconds=0.1, sr=48000):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(b"\x00\x00" * 2 * int(sr * seconds))


from acestep_tpu.training.labeling import (
    ElevenLabsTranscriber, GeminiCaptioner, WhisperTranscriber,
    export_csv, load_csv_metadata, resolve_labelers, smart_join,
    update_sample, words_to_lyrics,
)


# ------------------------------------------------------------- CSV


def test_load_csv_metadata(tmp_path):
    (tmp_path / "meta.csv").write_text(
        "file,caption,bpm,key\n"
        "a.wav,warm piano,120,C major\n"
        "b.wav,noisy synth,90,\n", encoding="utf-8")
    table = load_csv_metadata(str(tmp_path))
    assert table["a.wav"] == {"caption": "warm piano", "bpm": "120",
                              "keyscale": "C major"}
    assert table["b.wav"] == {"caption": "noisy synth", "bpm": "90"}


def test_load_csv_metadata_semicolon_dialect(tmp_path):
    (tmp_path / "m.csv").write_text(
        "file;lyrics;language\nx.flac;la la;en\n", encoding="utf-8")
    table = load_csv_metadata(str(tmp_path))
    assert table["x.flac"] == {"lyrics": "la la", "vocal_language": "en"}


def test_csv_without_file_column_ignored(tmp_path):
    (tmp_path / "m.csv").write_text("name,caption\nx,y\n", encoding="utf-8")
    assert load_csv_metadata(str(tmp_path)) == {}


def test_scan_merges_csv_metadata(tmp_path):
    from acestep_tpu.training.dataset_builder import scan_audio_dir

    _write_wav(tmp_path / "song.wav")
    (tmp_path / "bulk.csv").write_text(
        "file,caption,bpm\nsong.wav,csv caption,99\n", encoding="utf-8")
    entries = scan_audio_dir(str(tmp_path))
    assert entries[0]["caption"] == "csv caption"
    assert entries[0]["metas"]["bpm"] == "99"


def test_sidecar_json_wins_over_csv(tmp_path):
    from acestep_tpu.training.dataset_builder import scan_audio_dir

    _write_wav(tmp_path / "song.wav")
    (tmp_path / "song.json").write_text(
        json.dumps({"caption": "sidecar caption"}), encoding="utf-8")
    (tmp_path / "bulk.csv").write_text(
        "file,caption\nsong.wav,csv caption\n", encoding="utf-8")
    entries = scan_audio_dir(str(tmp_path))
    assert entries[0]["caption"] == "sidecar caption"


# ----------------------------------------------- words -> lyrics


def test_words_to_lyrics_line_gaps():
    words = [
        {"word": "hello", "start": 0.0, "end": 0.4},
        {"word": "world", "start": 0.6, "end": 1.0},
        {"word": "next", "start": 3.5, "end": 3.9},   # 2.5 s gap -> new line
    ]
    assert words_to_lyrics(words) == "hello world\nnext"


def test_smart_join_cjk():
    assert smart_join(["你好", "世界"]) == "你好世界"
    assert smart_join(["hello", "world"]) == "hello world"
    assert smart_join(["hello", "世界"]) == "hello世界"


# --------------------------------------------------- adapters


def _wav(tmp_path):
    p = str(tmp_path / "clip.wav")
    _write_wav(p)
    return p


def test_whisper_transcriber_fake_transport(tmp_path):
    calls = {}

    def fake(url, data, headers, timeout):
        calls["url"] = url
        calls["auth"] = headers.get("Authorization")
        assert b"whisper-1" in data
        return {"language": "en", "words": [
            {"word": "la", "start": 0.0, "end": 0.2},
            {"word": "la", "start": 0.3, "end": 0.5},
        ]}

    svc = WhisperTranscriber(api_key="k", transport=fake)
    label = svc.label(_wav(tmp_path))
    assert label == {"lyrics": "la la", "vocal_language": "en"}
    assert calls["auth"] == "Bearer k"
    assert "openai.com" in calls["url"]


def test_elevenlabs_transcriber_fake_transport(tmp_path):
    def fake(url, data, headers, timeout):
        assert headers["xi-api-key"] == "k2"
        return {"text": "plain text lyrics", "language_code": "ja"}

    svc = ElevenLabsTranscriber(api_key="k2", transport=fake)
    label = svc.label(_wav(tmp_path))
    assert label == {"lyrics": "plain text lyrics", "vocal_language": "ja"}


def test_gemini_captioner_fake_transport(tmp_path):
    def fake(url, data, headers, timeout):
        payload = json.loads(data)
        blob = payload["contents"][0]["parts"][1]["inline_data"]
        base64.b64decode(blob["data"])           # valid base64 audio
        return {"candidates": [{"content": {"parts": [{
            "text": json.dumps({"caption": "dreamy pads",
                                "lyrics": "[Verse] la"})}]}}]}

    svc = GeminiCaptioner(api_key="k3", transport=fake)
    label = svc.label(_wav(tmp_path))
    assert label == {"caption": "dreamy pads", "lyrics": "[Verse] la"}


def test_gemini_malformed_response_is_empty(tmp_path):
    svc = GeminiCaptioner(api_key="k3",
                          transport=lambda *a: {"candidates": []})
    assert svc.label(_wav(tmp_path)) == {}


def test_resolve_labelers_key_gated(monkeypatch):
    for k in ("OPENAI_API_KEY", "ELEVENLABS_API_KEY", "GEMINI_API_KEY"):
        monkeypatch.delenv(k, raising=False)
    assert resolve_labelers() == []
    monkeypatch.setenv("GEMINI_API_KEY", "g")
    out = resolve_labelers()
    assert len(out) == 1 and isinstance(out[0], GeminiCaptioner)


def test_auto_label_uses_external_labeler(tmp_path):
    from acestep_tpu.training.dataset_builder import auto_label

    class Fake:
        def label(self, path):
            return {"caption": "external cap", "lyrics": "ext lyric"}

    entries = [{"audio_path": _wav(tmp_path)}]
    out = auto_label(entries, dit_handler=None, llm_handler=None,
                     external_labelers=[Fake()])
    assert out[0]["caption"] == "external cap"
    assert out[0]["lyrics"] == "ext lyric"


# ------------------------------------------------- curation


def _manifest(tmp_path):
    p = str(tmp_path / "dataset.json")
    with open(p, "w", encoding="utf-8") as f:
        json.dump([{"audio_path": "/x/a.wav", "caption": "one",
                    "lyrics": "[inst]", "metas": {"bpm": 100}},
                   {"audio_path": "/x/b.wav", "caption": "two",
                    "lyrics": "la"}], f)
    return p


def test_update_sample(tmp_path):
    p = _manifest(tmp_path)
    out = update_sample(p, 1, caption="two fixed")
    assert out["caption"] == "two fixed"
    with open(p, encoding="utf-8") as f:
        assert json.load(f)[1]["caption"] == "two fixed"


def test_update_sample_rejects_unknown_field(tmp_path):
    with pytest.raises(ValueError):
        update_sample(_manifest(tmp_path), 0, audio_path="/evil")
    with pytest.raises(IndexError):
        update_sample(_manifest(tmp_path), 5, caption="x")


def test_export_csv_roundtrip(tmp_path):
    p = _manifest(tmp_path)
    out_csv = str(tmp_path / "review.csv")
    assert export_csv(p, out_csv) == 2
    table = load_csv_metadata(str(tmp_path))
    assert table["a.wav"]["caption"] == "one"
    assert table["a.wav"]["bpm"] == "100"
