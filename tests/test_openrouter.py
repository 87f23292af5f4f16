"""OpenRouter chat adapter tests: message parsing, request mapping,
non-streaming and SSE completion flows against the live threaded server."""

import base64
import json
import http.client
import os
import threading

import numpy as np
import pytest

from acestep_tpu.serving import AppState, create_server
from acestep_tpu.serving.openrouter import (
    chat_to_request,
    extract_tagged_content,
    is_instrumental,
    looks_like_lyrics,
    parse_messages,
)
from tests.test_serving import FakeDiTHandler


def test_extract_tagged_content():
    prompt, lyrics, rest = extract_tagged_content(
        "make it fast <prompt>synthwave</prompt>\n"
        "<lyrics>[Verse]\nhello</lyrics>")
    assert prompt == "synthwave"
    assert lyrics == "[Verse]\nhello"
    assert rest == "make it fast"


def test_looks_like_lyrics_heuristics():
    assert looks_like_lyrics("[Verse]\nla la la")
    assert looks_like_lyrics("line one\nline two\nline three\nline four")
    assert not looks_like_lyrics(
        "A single long prose sentence describing the kind of music I want, "
        "with plenty of detail about instrumentation and mood and structure.")
    assert is_instrumental("[inst]")
    assert not is_instrumental("[Verse] words")


def test_parse_messages_sample_mode_and_tags():
    # plain chat => sample (inspiration) mode
    prompt, lyrics, paths, _sys, query = parse_messages(
        [{"role": "user", "content": "a happy summer song about surfing. "
          "Something uplifting with lots of major chords all around."}])
    assert prompt == "" and query and "surfing" in query

    # tagged => explicit prompt/lyrics
    prompt, lyrics, paths, _sys, query = parse_messages(
        [{"role": "user",
          "content": "<prompt>lofi hiphop</prompt><lyrics>[inst]</lyrics>"}])
    assert prompt == "lofi hiphop" and lyrics == "[inst]" and query is None


def test_parse_messages_audio_blocks(tmp_path):
    b64 = base64.b64encode(b"RIFFfakewav").decode()
    _, _, paths, _, _ = parse_messages([{
        "role": "user",
        "content": [
            {"type": "text", "text": "<prompt>cover this</prompt>"},
            {"type": "input_audio",
             "input_audio": {"data": b64, "format": "wav"}},
        ],
    }])
    assert len(paths) == 1 and os.path.exists(paths[0])
    with open(paths[0], "rb") as f:
        assert f.read() == b"RIFFfakewav"
    os.unlink(paths[0])


def test_chat_to_request_audio_routing():
    b64 = base64.b64encode(b"x").decode()
    audio_part = {"type": "input_audio",
                  "input_audio": {"data": b64, "format": "wav"}}
    # text2music + audio => music_continuation w/ reference audio
    req = chat_to_request({
        "messages": [{"role": "user",
                      "content": [{"type": "text",
                                   "text": "<prompt>rock</prompt>"},
                                  audio_part]}],
    })
    assert req.task_type == "music_continuation"
    assert req.reference_audio_path and not req.src_audio_path
    os.unlink(req.reference_audio_path)

    # cover + audio => src audio
    req = chat_to_request({
        "task_type": "cover",
        "messages": [{"role": "user",
                      "content": [{"type": "text",
                                   "text": "<prompt>rock</prompt>"},
                                  audio_part]}],
    })
    assert req.task_type == "cover"
    assert req.src_audio_path and not req.reference_audio_path
    os.unlink(req.src_audio_path)


@pytest.fixture()
def chat_server(tmp_path):
    out_dir = str(tmp_path / "outputs")
    os.makedirs(out_dir, exist_ok=True)
    handler = FakeDiTHandler(out_dir)
    state = AppState({"acestep-v15-turbo-tpu": handler}, None,
                     output_dir=out_dir)
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield handler, server.server_address[1]
    state.shutdown()
    server.shutdown()
    server.server_close()


def test_chat_completion_non_streaming(chat_server):
    handler, port = chat_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/v1/chat/completions", json.dumps({
        "model": "acestep/acestep-v15-turbo-tpu",
        "messages": [{"role": "user",
                      "content": "<prompt>upbeat edm</prompt>"
                                 "<lyrics>[inst]</lyrics>"}],
        "audio_config": {"duration": 10, "format": "wav"},
    }), {"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read().decode())
    conn.close()
    assert resp.status == 200
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant"
    url = msg["audio"][0]["audio_url"]["url"]
    assert url.startswith("data:audio/wav;base64,")
    # decodes back to a RIFF wav
    assert base64.b64decode(url.split(",", 1)[1])[:4] == b"RIFF"
    assert handler.calls[0]["captions"] == "upbeat edm"


def test_chat_completion_streaming(chat_server):
    _, port = chat_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/v1/chat/completions", json.dumps({
        "stream": True,
        "messages": [{"role": "user",
                      "content": "<prompt>jazz</prompt><lyrics>[inst]</lyrics>"}],
    }), {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = resp.read().decode()
    conn.close()
    assert resp.status == 200
    events = [json.loads(line[6:]) for line in body.splitlines()
              if line.startswith("data: ") and line != "data: [DONE]"]
    assert events[0]["choices"][0]["delta"]["role"] == "assistant"
    finishes = [e["choices"][0]["finish_reason"] for e in events]
    assert "stop" in finishes
    assert any(e["choices"][0]["delta"].get("audio") for e in events)
    assert body.rstrip().endswith("data: [DONE]")


def test_chat_models_listing(chat_server):
    _, port = chat_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/v1/chat/models")
    out = json.loads(conn.getresponse().read().decode())
    conn.close()
    assert out["object"] == "list"
    assert out["data"][0]["id"] == "acestep/acestep-v15-turbo-tpu"
    assert out["data"][0]["architecture"]["output_modalities"] == ["audio"]


def test_chat_to_request_continuation_echo_keeps_reference_routing():
    """An echoed-back task_type='music_continuation' (the value this
    adapter itself produces) must route audio[0] to the style reference,
    not the edit source — the reference adapter src-routes ONLY
    cover/repaint/lego/extract/complete (:673-686)."""
    b64 = base64.b64encode(b"x").decode()
    audio_part = {"type": "input_audio",
                  "input_audio": {"data": b64, "format": "wav"}}
    req = chat_to_request({
        "task_type": "music_continuation",
        "messages": [{"role": "user",
                      "content": [{"type": "text",
                                   "text": "<prompt>rock</prompt>"},
                                  audio_part]}],
    })
    assert req.task_type == "music_continuation"
    assert req.reference_audio_path and not req.src_audio_path
    os.unlink(req.reference_audio_path)
