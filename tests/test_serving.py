"""Serving stack tests: job lifecycle, endpoint surface, persistence.

Mirrors the reference's mock-heavy test approach (SURVEY.md §4): the DiT
handler is a fake that writes a tiny wav; the HTTP surface is driven with
http.client against a real ThreadingHTTPServer on an ephemeral port.
"""

import json
import http.client
import os
import threading
import time

import numpy as np
import pytest

from acestep_tpu.pipeline.handler import GenerationResult
from acestep_tpu.serving import (
    AppState,
    GenerateMusicRequest,
    JobStore,
    LocalResultCache,
    create_server,
)
from acestep_tpu.serving.jobstore import RESULT_KEY_PREFIX
from acestep_tpu.utils.audio import save_wav


class FakeDiTHandler:
    """Minimal fake implementing the handler surface the server uses."""

    def __init__(self, output_dir):
        self.output_dir = output_dir
        self.calls = []
        self.src_contents = []

    def generate_music(self, **kwargs):
        self.calls.append(kwargs)
        src = kwargs.get("src_audio")
        if isinstance(src, str) and os.path.exists(src):
            with open(src, "rb") as f:
                self.src_contents.append(f.read())
        batch = kwargs.get("batch_size", 1)
        sr = 48000
        audio = np.zeros((sr // 10, 2), np.float32)
        paths = []
        for i in range(batch):
            path = os.path.join(kwargs.get("save_dir", self.output_dir),
                                f"fake_{len(self.calls)}_{i}.wav")
            save_wav(path, audio, sr)
            paths.append(path)
        return GenerationResult(
            audios=[audio] * batch,
            pred_latents=np.zeros((batch, 25, 64), np.float32),
            seeds=list(range(batch)),
            time_costs={"diffusion_time_cost": 0.01},
            sample_rate=sr,
            audio_paths=paths,
            extra={"frames": 25, "task": kwargs.get("task", "text2music")},
        )


@pytest.fixture()
def server_env(tmp_path):
    out_dir = str(tmp_path / "outputs")
    os.makedirs(out_dir, exist_ok=True)
    handler = FakeDiTHandler(out_dir)
    state = AppState({"acestep-v15-turbo-tpu": handler}, None,
                     output_dir=out_dir,
                     persist_dir=str(tmp_path / "persist"))
    server = create_server(state, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    yield state, handler, port
    state.shutdown()
    server.shutdown()
    server.server_close()


def _post(port, route, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("POST", route, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read().decode())
    conn.close()
    return resp.status, data


def _get(port, route):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", route)
    resp = conn.getresponse()
    raw = resp.read()
    conn.close()
    try:
        return resp.status, json.loads(raw.decode())
    except ValueError:
        return resp.status, raw


def _wait_done(port, task_id, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        _, out = _post(port, "/query_result", {"task_id_list": [task_id]})
        entry = out["data"][0]
        if entry["status"] != 0:
            return entry
        time.sleep(0.05)
    raise TimeoutError("job did not finish")


def test_health_stats_models(server_env):
    _, _, port = server_env
    status, out = _get(port, "/health")
    assert status == 200 and out["data"]["status"] == "ok"
    status, out = _get(port, "/v1/stats")
    assert out["data"]["jobs"]["total"] == 0
    status, out = _get(port, "/v1/models")
    assert out["data"]["default_model"] == "acestep-v15-turbo-tpu"
    assert out["data"]["models"][0]["is_default"]


def test_release_and_query_lifecycle(server_env):
    state, handler, port = server_env
    status, out = _post(port, "/release_task", {
        "prompt": "an upbeat synthpop song",
        "lyrics": "[Verse]\nhello world",
        "audio_duration": 10,
        "batch_size": 2,
        "thinking": False,
    })
    assert status == 200
    task_id = out["data"]["task_id"]
    assert out["data"]["status"] == "queued"

    entry = _wait_done(port, task_id)
    assert entry["status"] == 1
    results = json.loads(entry["result"])
    assert len(results) == 2
    assert results[0]["file"].endswith(".wav")
    assert results[0]["stage"] == "succeeded"
    # handler received the mapped request
    call = handler.calls[0]
    assert call["captions"] == "an upbeat synthpop song"
    assert call["batch_size"] == 2


def test_audio_endpoint_serves_and_guards(server_env):
    state, handler, port = server_env
    _, out = _post(port, "/release_task", {"prompt": "x", "thinking": False})
    entry = _wait_done(port, out["data"]["task_id"])
    path = json.loads(entry["result"])[0]["file"]

    status, raw = _get(port, f"/v1/audio?path={path}")
    assert status == 200 and isinstance(raw, bytes) and raw[:4] == b"RIFF"

    status, _ = _get(port, "/v1/audio?path=/etc/passwd")
    assert status == 403


def test_unknown_task_and_route(server_env):
    _, _, port = server_env
    _, out = _post(port, "/query_result", {"task_id_list": ["nope"]})
    assert out["data"][0]["status"] == 2
    status, _ = _post(port, "/no_such_route", {})
    assert status == 404


def test_api_key_auth(tmp_path):
    out_dir = str(tmp_path / "outputs")
    handler = FakeDiTHandler(out_dir)
    state = AppState({"m": handler}, None, output_dir=out_dir, api_key="sekrit")
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        status, _ = _post(port, "/release_task", {"prompt": "x"})
        assert status == 401
        status, _ = _post(port, "/release_task",
                          {"prompt": "x", "ai_token": "sekrit",
                           "thinking": False})
        assert status == 200
    finally:
        state.shutdown()
        server.shutdown()
        server.server_close()


def test_request_schema_aliases():
    req = GenerateMusicRequest.from_dict({
        "caption": "jazz",             # alias for prompt
        "keyscale": "C major",         # alias for key_scale
        "duration": "30",              # alias for audio_duration, str coercion
        "steps": 16,                   # alias for inference_steps
        "unknown_field": 123,          # ignored
    })
    assert req.prompt == "jazz"
    assert req.key_scale == "C major"
    assert req.audio_duration == 30.0
    assert req.inference_steps == 16


def test_jobstore_persistence_and_restart(tmp_path):
    persist = str(tmp_path / "persist")
    store = JobStore(persist_dir=persist)
    rec = store.create()
    store.mark_running(rec.job_id)
    rec2 = store.create()
    store.mark_succeeded(rec2.job_id, {"ok": True})

    # restart: running job becomes failed, finished one survives
    store2 = JobStore(persist_dir=persist)
    assert store2.get(rec.job_id).status == "failed"
    assert store2.get(rec2.job_id).status == "succeeded"
    assert store2.get(rec2.job_id).result == {"ok": True}
    # JSONL history recorded both terminal transitions
    with open(os.path.join(persist, "jobs_history.jsonl")) as f:
        lines = [json.loads(line) for line in f]
    assert {l["status"] for l in lines} == {"succeeded"}


def test_schema_coerces_string_list_fields():
    from acestep_tpu.serving.schemas import GenerateMusicRequest

    req = GenerateMusicRequest.from_dict(
        {"task_type": "complete", "track_classes": "drums"})
    assert req.track_classes == ["drums"]     # not per-character iteration
    req = GenerateMusicRequest.from_dict(
        {"track_classes": "drums, bass , vocals"})
    assert req.track_classes == ["drums", "bass", "vocals"]
    req = GenerateMusicRequest.from_dict({"track_classes": ["guitar"]})
    assert req.track_classes == ["guitar"]    # real lists pass through


def test_upload_format_sniffed_from_magic_bytes(tmp_path):
    """One shared upload_audio_format covers both src and ref uploads; the
    server corrects a wrong/missing claim from the container magic."""
    import base64

    from acestep_tpu.serving.openrouter import (
        base64_to_temp_file, sniff_audio_format)

    wav = b"RIFF\x24\x00\x00\x00WAVEfmt " + bytes(24)
    flac = b"fLaC" + bytes(16)
    ogg = b"OggS" + bytes(16)
    m4a = bytes(4) + b"ftypM4A " + bytes(8)
    mp3_id3 = b"ID3\x04\x00" + bytes(16)
    mp3_sync = b"\xff\xfb\x90\x00" + bytes(16)
    aac_adts = b"\xff\xf1\x50\x80" + bytes(16)
    assert sniff_audio_format(wav) == "wav"
    assert sniff_audio_format(flac) == "flac"
    assert sniff_audio_format(ogg) == "ogg"
    assert sniff_audio_format(m4a) == "m4a"
    assert sniff_audio_format(mp3_id3) == "mp3"
    assert sniff_audio_format(mp3_sync) == "mp3"
    assert sniff_audio_format(aac_adts) == "aac"
    assert sniff_audio_format(b"garbage") is None

    # an mp3 upload claiming "wav" (studio's single format field) lands
    # with the extension the decoder actually needs
    path = base64_to_temp_file(
        base64.b64encode(mp3_id3).decode(), "wav")
    try:
        assert path.endswith(".mp3")
    finally:
        os.unlink(path)
    # unrecognized bytes fall back to the claimed format
    path = base64_to_temp_file(base64.b64encode(b"garbage").decode(), "wav")
    try:
        assert path.endswith(".wav")
    finally:
        os.unlink(path)


def test_jobstore_terminal_fields_set_before_status_flip(tmp_path):
    """Lock-free readers of the live record (SSE loops) key on
    status=='succeeded'; result/error must already be visible then."""
    from acestep_tpu.serving.jobstore import JobRecord

    trace = []

    class TracingRecord(JobRecord):
        def __setattr__(self, key, value):
            object.__setattr__(self, key, value)
            if key in ("status", "result", "error"):
                trace.append((key, value))

    store = JobStore()
    rec = store.create()
    store._jobs[rec.job_id].__class__ = TracingRecord
    trace.clear()
    store.mark_succeeded(rec.job_id, {"audio": "x.wav"})
    keys = [k for k, _ in trace]
    assert keys.index("result") < keys.index("status")

    rec2 = store.create()
    store._jobs[rec2.job_id].__class__ = TracingRecord
    trace.clear()
    store.mark_failed(rec2.job_id, "boom")
    keys = [k for k, _ in trace]
    assert keys.index("error") < keys.index("status")


def test_jobstore_snapshot_only_on_create_and_terminal(tmp_path):
    """mark_running must not rewrite the O(all-jobs) snapshot (reload
    collapses queued and running to failed-by-restart either way)."""
    persist = str(tmp_path / "persist")
    store = JobStore(persist_dir=persist)
    rec = store.create()
    path = os.path.join(persist, "jobs.json")
    with open(path) as f:
        after_create = f.read()
    store.mark_running(rec.job_id)
    with open(path) as f:
        assert f.read() == after_create      # byte-identical: no rewrite
    store.mark_succeeded(rec.job_id, {"ok": 1})
    with open(path) as f:
        snap = json.load(f)
    assert snap["jobs"][0]["status"] == "succeeded"
    assert snap["jobs"][0]["result"] == {"ok": 1}


def test_result_cache_ttl(tmp_path):
    cache = LocalResultCache(str(tmp_path / "cache.json"))
    cache.set(RESULT_KEY_PREFIX + "a", [{"status": 1}], ex=1000)
    assert json.loads(cache.get(RESULT_KEY_PREFIX + "a"))[0]["status"] == 1
    cache.set(RESULT_KEY_PREFIX + "b", [{"status": 1}], ex=-1)
    assert cache.get(RESULT_KEY_PREFIX + "b") is None
    # restart survival
    cache2 = LocalResultCache(str(tmp_path / "cache.json"))
    assert cache2.get(RESULT_KEY_PREFIX + "a") is not None


def test_base64_audio_upload(server_env):
    import base64, io, wave
    state, handler, port = server_env
    # tiny 0.1s wav
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2); f.setsampwidth(2); f.setframerate(48000)
        f.writeframes(b"\x00\x00" * 2 * 4800)
    b64 = base64.b64encode(buf.getvalue()).decode()
    _, out = _post(port, "/release_task", {
        "prompt": "cover it", "task_type": "cover", "thinking": False,
        "src_audio_b64": b64, "upload_audio_format": "wav",
    })
    entry = _wait_done(port, out["data"]["task_id"])
    assert entry["status"] == 1
    call = handler.calls[-1]
    # src audio path was materialized and forwarded, then cleaned up
    assert call.get("src_audio") is None or isinstance(call["src_audio"], str)


def test_unknown_model_rejected_400(server_env):
    _, _, port = server_env
    status, out = _post(port, "/release_task",
                        {"prompt": "x", "model": "no-such-model",
                         "thinking": False})
    assert status == 400
    assert "no-such-model" in (out.get("error") or "")
    # valid model name still accepted
    status, _ = _post(port, "/release_task",
                      {"prompt": "x", "model": "acestep-v15-turbo-tpu",
                       "thinking": False})
    assert status == 200


def test_get_endpoints_require_api_key(tmp_path):
    out_dir = str(tmp_path / "outputs")
    handler = FakeDiTHandler(out_dir)
    state = AppState({"m": handler}, None, output_dir=out_dir,
                     api_key="sekrit")
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        status, _ = _get(port, "/v1/stats")
        assert status == 401
        status, _ = _get(port, "/v1/audio?path=/etc/passwd")
        assert status == 401
        status, _ = _get(port, "/health")      # health stays open
        assert status == 200
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/v1/stats",
                     headers={"Authorization": "Bearer sekrit"})
        assert conn.getresponse().status == 200
        conn.close()
        # query-param token: the studio's <audio src> cannot send headers
        status, _ = _get(port, "/v1/stats?ai_token=sekrit")
        assert status == 200
        status, _ = _get(port, "/v1/stats?ai_token=wrong")
        assert status == 401
    finally:
        state.shutdown()
        server.shutdown()
        server.server_close()


def test_rest_text2music_is_not_cover(server_env):
    """Regression: the schema's default instruction must not trip the
    handler's cover detection (it previously carried the LM/cover phrase)."""
    state, handler, port = server_env
    _, out = _post(port, "/release_task", {"prompt": "jazz",
                                           "thinking": False})
    _wait_done(port, out["data"]["task_id"])
    call = handler.calls[-1]
    assert call.get("task", "text2music") != "cover"
    instr = call.get("instructions")
    assert instr is None or "generate audio semantic tokens" not in \
        str(instr).lower()


def test_per_request_lm_swap(tmp_path, monkeypatch):
    """lm_model_path selects a cached per-path LM handler; unknown paths
    fall back to the default (reference _temporary_llm_model semantics)."""
    out_dir = str(tmp_path / "outputs")
    os.makedirs(out_dir, exist_ok=True)
    default_llm = object()
    state = AppState({"m": FakeDiTHandler(out_dir)}, default_llm,
                     output_dir=out_dir)

    built = []

    class FakeLLM:
        def initialize(self, checkpoint_dir=None, **kw):
            built.append(checkpoint_dir)

    import acestep_tpu.llm.handler as llm_mod
    monkeypatch.setattr(llm_mod, "LLMHandler", FakeLLM)

    # no path -> default
    assert state._select_llm(None)[0] is default_llm
    assert state._select_llm("")[0] is default_llm
    # unresolvable name (no egress, not a dir) -> default
    assert state._select_llm("not-a-model-xyz")[0] is default_llm

    ckpt_a = tmp_path / "lm-a"; ckpt_a.mkdir()
    ckpt_b = tmp_path / "lm-b"; ckpt_b.mkdir()
    ckpt_c = tmp_path / "lm-c"; ckpt_c.mkdir()
    a1, rel_a1 = state._select_llm(str(ckpt_a))
    a2, rel_a2 = state._select_llm(str(ckpt_a))
    assert a1 is a2 and built == [str(ckpt_a)]       # cache hit
    rel_a2()
    # a still held by rel_a1: filling past the cap must NOT evict it
    state._select_llm(str(ckpt_b))[1]()
    _, rel_c = state._select_llm(str(ckpt_c))
    assert str(ckpt_a) in state._llm_cache           # in-use: kept
    rel_a1()
    a3, _ = state._select_llm(str(ckpt_a))
    assert a3 is a1                                  # still cached
    rel_c()
    # with nothing held, a fourth model evicts down to the cap
    ckpt_d = tmp_path / "lm-d"; ckpt_d.mkdir()
    state._select_llm(str(ckpt_d))[1]()
    assert len(state._llm_cache) == state.max_cached_llms


def test_multipart_release_task_with_upload(server_env, tmp_path):
    """Reference API 'Method B': multipart/form-data with form fields and a
    src_audio file upload (docs/en/API.md; api_server.py:1149-1171). The
    uploaded file must land on disk and override src_audio_path."""
    _, handler, port = server_env
    wav_bytes = b"RIFF....fakewav-payload"
    boundary = "----acestepboundary123"

    def part(name, value, filename=None):
        head = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            head += f'; filename="{filename}"'
            head += "\r\nContent-Type: application/octet-stream"
        body = value if isinstance(value, bytes) else value.encode()
        return (f"--{boundary}\r\n{head}\r\n\r\n").encode() + body + b"\r\n"

    payload = (part("prompt", "piano etude")
               + part("lyrics", "[inst]")
               + part("thinking", "false")
               + part("batch_size", "2")
               # src audio only applies to edit tasks (text2music drops it,
               # matching the reference's stale-src guard)
               + part("task_type", "repaint")
               + part("src_audio_path", "/should/be/overridden.wav")
               + part("src_audio", wav_bytes, filename="upload.wav")
               + f"--{boundary}--\r\n".encode())

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("POST", "/release_task", payload, {
        "Content-Type": f"multipart/form-data; boundary={boundary}",
        "Content-Length": str(len(payload)),
    })
    resp = conn.getresponse()
    out = json.loads(resp.read().decode())
    conn.close()
    assert resp.status == 200, out
    entry = _wait_done(port, out["data"]["task_id"])
    assert entry["status"] == 1, entry

    call = handler.calls[-1]
    assert call["batch_size"] == 2
    src = call.get("src_audio")
    assert src and src != "/should/be/overridden.wav"
    assert handler.src_contents[-1] == wav_bytes
    # upload temp file is cleaned after the job (leak guard)
    assert not os.path.exists(src)


def test_result_cache_ttl_refresh_skips_spill(tmp_path):
    """Re-setting an identical payload (a client polling an expired task
    re-caches it from the job store every poll) must not rewrite the spill
    file — round-4 review pin against per-poll full-file fsync churn."""
    path = tmp_path / "cache.json"
    cache = LocalResultCache(str(path))
    cache.set("k", {"a": 1})
    before = path.read_bytes(), path.stat().st_mtime_ns
    for _ in range(5):
        cache.set("k", {"a": 1})       # TTL-only refresh
    assert (path.read_bytes(), path.stat().st_mtime_ns) == before
    cache.set("k", {"a": 2})           # real change DOES spill
    assert path.read_bytes() != before[0]


def test_cleanup_request_temp_files_unlinks_uploads(tmp_path, monkeypatch):
    """Jobs rejected with queue.Full never reach _run_one_job's finally;
    the enqueue error path must clean the upload temp files itself."""
    import tempfile

    from acestep_tpu.serving.schemas import GenerateMusicRequest
    from acestep_tpu.serving.server import AppState

    f = tempfile.NamedTemporaryFile(prefix="acestep_upload_", suffix=".wav",
                                    delete=False)
    f.write(b"x")
    f.close()
    keep = tmp_path / "user_supplied.wav"
    keep.write_bytes(b"x")
    req = GenerateMusicRequest(src_audio_path=f.name,
                               reference_audio_path=str(keep))
    AppState._cleanup_request_temp_files(object.__new__(AppState), req)
    assert not os.path.exists(f.name)          # our upload: removed
    assert keep.exists()                       # user path: untouched


def test_generation_info_labels_actual_saved_format():
    """An unknown requested format falls back in AudioSaver — the timing
    summary must label the format actually written (file extension), not
    the requested string."""
    from acestep_tpu.serving.server import _actual_audio_format

    assert _actual_audio_format("notaformat", "/o/x.wav") == "wav"
    assert _actual_audio_format("ogg", "/o/x.flac") == "flac"
    assert _actual_audio_format("wav32", "/o/x.wav") == "wav32"
    assert _actual_audio_format("wav", "/o/x.wav") == "wav"
    assert _actual_audio_format("mp3", "/o/x.mp3") == "mp3"
    assert _actual_audio_format(None, "") == "flac"
    assert _actual_audio_format("ogg", "") == "ogg"


def test_params_sidecar_written_and_served(server_env):
    """Every generated audio gets a {name}.json reproducibility sidecar
    (reference generation_progress.py:224-237) surfaced as params_file
    and downloadable through /v1/audio."""
    state, handler, port = server_env
    _, out = _post(port, "/release_task",
                   {"prompt": "sidecar", "thinking": False, "seed": 7,
                    "use_random_seed": False})
    entry = _wait_done(port, out["data"]["task_id"])
    assert entry["status"] == 1
    results = json.loads(entry["result"])
    pf = results[0].get("params_file", "")
    assert pf.endswith(".json") and os.path.exists(pf)
    with open(pf, "r", encoding="utf-8") as f:
        params = json.load(f)
    assert params["caption"] == "sidecar"
    assert params["seed"] == results[0]["seed_value"] or \
        str(params["seed"]) == results[0]["seed_value"]
    status, raw = _get(port, f"/v1/audio?path={pf}")
    assert status == 200
    served = raw if isinstance(raw, dict) else json.loads(raw.decode())
    assert served["caption"] == "sidecar"


def test_audio_codes_field_reaches_handler(server_env):
    """The REST audio_codes field (UI codes-paste parity: the reference
    routes text2music_audio_code_string into params.audio_codes) flows
    to the DiT handler as audio_code_hints."""
    state, handler, port = server_env
    codes = "<|audio_code_1|><|audio_code_2|>"
    _, out = _post(port, "/release_task",
                   {"prompt": "x", "thinking": False, "audio_codes": codes})
    entry = _wait_done(port, out["data"]["task_id"])
    assert entry["status"] == 1
    assert handler.calls[-1].get("audio_code_hints") == codes


def test_cancel_task_dequeues_and_guards_states(tmp_path):
    """/v1/cancel_task (beyond the reference): a queued job cancels and
    never renders; running/finished jobs are reported, not interrupted."""
    import threading as _t

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)

    gate = _t.Event()

    class SlowHandler(FakeDiTHandler):
        def generate_music(self, **kwargs):
            gate.wait(timeout=30)            # hold the single worker
            return super().generate_music(**kwargs)

    handler = SlowHandler(out_dir)
    state = AppState({"tiny": handler}, None, output_dir=out_dir,
                     worker_count=1)
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        body = {"prompt": "x", "thinking": False}
        _, a = _post(port, "/release_task", body)   # occupies the worker
        _, b = _post(port, "/release_task", body)   # stays queued
        tid_a, tid_b = a["data"]["task_id"], b["data"]["task_id"]
        time.sleep(0.3)

        _, out = _post(port, "/v1/cancel_task", {"task_id": tid_b})
        assert out["data"]["status"] == "canceled"
        # a running render cannot be interrupted
        _, out = _post(port, "/v1/cancel_task", {"task_id": tid_a})
        assert out["data"]["status"] == "running"
        _, out = _post(port, "/v1/cancel_task", {"task_id": "nope"})
        assert out["data"]["status"] == "not_found"

        gate.set()
        entry_a = _wait_done(port, tid_a)
        assert entry_a["status"] == 1
        entry_b = _wait_done(port, tid_b)
        assert entry_b["status"] == 2               # canceled -> failed
        # the canceled job never rendered: only one generate call happened
        assert len(handler.calls) == 1
        # cancel after completion is a no-op report
        _, out = _post(port, "/v1/cancel_task", {"task_id": tid_a})
        assert out["data"]["status"] == "succeeded"
    finally:
        gate.set()
        state.shutdown()
        server.shutdown()
        server.server_close()


def test_metrics_prometheus_exposition(server_env):
    """/metrics serves Prometheus text (beyond the reference's JSON
    /v1/stats): job gauges, queue depth, uptime."""
    state, handler, port = server_env
    _, out = _post(port, "/release_task", {"prompt": "x", "thinking": False})
    _wait_done(port, out["data"]["task_id"])
    status, raw = _get(port, "/metrics")
    assert status == 200
    text = raw if isinstance(raw, str) else raw.decode()
    assert 'acestep_jobs{status="succeeded"} 1' in text
    assert "acestep_queue_depth 0" in text
    assert "acestep_uptime_seconds" in text
    assert "acestep_avg_job_seconds" in text


# ---------------------------------------------------------------------------
# Cross-request render coalescing (reference analog: nano-vllm scheduler
# batching concurrent sequences, engine/scheduler.py:33-101)
# ---------------------------------------------------------------------------


def _coalesce_state(tmp_path):
    """AppState WITHOUT workers: tests drive the dispatch path directly."""
    out_dir = str(tmp_path / "co_out")
    os.makedirs(out_dir, exist_ok=True)
    handler = FakeDiTHandler(out_dir)
    state = AppState({"acestep-v15-turbo-tpu": handler}, None,
                     output_dir=out_dir,
                     persist_dir=str(tmp_path / "co_persist"))
    return state, handler


def _enqueue(state, req):
    rec = state.job_store.create()
    with state.pending_lock:
        state.pending_ids.append(rec.job_id)
    state.job_queue.put_nowait((rec.job_id, req))
    return rec.job_id


def test_coalescing_fuses_compatible_jobs_into_one_render(tmp_path):
    state, handler = _coalesce_state(tmp_path)
    reqs = [GenerateMusicRequest(prompt=f"song {i}", lyrics="[inst]",
                                 audio_duration=30.0, seed=i,
                                 use_random_seed=False, thinking=False)
            for i in range(3)]
    ids = [_enqueue(state, r) for r in reqs]

    head_id, head_req = state.job_queue.get()
    assert state._claim_job(head_id, head_req)
    group, leftovers = state._drain_compatible(head_id, head_req)
    assert [jid for jid, _ in group] == ids and not leftovers
    state._run_job_group(group)

    # ONE fused handler call, batch 3, per-item conditioning + seeds
    assert len(handler.calls) == 1
    call = handler.calls[0]
    assert call["batch_size"] == 3
    assert call["captions"] == ["song 0", "song 1", "song 2"]
    assert call["seeds"] == [0, 1, 2]
    assert call["use_random_seed"] is False
    for jid in ids:
        rec = state.job_store.get(jid)
        assert rec.status == "succeeded"
        assert rec.result["extra_outputs"]["coalesced_jobs"] == 3
        assert len(rec.result["audios"]) == 1     # one song per job
    with state.stats_lock:
        assert state.coalesced_jobs_total == 3


def test_coalescing_stops_at_incompatible_job(tmp_path):
    state, handler = _coalesce_state(tmp_path)
    a = GenerateMusicRequest(prompt="a", audio_duration=30.0, thinking=False)
    b = GenerateMusicRequest(prompt="b", audio_duration=30.0, thinking=False)
    c = GenerateMusicRequest(prompt="c", audio_duration=60.0, thinking=False)
    d = GenerateMusicRequest(prompt="d", audio_duration=30.0, thinking=False)
    for r in (a, b, c, d):
        _enqueue(state, r)

    head_id, head_req = state.job_queue.get()
    assert state._claim_job(head_id, head_req)
    group, leftovers = state._drain_compatible(head_id, head_req)
    # run of compatible keys ends at c: [a, b] fuse, c runs alone next,
    # d stays queued (FIFO preserved past the break)
    assert [r.prompt for _, r in group] == ["a", "b"]
    assert [r.prompt for _, r in leftovers] == ["c"]
    assert state.job_queue.qsize() == 1


def test_non_coalescable_head_never_drains(tmp_path):
    state, handler = _coalesce_state(tmp_path)
    think = GenerateMusicRequest(prompt="t", audio_duration=30.0,
                                 thinking=True)
    plain = GenerateMusicRequest(prompt="p", audio_duration=30.0,
                                 thinking=False)
    _enqueue(state, think)
    _enqueue(state, plain)
    head_id, head_req = state.job_queue.get()
    group, leftovers = state._drain_compatible(head_id, head_req)
    assert len(group) == 1 and not leftovers
    assert state.job_queue.qsize() == 1

    # the predicate itself: every excluded mode returns None
    from acestep_tpu.serving.server import _coalesce_key
    assert _coalesce_key(plain) is not None
    for bad in (
        GenerateMusicRequest(thinking=True, audio_duration=30.0),
        GenerateMusicRequest(audio_duration=30.0, task_type="cover"),
        GenerateMusicRequest(audio_duration=30.0, want_lrc=True),
        GenerateMusicRequest(audio_duration=30.0, batch_size=2),
        GenerateMusicRequest(audio_duration=30.0, audio_codes="<x>"),
        GenerateMusicRequest(audio_duration=30.0,
                             src_audio_path="/tmp/x.wav"),
        GenerateMusicRequest(),                   # no pinned duration
        GenerateMusicRequest(audio_duration=30.0, analysis_only=True),
    ):
        assert _coalesce_key(bad) is None
    # differing render knobs split groups
    assert _coalesce_key(plain) != _coalesce_key(
        GenerateMusicRequest(audio_duration=30.0, inference_steps=16))


def test_coalescing_respects_canceled_jobs(tmp_path):
    state, handler = _coalesce_state(tmp_path)
    a = GenerateMusicRequest(prompt="a", audio_duration=30.0)
    b = GenerateMusicRequest(prompt="b", audio_duration=30.0)
    c = GenerateMusicRequest(prompt="c", audio_duration=30.0)
    ids = [_enqueue(state, r) for r in (a, b, c)]
    state.cancel_task(ids[1])

    head_id, head_req = state.job_queue.get()
    assert state._claim_job(head_id, head_req)
    group, leftovers = state._drain_compatible(head_id, head_req)
    assert [jid for jid, _ in group] == [ids[0], ids[2]]
    state._run_job_group(group)
    assert handler.calls[0]["batch_size"] == 2
    assert state.job_store.get(ids[1]).status == "failed"   # canceled


def test_generate_music_group_per_job_results(tmp_path):
    """inference.generate_music_group: per-job entries, sidecars, seeds."""
    from acestep_tpu import inference as inf

    out_dir = str(tmp_path / "grp_out")
    os.makedirs(out_dir, exist_ok=True)
    handler = FakeDiTHandler(out_dir)
    jobs = []
    for i in range(2):
        params = inf.GenerationParams(caption=f"c{i}", lyrics="[inst]",
                                      duration=20.0, seed=i,
                                      thinking=False)
        config = inf.GenerationConfig(batch_size=1, output_dir=out_dir,
                                      audio_format="wav")
        jobs.append((params, config))
    results = inf.generate_music_group(handler, None, jobs)
    assert len(results) == 2 and all(r.success for r in results)
    for i, r in enumerate(results):
        entry = r.audios[0]
        assert entry["params"]["caption"] == f"c{i}"
        assert os.path.exists(entry["params_path"])   # sidecar json
        assert r.extra_outputs["coalesced_jobs"] == 2
    # distinct result keys: the uuid folds per-job params + seed
    assert results[0].audios[0]["key"] != results[1].audios[0]["key"]


def test_coalesced_jobs_visible_in_stats(server_env):
    state, handler, port = server_env
    status, out = _get(port, "/v1/stats")
    assert "coalesced_jobs_total" in out["data"]
