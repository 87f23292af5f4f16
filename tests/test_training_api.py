"""Training API + studio UI route tests (tiny real training run)."""

import json
import http.client
import os
import threading
import time

import jax
import numpy as np
import pytest

# slow tier: live-server training API flows
pytestmark = pytest.mark.slow

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.pipeline.handler import AceStepHandler
from acestep_tpu.serving import AppState, create_server
from tests.test_serving import _get, _post


@pytest.fixture()
def tiny_server(tmp_path):
    handler = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        frame_bucket=8, min_frames=8)
    handler.initialize_service()
    state = AppState({"tiny": handler}, None,
                     output_dir=str(tmp_path / "out"))
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield handler, state, server.server_address[1], tmp_path
    state.shutdown()
    server.shutdown()
    server.server_close()


def _make_tensor_dir(handler, path, n=3):
    from acestep_tpu.training.preprocess import preprocess_samples

    samples = [{"audio": np.zeros((1920 * 4, 2), np.float32),
                "caption": f"s{i}", "lyrics": "[inst]"} for i in range(n)]
    list(preprocess_samples(handler, samples, str(path)))
    return str(path)


def test_training_lifecycle_over_http(tiny_server):
    handler, state, port, tmp_path = tiny_server
    tensor_dir = _make_tensor_dir(handler, tmp_path / "tensors")

    status, out = _post(port, "/v1/training/start", {
        "dataset_dir": tensor_dir,
        "config": {"rank": 2, "max_steps": 3, "batch_size": 1,
                   "checkpoint_every": 0, "log_every": 1,
                   "output_dir": str(tmp_path / "lora_out"),
                   "adapter_name": "api_adapter"},
    })
    assert status == 200 and out["data"]["status"] == "started"

    # double-start rejected while running or done after completion
    deadline = time.time() + 120
    while time.time() < deadline:
        _, st = _get(port, "/v1/training/status")
        if st["data"]["status"] in ("completed", "failed"):
            break
        time.sleep(0.3)
    assert st["data"]["status"] == "completed", st["data"]
    assert st["data"]["step"] == 3
    assert any(e["loss"] is not None for e in st["data"]["events"])
    # metrics JSONL written
    with open(tmp_path / "lora_out" / "metrics.jsonl") as f:
        rows = [json.loads(line) for line in f]
    assert rows and rows[-1]["step"] == 3
    # trained adapter auto-loaded into the LoRA runtime
    assert handler.lora.status()["active_adapter"] == "api_adapter"
    # lora status endpoint reflects it
    _, lst = _get(port, "/v1/lora/status")
    assert lst["data"]["active_adapter"] == "api_adapter"


def test_training_on_quantized_service_dequantizes_base(tmp_path):
    """A server running a quantized DiT must train against dequantized
    weights (reference switches to its unquantized training preset,
    training_preset.py) — training on int8 leaves would break the step."""
    from acestep_tpu.serving.training_service import TrainingService

    handler = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        frame_bucket=8, min_frames=8)
    handler.initialize_service(quantization="int8")
    tensor_dir = _make_tensor_dir(handler, tmp_path / "tensors")
    svc = TrainingService(handler)
    svc.start(dataset_dir=tensor_dir,
              config={"rank": 2, "max_steps": 2, "batch_size": 1,
                      "checkpoint_every": 0, "log_every": 1,
                      "output_dir": str(tmp_path / "q_out"),
                      "adapter_name": "q_adapter"})
    deadline = time.time() + 180
    while time.time() < deadline:
        st = svc.status()
        if st["status"] in ("completed", "failed"):
            break
        time.sleep(0.3)
    assert st["status"] == "completed", st
    assert st.get("dequantized_base") is True
    assert st["step"] == 2


def test_training_stop_and_restart(tiny_server):
    handler, state, port, tmp_path = tiny_server
    tensor_dir = _make_tensor_dir(handler, tmp_path / "tensors2")
    _post(port, "/v1/training/start", {
        "dataset_dir": tensor_dir,
        "config": {"rank": 2, "max_steps": 500, "batch_size": 1,
                   "checkpoint_every": 0, "log_every": 1,
                   "output_dir": str(tmp_path / "lora_out2")}})
    status, out = _post(port, "/v1/training/start", {
        "dataset_dir": tensor_dir, "config": {}})
    assert status == 409
    _, out = _post(port, "/v1/training/stop", {})
    assert out["data"]["status"] == "stopping"
    deadline = time.time() + 120
    while time.time() < deadline:
        _, st = _get(port, "/v1/training/status")
        if st["data"]["status"] in ("stopped", "completed", "failed"):
            break
        time.sleep(0.3)
    assert st["data"]["status"] in ("stopped", "completed")


def test_studio_ui_served(tiny_server):
    _, _, port, _ = tiny_server
    status, raw = _get(port, "/")
    assert status == 200
    assert b"ACE-Step" in raw and b"/release_task" in raw


def test_analysis_flows(tmp_path):
    """analysis_only is caption/lyrics metadata planning (NO src audio,
    ref api_server.py:1887-1899); full_analysis_only is src audio -> codes
    -> LM understand at the fixed 0.3 temperature (:1852-1885)."""
    import wave

    from acestep_tpu.llm.handler import LLMHandler

    handler = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        frame_bucket=8, min_frames=8)
    handler.initialize_service()
    llm = LLMHandler()
    llm.initialize(num_fallback_codes=64000)   # match the DiT FSQ code space
    state = AppState({"tiny": handler}, llm, output_dir=str(tmp_path / "o"))
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]

    def run(body):
        _, out = _post(port, "/release_task", body)
        task_id = out["data"]["task_id"]
        deadline = time.time() + 120
        while time.time() < deadline:
            _, res = _post(port, "/query_result", {"task_id_list": [task_id]})
            entry = res["data"][0]
            if entry["status"] != 0:
                return entry
            time.sleep(0.3)
        raise TimeoutError

    try:
        # text-only metadata planning: no src audio required
        entry = run({"analysis_only": True, "prompt": "a jazz waltz",
                     "thinking": False})
        assert entry["status"] == 1, entry
        payload = json.loads(entry["result"])[0]
        assert payload["stage"] == "succeeded"

        # deep audio analysis still requires src audio
        wav_path = str(tmp_path / "src.wav")
        with wave.open(wav_path, "wb") as f:
            f.setnchannels(2); f.setsampwidth(2); f.setframerate(48000)
            f.writeframes(b"\x01\x00" * 2 * 9600)
        entry = run({"full_analysis_only": True, "src_audio_path": wav_path,
                     "thinking": False})
        assert entry["status"] == 1, entry
        payload = json.loads(entry["result"])[0]
        assert payload["stage"] == "succeeded"

        # pasted codes transcribe directly, no src audio needed
        # (reference UI transcribe_audio_codes, llm_actions.py:83)
        codes = "".join(f"<|audio_code_{i * 11}|>" for i in range(8))
        entry = run({"full_analysis_only": True, "audio_codes": codes,
                     "thinking": False})
        assert entry["status"] == 1, entry

        entry = run({"full_analysis_only": True, "thinking": False})
        assert entry["status"] == 2      # no src and no codes: failure
    finally:
        state.shutdown()
        server.shutdown()
        server.server_close()


def test_tensor_info_and_export(tiny_server):
    handler, state, port, tmp_path = tiny_server
    tensor_dir = _make_tensor_dir(handler, tmp_path / "tensors3")
    _, out = _post(port, "/v1/training/load_tensor_info",
                   {"dataset_dir": tensor_dir})
    assert out["data"]["num_samples"] == 3
    assert out["data"]["frames_max"] >= out["data"]["frames_min"] > 0

    status, _ = _post(port, "/v1/training/load_tensor_info",
                      {"dataset_dir": str(tmp_path / "nope")})
    assert status == 404

    # quick training run, then export lists the adapter artifact
    _post(port, "/v1/training/start", {
        "dataset_dir": tensor_dir,
        "config": {"rank": 2, "max_steps": 2, "batch_size": 1,
                   "checkpoint_every": 0, "log_every": 1,
                   "output_dir": str(tmp_path / "exp_out"),
                   "adapter_name": "exported"}})
    deadline = time.time() + 120
    while time.time() < deadline:
        _, st = _get(port, "/v1/training/status")
        if st["data"]["status"] in ("completed", "failed"):
            break
        time.sleep(0.3)
    _, out = _post(port, "/v1/training/export", {})
    assert any(p.endswith("exported.npz") for p in out["data"]["adapters"])


def test_training_start_with_preset(tiny_server):
    handler, state, port, tmp_path = tiny_server
    tensor_dir = _make_tensor_dir(handler, tmp_path / "tensors_p")
    status, out = _post(port, "/v1/training/start", {
        "dataset_dir": tensor_dir, "preset": "quick",
        "config": {"max_steps": 2, "checkpoint_every": 0, "log_every": 1,
                   "output_dir": str(tmp_path / "p_out")}})
    assert status == 200
    cfg = out["data"]["config"]
    assert cfg["rank"] == 8            # from 'quick' preset
    assert cfg["max_steps"] == 2       # explicit override wins
    deadline = time.time() + 120
    while time.time() < deadline:
        _, st = _get(port, "/v1/training/status")
        if st["data"]["status"] in ("completed", "failed"):
            break
        time.sleep(0.3)
    assert st["data"]["status"] == "completed"


def test_want_lrc_flows_through_rest(tmp_path):
    handler = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        frame_bucket=16, min_frames=16)
    handler.initialize_service()
    state = AppState({"tiny": handler}, None, output_dir=str(tmp_path / "o"))
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        _, out = _post(port, "/release_task", {
            "prompt": "song", "lyrics": "la la\nla la",
            "audio_duration": 0.6, "thinking": False, "want_lrc": True})
        task_id = out["data"]["task_id"]
        deadline = time.time() + 180
        while time.time() < deadline:
            _, res = _post(port, "/query_result", {"task_id_list": [task_id]})
            entry = res["data"][0]
            if entry["status"] != 0:
                break
            time.sleep(0.3)
        assert entry["status"] == 1, entry
        item = json.loads(entry["result"])[0]
        assert "lrc" in item, item.get("lrc_error", item)
        assert isinstance(item["lrc"], str)
        assert 0.0 <= item["alignment_score"]["score"] <= 1.0
    finally:
        state.shutdown()
        server.shutdown()
        server.server_close()


def test_metrics_endpoint(tiny_server):
    handler, state, port, tmp_path = tiny_server
    run_dir = tmp_path / "runX"
    run_dir.mkdir()
    with open(run_dir / "metrics.jsonl", "w") as f:
        for i in range(10):
            f.write(json.dumps({"step": i, "loss": 1.0 / (i + 1)}) + "\n")
    status, out = _get(port,
                       f"/v1/training/metrics?output_dir={run_dir}")
    assert status == 200
    data = out["data"]
    assert data["points"] == 10 and data["loss"][0] == 1.0
    # downsampling keeps the last point
    state.training._state["output_dir"] = str(run_dir)
    m = state.training.metrics(max_points=4)
    assert m["steps"][-1] == 9 and len(m["steps"]) <= 5


def test_training_start_without_dataset_rejected_400(tiny_server):
    """Missing dataset_dir/manifest_path must fail the request up front,
    not return 200 and flip to failed asynchronously."""
    _, state, port, _ = tiny_server
    status, out = _post(port, "/v1/training/start",
                        {"config": {"max_steps": 1}})
    assert status == 400
    assert "dataset_dir or manifest_path" in (out["error"] or "")
    assert state.training.status()["status"] == "idle"


def test_tensorboard_endpoints_graceful(tiny_server, monkeypatch):
    handler, state, port, tmp_path = tiny_server
    import shutil as _shutil
    monkeypatch.setattr(_shutil, "which", lambda name: None)
    status, out = _post(port, "/v1/training/tensorboard/start", {})
    assert status == 503 and "metrics" in (out["error"] or "")
    status, out = _post(port, "/v1/training/tensorboard/stop", {})
    assert out["data"]["status"] == "not_running"


def test_dataset_build_over_http(tiny_server):
    import wave

    handler, state, port, tmp_path = tiny_server
    audio_dir = tmp_path / "raw"
    audio_dir.mkdir()
    for name in ("a.wav", "b.wav"):
        with wave.open(str(audio_dir / name), "wb") as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(48000)
            f.writeframes(b"\x00\x00" * 2 * 4800)

    status, out = _post(port, "/v1/dataset/build", {
        "audio_dir": str(audio_dir), "out_dir": str(tmp_path / "ds"),
        "val_fraction": 0.0})
    assert status == 200 and out["data"]["status"] == "started"
    deadline = time.time() + 120
    while time.time() < deadline:
        _, st = _get(port, "/v1/dataset/status")
        if st["data"]["status"] in ("completed", "failed"):
            break
        time.sleep(0.3)
    assert st["data"]["status"] == "completed", st["data"]
    assert st["data"]["result"]["num_samples"] == 2
    assert st["data"]["progress"]["encoded"] == 2
    # a missing dir inside the safe root -> 404; outside it -> 400
    status, _ = _post(port, "/v1/dataset/build",
                      {"audio_dir": str(tmp_path / "no_such_dir")})
    assert status == 404
    status, _ = _post(port, "/v1/dataset/build",
                      {"audio_dir": "/no/such/dir"})
    assert status == 400


def test_tensorboard_empty_logdir_is_an_error(tiny_server, tmp_path):
    """A logdir with neither tfevents nor metrics.jsonl must fail with a
    diagnostic, not launch a blank dashboard."""
    handler, state, port, _ = tiny_server
    empty = tmp_path / "empty_logs"
    empty.mkdir()
    status, out = _post(port, "/v1/training/tensorboard/start",
                        {"logdir": str(empty)})
    assert status == 503
    assert "no tfevents" in (out["error"] or "")


def _put(port, route, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("PUT", route, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read().decode())
    conn.close()
    return resp.status, data


def test_dataset_session_workflow_over_http(tiny_server):
    """Reference train_api_dataset_service.py surface: scan -> samples ->
    edit (PUT) -> save -> auto_label_async + status -> preprocess_async +
    status, plus the error statuses (no session 400, bad index 404)."""
    import wave

    handler, state, port, tmp_path = tiny_server

    # before any scan: session routes reject cleanly
    status, _ = _get(port, "/v1/dataset/samples")
    assert status == 400
    status, out = _get(port, "/v1/dataset/auto_label_status")
    assert status == 200 and out["data"]["status"] == "idle"

    audio_dir = tmp_path / "sess_raw"
    audio_dir.mkdir()
    for name in ("a.wav", "b.wav"):
        with wave.open(str(audio_dir / name), "wb") as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(48000)
            f.writeframes(b"\x00\x00" * 2 * 9600)
    (audio_dir / "a.txt").write_text("some words")

    status, out = _post(port, "/v1/dataset/scan", {
        "audio_dir": str(audio_dir), "dataset_name": "http_set",
        "custom_tag": "acid", "tag_position": "prepend"})
    assert status == 200 and out["data"]["num_samples"] == 2
    samples = out["data"]["samples"]
    assert samples[0]["filename"] == "a.wav"
    assert samples[0]["raw_lyrics"] == "some words"
    assert samples[0]["custom_tag"] == "acid"

    # single-sample fetch + edit via PUT
    status, out = _get(port, "/v1/dataset/sample/1")
    assert status == 200 and out["data"]["filename"] == "b.wav"
    status, out = _put(port, "/v1/dataset/sample/1",
                       {"caption": "edited cap", "bpm": 123})
    assert status == 200
    assert out["data"]["sample"]["caption"] == "edited cap"
    status, _ = _get(port, "/v1/dataset/sample/9")
    assert status == 404

    # auto-label async (no LLM on this server: filename-caption fallback)
    status, out = _post(port, "/v1/dataset/auto_label_async",
                        {"only_unlabeled": False})
    assert status == 200
    task_id = out["data"]["task_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        _, st = _get(port, f"/v1/dataset/auto_label_status/{task_id}")
        if st["data"]["status"] in ("completed", "failed"):
            break
        time.sleep(0.2)
    assert st["data"]["status"] == "completed", st["data"]
    assert st["data"]["result"]["labeled_count"] == 2

    # save with genre ratio; file has the reference schema
    save_path = tmp_path / "sess.json"
    status, out = _post(port, "/v1/dataset/save", {
        "save_path": str(save_path), "genre_ratio": 50})
    assert status == 200 and os.path.exists(save_path)
    raw = json.load(open(save_path))
    assert raw["metadata"]["genre_ratio"] == 50
    assert raw["samples"][1]["caption"] == "edited cap"

    # preprocess async -> tensors on disk
    out_dir = tmp_path / "sess_tensors"
    status, out = _post(port, "/v1/dataset/preprocess_async",
                        {"output_dir": str(out_dir)})
    assert status == 200
    task_id = out["data"]["task_id"]
    deadline = time.time() + 120
    while time.time() < deadline:
        _, st = _get(port, f"/v1/dataset/preprocess_status/{task_id}")
        if st["data"]["status"] in ("completed", "failed"):
            break
        time.sleep(0.2)
    assert st["data"]["status"] == "completed", st["data"]
    files = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
    assert len(files) == 2

    # reload the saved dataset into a fresh session
    status, out = _post(port, "/v1/dataset/load",
                        {"dataset_path": str(save_path)})
    assert status == 200 and out["data"]["labeled_count"] == 2
