"""Launcher env-var parity and lazy startup (--no-init).

Covers the reference's `.env` surface (/root/reference/.env.example,
api_server.py:2167,2316-2349,1528): ACESTEP_NO_INIT lazy loading,
ACESTEP_INIT_LLM force modes, ACESTEP_LM_MODEL_PATH name/path mapping,
and ACESTEP_DOWNLOAD_SOURCE hub preference.
"""

import os
import threading
import time

import pytest

from acestep_tpu.serving import AppState, create_server
from acestep_tpu.serving.server import _env_bool, _resolve_lm_env
from tests.test_serving import FakeDiTHandler, _get, _post, _wait_done


def test_env_bool():
    for raw, expect in [("1", True), ("true", True), ("YES", True),
                        ("on", True), ("0", False), ("false", False),
                        ("no", False), ("", False), ("garbage", False)]:
        os.environ["_ACESTEP_TEST_BOOL"] = raw
        assert _env_bool("_ACESTEP_TEST_BOOL") is expect, raw
    del os.environ["_ACESTEP_TEST_BOOL"]
    assert _env_bool("_ACESTEP_TEST_BOOL", default=True) is True


def test_resolve_lm_env_maps_names_and_paths(tmp_path):
    # empty -> nothing
    assert _resolve_lm_env(None) == (None, None)
    assert _resolve_lm_env("  ") == (None, None)
    # reference model names -> size (api_server.py:1528 default names)
    assert _resolve_lm_env("acestep-5Hz-lm-1.7B") == (None, "1.7B")
    assert _resolve_lm_env("acestep-5Hz-lm-0.6B") == (None, "0.6B")
    assert _resolve_lm_env("acestep-5Hz-lm-4B") == (None, "4B")
    # a bare size works too
    assert _resolve_lm_env("1.7b") == (None, "1.7B")
    # an existing directory -> explicit checkpoint dir
    d = tmp_path / "my-lm"
    d.mkdir()
    assert _resolve_lm_env(str(d)) == (str(d), None)
    # unrecognizable name -> tier auto selection
    assert _resolve_lm_env("acestep-5Hz-lm-huge") == (None, "auto")


def test_lazy_init_runs_once_on_first_job(tmp_path):
    """--no-init defers the model load to the first request and runs it
    exactly once across concurrent jobs (reference api_server.py:2167)."""
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    handler = FakeDiTHandler(out_dir)
    calls = []

    state = AppState({"tiny": handler}, None, output_dir=out_dir,
                     worker_count=2,
                     lazy_init=lambda: calls.append(1))
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        body = {"prompt": "p", "lyrics": "[inst]", "audio_duration": 1,
                "thinking": False}
        ids = []
        for _ in range(3):
            status, data = _post(port, "/release_task", body)
            assert status == 200, data
            ids.append(data["data"]["task_id"])
        entries = [_wait_done(port, tid) for tid in ids]
        assert all(e["status"] == 1 for e in entries)
        assert calls == [1]          # ran exactly once, before any job
        assert handler.calls         # jobs actually generated
    finally:
        state.shutdown()
        server.shutdown()
        server.server_close()


def test_lazy_init_failure_is_retried(tmp_path):
    """A failed lazy load stays armed: the job fails, the next one
    retries the load."""
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    handler = FakeDiTHandler(out_dir)
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("transient load failure")

    state = AppState({"tiny": handler}, None, output_dir=out_dir,
                     lazy_init=flaky)
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        body = {"prompt": "p", "lyrics": "[inst]", "audio_duration": 1,
                "thinking": False}

        def run_job():
            _, data = _post(port, "/release_task", body)
            return _wait_done(port, data["data"]["task_id"])["status"]

        assert run_job() == 2       # first load attempt raised -> failed
        assert run_job() == 1       # second attempt loaded
        assert len(attempts) == 2
    finally:
        state.shutdown()
        server.shutdown()
        server.server_close()


def test_download_source_env_orders_hubs(monkeypatch):
    """ACESTEP_DOWNLOAD_SOURCE picks the primary hub without a
    reachability probe (reference api_server.py:194)."""
    from acestep_tpu.utils import downloads

    order = []

    def fake_hf(repo_id, target):
        order.append("huggingface")
        raise OSError("offline")

    def fake_ms(repo_id, target):
        order.append("modelscope")
        raise OSError("offline")

    monkeypatch.setattr(downloads, "_download_hf", fake_hf)
    monkeypatch.setattr(downloads, "_download_modelscope", fake_ms)
    monkeypatch.setattr(downloads, "_probe",
                        lambda *a, **k: pytest.fail("probe called"))

    monkeypatch.setenv("ACESTEP_DOWNLOAD_SOURCE", "modelscope")
    with pytest.raises(RuntimeError):
        downloads.smart_download("x/y", "/tmp/nowhere")
    assert order == ["modelscope", "huggingface"]

    order.clear()
    monkeypatch.setenv("ACESTEP_DOWNLOAD_SOURCE", "huggingface")
    with pytest.raises(RuntimeError):
        downloads.smart_download("x/y", "/tmp/nowhere")
    assert order == ["huggingface", "modelscope"]


def test_resolve_local_probe(tmp_path, monkeypatch):
    """resolve_local finds an existing checkpoint dir and never downloads."""
    from acestep_tpu.utils.downloads import resolve_local

    root = tmp_path / "ckpts"
    name = "acestep-5Hz-lm-1.7B"
    assert resolve_local(name, str(root)) is None
    d = root / name
    d.mkdir(parents=True)
    assert resolve_local(name, str(root)) is None   # empty dir: no weights
    (d / "model.safetensors").write_bytes(b"x")
    (d / "config.json").write_text("{}")
    found = resolve_local(name, str(root))
    assert found and os.path.samefile(found, d)


def test_lazy_init_covers_direct_lm_routes(tmp_path):
    """/format_input and /create_random_sample (no examples) must trigger
    the deferred load too, not dead-end on llm_handler=None."""
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    handler = FakeDiTHandler(out_dir)

    class FakeLLM:
        llm_initialized = True

        def format_sample(self, caption, lyrics, temperature=0.3):
            return {"success": True, "caption": caption or "c",
                    "lyrics": lyrics or "l"}

    state = AppState({"tiny": handler}, None, output_dir=out_dir,
                     examples_dir=None)
    state._lazy_init = lambda: setattr(state, "llm_handler", FakeLLM())
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        status, data = _post(port, "/format_input", {"caption": "hi"})
        assert status == 200, data
        assert state.llm_handler is not None     # lazy load ran
    finally:
        state.shutdown()
        server.shutdown()
        server.server_close()


def test_src_audio_path_jailed_when_safe_root_pinned(tmp_path, monkeypatch):
    """With ACESTEP_SAFE_ROOT pinned, a user-supplied src_audio_path
    outside the root fails the job; in-root paths pass (the reference
    passes these through unvalidated, so the jail is opt-in)."""
    from acestep_tpu.utils import path_safety

    root = tmp_path / "root"
    root.mkdir()
    # the server gates on the env var, but safe_path consults the module
    # root — set BOTH or the test validates nothing (the conftest fixture
    # pins the module root to tmp_path, which covers out_dir)
    monkeypatch.setenv("ACESTEP_SAFE_ROOT", str(root))
    path_safety.set_safe_root(str(root))
    out_dir = str(root / "out")
    os.makedirs(out_dir, exist_ok=True)
    handler = FakeDiTHandler(out_dir)
    state = AppState({"tiny": handler}, None, output_dir=out_dir)
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        _, out = _post(port, "/release_task",
                       {"prompt": "x", "thinking": False,
                        "task_type": "cover",
                        "src_audio_path": "/etc/hostname"})
        entry = _wait_done(port, out["data"]["task_id"])
        assert entry["status"] == 2              # failed: escapes the root
        # ... but the server's own outputs stay usable even when the
        # safe root doesn't cover them (studio send-to-Remix round-trip)
        import wave
        own = os.path.join(out_dir, "own.wav")
        with wave.open(own, "wb") as f:
            f.setnchannels(2); f.setsampwidth(2); f.setframerate(48000)
            f.writeframes(b"\x01\x00" * 2 * 4800)
        elsewhere = tmp_path / "elsewhere"
        elsewhere.mkdir()
        monkeypatch.setenv("ACESTEP_SAFE_ROOT", str(elsewhere))
        path_safety.set_safe_root(str(elsewhere))   # out_dir now OUTSIDE
        _, out = _post(port, "/release_task",
                       {"prompt": "x", "thinking": False,
                        "task_type": "cover", "src_audio_path": own})
        entry = _wait_done(port, out["data"]["task_id"])
        assert entry["status"] == 1, entry
        # a symlink planted in the output dir must NOT re-open the escape
        link = os.path.join(out_dir, "link.wav")
        os.symlink("/etc/hostname", link)
        _, out = _post(port, "/release_task",
                       {"prompt": "x", "thinking": False,
                        "task_type": "cover", "src_audio_path": link})
        entry = _wait_done(port, out["data"]["task_id"])
        assert entry["status"] == 2, entry
    finally:
        state.shutdown()
        server.shutdown()
        server.server_close()
