"""Model/adapter discovery (reference training_v2/model_discovery.py)."""

import json
import os

from acestep_tpu.training.discovery import (detect_base_model, fuzzy_search,
                                            get_base_defaults, pick_model,
                                            scan_adapters, scan_models)


def _mk_model(root, name, config=None, weights=True):
    d = root / name
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps(config or {}))
    if weights:
        (d / "model.safetensors").write_bytes(b"x")
    return d


def test_scan_classifies_official_and_custom(tmp_path):
    _mk_model(tmp_path, "acestep-v15-turbo", {"is_turbo": True})
    _mk_model(tmp_path, "my-finetune", {"model_version": "sft"})
    _mk_model(tmp_path, "mystery", {})
    (tmp_path / "not_a_model").mkdir()          # no config.json: skipped
    models = scan_models(str(tmp_path))
    by_name = {m.name: m for m in models}
    assert set(by_name) == {"acestep-v15-turbo", "my-finetune", "mystery"}
    assert by_name["acestep-v15-turbo"].is_official
    assert by_name["acestep-v15-turbo"].base_model == "turbo"
    assert not by_name["my-finetune"].is_official
    assert by_name["my-finetune"].base_model == "sft"
    assert by_name["mystery"].base_model == "unknown"
    assert models[0].is_official               # official-first ordering


def test_detect_base_model_priority():
    # explicit model_version beats everything
    assert detect_base_model({"model_version": "base"}, "x-turbo") == "base"
    assert detect_base_model({"is_turbo": True}, "whatever") == "turbo"
    assert detect_base_model({}, "acestep-v15-sft") == "sft"
    assert detect_base_model({}, "nothing") == "unknown"


def test_base_defaults_match_variant_families():
    assert get_base_defaults("turbo") == {
        "is_turbo": True, "shift": 3.0, "num_inference_steps": 8}
    assert get_base_defaults("sft")["num_inference_steps"] == 50
    assert get_base_defaults("unknown")["shift"] == 1.0


def test_fuzzy_search_substring_then_close(tmp_path):
    _mk_model(tmp_path, "acestep-v15-turbo")
    _mk_model(tmp_path, "jazz-finetune-v2")
    models = scan_models(str(tmp_path))
    assert [m.name for m in fuzzy_search("jazz", models)] == \
        ["jazz-finetune-v2"]
    # typo still resolves via difflib
    assert [m.name for m in fuzzy_search("jaz-finetune-v3", models)] == \
        ["jazz-finetune-v2"]
    assert len(fuzzy_search("", models)) == 2


def test_pick_model(tmp_path):
    _mk_model(tmp_path, "acestep-v15-turbo")
    _mk_model(tmp_path, "custom-one")
    assert pick_model(str(tmp_path), "custom-one").name == "custom-one"
    assert pick_model(str(tmp_path), "custm").name == "custom-one"
    assert pick_model(str(tmp_path)).name == "acestep-v15-turbo"
    assert pick_model(str(tmp_path), "nonexistent-zzz-qqq") is None
    assert pick_model(str(tmp_path / "void")) is None


def test_adapters_scanned_separately(tmp_path):
    _mk_model(tmp_path, "acestep-v15-base")
    peft = tmp_path / "my-lora"
    peft.mkdir()
    (peft / "adapter_config.json").write_text(json.dumps(
        {"peft_type": "LORA"}))
    (peft / "adapter_model.safetensors").write_bytes(b"x")
    (tmp_path / "bare.safetensors").write_bytes(b"x")
    models = scan_models(str(tmp_path))
    assert [m.name for m in models] == ["acestep-v15-base"]
    adapters = scan_adapters(str(tmp_path))
    kinds = {a["name"]: a["kind"] for a in adapters}
    assert kinds == {"my-lora": "lora", "bare.safetensors": "safetensors"}


def test_discover_route(tmp_path, monkeypatch):
    import threading

    from acestep_tpu.serving import AppState, create_server
    from tests.test_serving import FakeDiTHandler, _get

    monkeypatch.setenv("ACESTEP_SAFE_ROOT", str(tmp_path))
    _mk_model(tmp_path / "ckpts", "acestep-v15-turbo", {"is_turbo": True})
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    state = AppState({"tiny": FakeDiTHandler(out_dir)}, None,
                     output_dir=out_dir)
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        status, out = _get(
            port, f"/v1/models/discover?root={tmp_path / 'ckpts'}")
        assert status == 200
        assert out["data"]["models"][0]["name"] == "acestep-v15-turbo"
        assert out["data"]["models"][0]["base_model"] == "turbo"
        status, out = _get(port, "/v1/models/discover?root=/etc")
        assert status == 400
    finally:
        state.shutdown()
        server.shutdown()
        server.server_close()


def test_cli_pick_resolves_checkpoint(tmp_path, capsys):
    """--pick NAME resolves the checkpoint dir through discovery."""
    import argparse

    from acestep_tpu.training import cli as tcli

    _mk_model(tmp_path, "acestep-v15-turbo", {"is_turbo": True})
    args = argparse.Namespace(pick="turbo", checkpoint_root=str(tmp_path),
                              checkpoint_dir=None)
    tcli._resolve_pick(args)
    assert args.checkpoint_dir == str(tmp_path / "acestep-v15-turbo")
    assert "picked acestep-v15-turbo" in capsys.readouterr().out
