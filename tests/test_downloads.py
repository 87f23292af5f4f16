"""Checkpoint resolution tests (no network)."""

import os

import pytest

from acestep_tpu.utils import downloads


def test_local_resolution(tmp_path, monkeypatch):
    root = tmp_path / "ckpts"
    model_dir = root / "acestep-v15-turbo"
    model_dir.mkdir(parents=True)
    (model_dir / "config.json").write_text("{}")
    (model_dir / "model.safetensors").write_bytes(b"x")
    path = downloads.ensure_model("acestep-v15-turbo", root=str(root),
                                  allow_download=False)
    assert path == str(model_dir)
    assert downloads.ensure_main_model(str(root)) == str(model_dir)


def test_missing_model_raises_actionable_error(tmp_path, monkeypatch):
    monkeypatch.setattr(downloads, "has_egress", lambda *a, **k: False)
    with pytest.raises(FileNotFoundError) as err:
        downloads.ensure_model("acestep-v15-turbo", root=str(tmp_path))
    message = str(err.value)
    assert "ACESTEP_CHECKPOINT_DIR" in message
    assert str(tmp_path) in message


def test_empty_dir_not_mistaken_for_checkpoint(tmp_path, monkeypatch):
    (tmp_path / "vae").mkdir()
    monkeypatch.setattr(downloads, "has_egress", lambda *a, **k: False)
    with pytest.raises(FileNotFoundError):
        downloads.ensure_model("vae", root=str(tmp_path))


def test_partial_download_not_treated_as_checkpoint(tmp_path, monkeypatch):
    # config.json only (interrupted download) must NOT satisfy resolution
    partial = tmp_path / "vae"
    partial.mkdir()
    (partial / "config.json").write_text("{}")
    monkeypatch.setattr(downloads, "has_egress", lambda *a, **k: False)
    with pytest.raises(FileNotFoundError):
        downloads.ensure_model("vae", root=str(tmp_path))
