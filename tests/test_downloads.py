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


def test_manifest_roundtrip_and_verification(tmp_path):
    ckpt = tmp_path / "m"
    ckpt.mkdir()
    (ckpt / "model.safetensors").write_bytes(b"weights-v1")
    (ckpt / "config.json").write_text("{}")   # non-weight: not hashed
    hashes = downloads.write_manifest(str(ckpt))
    assert list(hashes) == ["model.safetensors"]
    assert downloads.verify_checkpoint(str(ckpt)) == []
    # corruption detected
    (ckpt / "model.safetensors").write_bytes(b"weights-CORRUPT")
    assert downloads.verify_checkpoint(str(ckpt)) == ["model.safetensors"]


def test_ensure_model_rejects_corrupt_checkpoint(tmp_path):
    root = tmp_path
    ckpt = root / "vae"
    ckpt.mkdir()
    (ckpt / "model.safetensors").write_bytes(b"good")
    downloads.write_manifest(str(ckpt))
    (ckpt / "model.safetensors").write_bytes(b"bad")
    with pytest.raises(RuntimeError, match="integrity"):
        downloads.ensure_model("vae", root=str(root), allow_download=False)
    # verify=False opts out
    assert downloads.ensure_model("vae", root=str(root),
                                  allow_download=False, verify=False)


def test_no_manifest_means_no_verification(tmp_path):
    ckpt = tmp_path / "vae"
    ckpt.mkdir()
    (ckpt / "model.safetensors").write_bytes(b"x")
    assert downloads.ensure_model("vae", root=str(tmp_path),
                                  allow_download=False) == str(ckpt)


def test_smart_download_falls_back_to_modelscope(tmp_path, monkeypatch):
    calls = []

    def hf_fail(repo, target):
        calls.append("hf")
        raise RuntimeError("403")

    def ms_ok(repo, target):
        calls.append("ms")
        (tmp_path / "got").write_text(repo)

    monkeypatch.setattr(downloads, "_download_hf", hf_fail)
    monkeypatch.setattr(downloads, "_download_modelscope", ms_ok)
    monkeypatch.setattr(downloads, "_probe", lambda *a, **k: True)
    source, msg = downloads.smart_download("ACE-Step/x", str(tmp_path))
    assert source == "modelscope" and calls == ["hf", "ms"]


def test_smart_download_prefer_source(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(downloads, "_download_hf",
                        lambda r, t: calls.append("hf"))
    monkeypatch.setattr(downloads, "_download_modelscope",
                        lambda r, t: calls.append("ms"))
    downloads.smart_download("x/y", str(tmp_path),
                             prefer_source="modelscope")
    assert calls == ["ms"]


def test_smart_download_both_fail(tmp_path, monkeypatch):
    monkeypatch.setattr(downloads, "_download_hf",
                        lambda r, t: (_ for _ in ()).throw(RuntimeError("a")))
    monkeypatch.setattr(downloads, "_download_modelscope",
                        lambda r, t: (_ for _ in ()).throw(RuntimeError("b")))
    monkeypatch.setattr(downloads, "_probe", lambda *a, **k: True)
    with pytest.raises(RuntimeError, match="all download sources failed"):
        downloads.smart_download("x/y", str(tmp_path))


def test_cli_verify_and_manifest(tmp_path, capsys):
    from acestep_tpu.utils import downloads_cli

    root = tmp_path / "ckpts"
    model_dir = root / "acestep-v15-turbo"
    model_dir.mkdir(parents=True)
    (model_dir / "config.json").write_text("{}")
    (model_dir / "model.safetensors").write_bytes(b"weights")

    rc = downloads_cli.main(["acestep-v15-turbo", "--root", str(root),
                             "--no-download", "--write-manifest",
                             "--verify"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "manifest written" in out and "verified ok" in out

    # corrupt a weight file -> verification fails with exit 1 (either the
    # resolver's manifest check or the CLI's explicit --verify reports it;
    # ensure_model memoizes per-process, so the CLI check is the backstop)
    (model_dir / "model.safetensors").write_bytes(b"tampered")
    rc = downloads_cli.main(["acestep-v15-turbo", "--root", str(root),
                             "--no-download", "--verify"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "failed integrity verification" in err or "HASH MISMATCH" in err
