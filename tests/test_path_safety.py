"""Path-safety parity: the reference guards every user-supplied training
path with `path_safety.safe_path` and resolves manifest entries with
traversal protection (`training/path_safety.py`,
`training/data_module_test.py`). Same contract here, with the HTTP body
as the trust boundary."""
import json
import os

import numpy as np
import pytest

from acestep_tpu.utils.path_safety import (get_safe_root, safe_path,
                                           set_safe_root)
from tests.test_serving import _post, server_env  # noqa: F401


@pytest.fixture()
def safe_root(tmp_path):
    old = get_safe_root()
    set_safe_root(str(tmp_path))
    yield tmp_path
    set_safe_root(old)


def test_safe_path_semantics(safe_root):
    # normal child
    assert safe_path("a/b.npz") == str(safe_root / "a" / "b.npz")
    # absolute inside allowed
    inside = str(safe_root / "x.npz")
    assert safe_path(inside) == inside
    # traversal raises
    with pytest.raises(ValueError):
        safe_path("../evil.npz")
    # absolute outside raises
    with pytest.raises(ValueError):
        safe_path("/etc/passwd")
    # explicit base wins over the global root
    sub = safe_root / "sub"
    sub.mkdir()
    assert safe_path("f.npz", base=str(sub)) == str(sub / "f.npz")
    with pytest.raises(ValueError):
        safe_path("../f.npz", base=str(sub / "deeper"))
    # empty rejected
    with pytest.raises(ValueError):
        safe_path("")


def _write_sample(path):
    np.savez(path,
             hidden_states=np.zeros((4, 8), np.float32),
             text_hidden_states=np.zeros((3, 8), np.float32),
             text_attention_mask=np.ones((3,), np.int32),
             lyric_hidden_states=np.zeros((2, 8), np.float32),
             lyric_attention_mask=np.ones((2,), np.int32))


def test_manifest_resolution_and_traversal_skip(safe_root, recwarn):
    """Manifest entries resolve relative to the tensor dir; traversal and
    missing entries are skipped with a warning (data_module_test:
    test_manifest_traversal_paths_skipped,
    test_manifest_relative_to_tensor_dir)."""
    from acestep_tpu.training.data import PreprocessedDataset

    td = safe_root / "tensors"
    td.mkdir()
    _write_sample(td / "a.npz")
    # legacy cwd-relative entry: a file under the GLOBAL safe root
    legacy = safe_root / "legacy.npz"
    _write_sample(legacy)
    manifest = {"samples": ["a.npz", "legacy.npz",
                            "../../../../etc/passwd", "missing.npz"]}
    (td / "manifest.json").write_text(json.dumps(manifest))
    ds = PreprocessedDataset(str(td))
    assert ds.files == sorted([str(td / "a.npz"), str(legacy)])
    assert any("unresolvable" in str(w.message) for w in recwarn.list)


def test_fallback_scan_only_npz(safe_root):
    from acestep_tpu.training.data import PreprocessedDataset

    td = safe_root / "scan"
    td.mkdir()
    _write_sample(td / "b.npz")
    (td / "note.txt").write_text("x")
    ds = PreprocessedDataset(str(td))
    assert [os.path.basename(f) for f in ds.files] == ["b.npz"]


def test_nonexistent_dir_raises(safe_root):
    from acestep_tpu.training.data import PreprocessedDataset

    with pytest.raises(FileNotFoundError, match="not an existing"):
        PreprocessedDataset(str(safe_root / "nope"))


def test_http_routes_reject_escaping_paths(server_env):
    """Training/LoRA/dataset routes 400 on paths outside the safe root
    instead of touching the filesystem."""
    _state, _handler, port = server_env
    for route, body in (
            ("/v1/training/load_tensor_info", {"tensor_dir": "/etc"}),
            ("/v1/lora/load", {"lora_path": "/etc/passwd"}),
            ("/v1/dataset/build", {"audio_dir": "/etc"}),
            ("/v1/training/start",
             {"dataset_dir": "../outside", "config": {}}),
    ):
        status, out = _post(port, route, body)
        assert status == 400, f"{route} -> {status}: {out}"
        assert "escape" in (out.get("error") or "").lower()


def test_safe_path_rejects_symlink_escape(tmp_path):
    """A symlink planted under the root must not widen the jail."""
    from acestep_tpu.utils.path_safety import safe_path

    root = tmp_path / "root"
    outside = tmp_path / "outside"
    root.mkdir()
    outside.mkdir()
    (outside / "secret.txt").write_text("x")
    (root / "link").symlink_to(outside)
    with pytest.raises(ValueError):
        safe_path("link/secret.txt", base=str(root))
    # a symlink that stays inside the root is fine
    (root / "sub").mkdir()
    (root / "inlink").symlink_to(root / "sub")
    assert safe_path("inlink", base=str(root))
