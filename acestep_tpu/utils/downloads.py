"""Checkpoint resolution + download.

Capability parity with /root/reference/acestep/model_downloader.py:
- resolve locally first (explicit dir, ACESTEP_CHECKPOINT_DIR, ./checkpoints),
- smart download with HuggingFace <-> ModelScope auto-fallback
  (_smart_download, model_downloader.py:210-279): a reachability probe picks
  the primary source; the alternative is tried when the primary fails;
  `prefer_source` overrides autodetection,
- checkpoint integrity: a SHA-256 manifest is written after every download
  and re-verified on resolution (the TPU-native analog of the reference's
  code-file hash sync, model_downloader.py:47-110 — there it re-syncs
  authoritative .py files into HF checkpoints; here there is no remote code,
  so the hashes guard the weight files themselves),
- else raise a clear, actionable error (air-gapped TPU pods are the norm).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional, Tuple

REPO_IDS: Dict[str, str] = {
    # model name -> hub repo id (same id on HF and ModelScope, as in the
    # reference SUBMODEL_REGISTRY)
    "acestep-v15-turbo": "ACE-Step/ACE-Step-v1.5-turbo",
    "acestep-v15-base": "ACE-Step/ACE-Step-v1.5-base",
    "acestep-v15-sft": "ACE-Step/ACE-Step-v1.5-sft",
    "vae": "ACE-Step/ACE-Step-v1.5-vae",
    "Qwen3-Embedding-0.6B": "Qwen/Qwen3-Embedding-0.6B",
    "acestep-5Hz-lm-0.6B": "ACE-Step/acestep-5Hz-lm-0.6B",
    "acestep-5Hz-lm-1.7B": "ACE-Step/acestep-5Hz-lm-1.7B",
    "acestep-5Hz-lm-4B": "ACE-Step/acestep-5Hz-lm-4B",
}

DEFAULT_ROOT = os.environ.get(
    "ACESTEP_CHECKPOINT_DIR",
    os.path.join(os.getcwd(), "checkpoints"))

MANIFEST_NAME = "checksums.json"

# directories whose manifest already verified in this process
_VERIFIED_DIRS: set = set()
_WEIGHT_SUFFIXES = (".safetensors", ".bin", ".npz", ".pt")


def candidate_dirs(name: str, root: Optional[str] = None) -> List[str]:
    roots = [root] if root else []
    roots += [DEFAULT_ROOT,
              os.path.join(os.path.expanduser("~"), ".cache", "acestep_tpu",
                           "checkpoints")]
    return [os.path.join(r, name) for r in roots if r]


def _looks_like_checkpoint(path: str) -> bool:
    """A usable checkpoint has weight files, not just config JSONs — an
    interrupted download must not satisfy resolution forever."""
    if not os.path.isdir(path):
        return False
    return any(entry.endswith(_WEIGHT_SUFFIXES)
               for entry in os.listdir(path))


# ------------------------------------------------------------------
# Integrity manifest (reference model_downloader.py:47-110 analog)
# ------------------------------------------------------------------


def _file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def write_manifest(ckpt_dir: str) -> Dict[str, str]:
    """Hash every weight file into `checksums.json` (called post-download)."""
    hashes = {
        entry: _file_sha256(os.path.join(ckpt_dir, entry))
        for entry in sorted(os.listdir(ckpt_dir))
        if entry.endswith(_WEIGHT_SUFFIXES)
    }
    with open(os.path.join(ckpt_dir, MANIFEST_NAME), "w",
              encoding="utf-8") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)
    return hashes


def verify_checkpoint(ckpt_dir: str) -> List[str]:
    """Weight files that are missing or differ from the manifest.

    No manifest -> nothing to verify (pre-manifest local checkpoints stay
    valid); returns [] in that case."""
    manifest_path = os.path.join(ckpt_dir, MANIFEST_NAME)
    if not os.path.exists(manifest_path):
        return []
    try:
        with open(manifest_path, "r", encoding="utf-8") as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        return [MANIFEST_NAME]
    bad = []
    for name, digest in manifest.items():
        path = os.path.join(ckpt_dir, name)
        if not os.path.exists(path) or _file_sha256(path) != digest:
            bad.append(name)
    return bad


# ------------------------------------------------------------------
# Source probing + smart download
# ------------------------------------------------------------------


def _probe(host: str, timeout: float = 3.0) -> bool:
    import socket

    try:
        socket.create_connection((host, 443), timeout=timeout).close()
        return True
    except OSError:
        return False


def has_egress(timeout: float = 3.0) -> bool:
    """Any supported hub reachable?"""
    return _probe("huggingface.co", timeout) or _probe("modelscope.cn",
                                                       timeout)


def _download_hf(repo_id: str, target: str) -> None:
    from huggingface_hub import snapshot_download

    snapshot_download(repo_id=repo_id, local_dir=target)


def _download_modelscope(repo_id: str, target: str) -> None:
    try:
        from modelscope import snapshot_download  # noqa: F401 — optional dep
    except ImportError as e:
        raise RuntimeError(
            "modelscope is not installed; pip install modelscope or use "
            "prefer_source='huggingface'") from e
    snapshot_download(model_id=repo_id, local_dir=target)


def smart_download(repo_id: str, target: str,
                   prefer_source: Optional[str] = None) -> Tuple[str, str]:
    """Download with HF <-> ModelScope auto-fallback.

    Returns (source_used, message); raises when both sources fail.
    Mirrors the reference's _smart_download (model_downloader.py:210-279):
    explicit preference wins, otherwise a reachability probe picks the
    primary, and the alternative is tried on failure. With no explicit
    preference the ACESTEP_DOWNLOAD_SOURCE env var decides (reference
    api_server.py:194; 'auto'/'' keeps the probe)."""
    if prefer_source is None:
        env = os.environ.get("ACESTEP_DOWNLOAD_SOURCE", "").strip().lower()
        if env in ("huggingface", "modelscope"):
            prefer_source = env
    if prefer_source == "huggingface":
        hf_first = True
    elif prefer_source == "modelscope":
        hf_first = False
    else:
        hf_first = _probe("huggingface.co")
    order = (("huggingface", _download_hf),
             ("modelscope", _download_modelscope))
    if not hf_first:
        order = order[::-1]
    errors = []
    for source, fn in order:
        try:
            fn(repo_id, target)
            return source, f"downloaded {repo_id} from {source}"
        except Exception as e:  # noqa: BLE001 — fall back to the other hub
            errors.append(f"{source}: {e}")
    raise RuntimeError(
        f"all download sources failed for {repo_id}:\n  "
        + "\n  ".join(errors))


def resolve_local(name: str, root: Optional[str] = None) -> Optional[str]:
    """Return the local directory holding `name` if one already exists,
    without downloading or hashing — the cheap existence probe behind
    ACESTEP_INIT_LLM=auto (reference api_server.py:2316-2349: auto-detect
    decides whether the LM loads at startup)."""
    for path in candidate_dirs(name, root):
        if _looks_like_checkpoint(path):
            return path
    return None


def ensure_model(name: str, root: Optional[str] = None,
                 allow_download: bool = True,
                 prefer_source: Optional[str] = None,
                 verify: bool = True) -> str:
    """Return a local directory containing the named checkpoint."""
    for path in candidate_dirs(name, root):
        if _looks_like_checkpoint(path):
            # hash multi-GB weight dirs at most once per process — repeat
            # resolutions (e.g. per-request LM swaps) must not re-pay it
            if verify and path not in _VERIFIED_DIRS:
                bad = verify_checkpoint(path)
                if bad:
                    raise RuntimeError(
                        f"checkpoint '{name}' at {path} failed integrity "
                        f"verification: {bad}. Delete the directory to "
                        f"re-download, or remove {MANIFEST_NAME} to skip "
                        f"verification.")
                _VERIFIED_DIRS.add(path)
            return path

    repo_id = REPO_IDS.get(name)
    if repo_id and allow_download and has_egress():
        target = os.path.join(root or DEFAULT_ROOT, name)
        partial = target + ".partial"       # atomic: download then rename
        os.makedirs(partial, exist_ok=True)
        smart_download(repo_id, partial, prefer_source=prefer_source)
        write_manifest(partial)
        if os.path.isdir(target):
            # a leftover non-checkpoint dir (interrupted earlier download,
            # config-only remnant) makes os.replace fail with ENOTEMPTY on
            # Linux — it was already rejected by the checkpoint probe
            # above, so it carries nothing worth keeping
            import shutil

            shutil.rmtree(target, ignore_errors=True)
        os.replace(partial, target)
        return target

    searched = "\n  ".join(candidate_dirs(name, root))
    raise FileNotFoundError(
        f"checkpoint '{name}' not found locally and cannot be downloaded "
        f"(no egress or unknown model). Searched:\n  {searched}\n"
        f"Place the HF checkpoint directory there, or set "
        f"ACESTEP_CHECKPOINT_DIR.")


def ensure_main_model(root: Optional[str] = None,
                      variant: str = "turbo") -> str:
    return ensure_model(f"acestep-v15-{variant}", root)


def ensure_vae(root: Optional[str] = None) -> str:
    return ensure_model("vae", root)


def ensure_text_encoder(root: Optional[str] = None) -> str:
    return ensure_model("Qwen3-Embedding-0.6B", root)


def ensure_lm_model(size: str = "0.6B", root: Optional[str] = None) -> str:
    return ensure_model(f"acestep-5Hz-lm-{size}", root)
