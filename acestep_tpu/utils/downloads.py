"""Checkpoint resolution + download.

Capability parity with /root/reference/acestep/model_downloader.py
(per-model ensure functions, HF/ModelScope source autodetect, local cache):
- resolve locally first (explicit dir, ACESTEP_CHECKPOINT_DIR, ./checkpoints),
- else download via huggingface_hub when the environment has egress,
- else raise a clear, actionable error (air-gapped TPU pods are the norm).

The reference's Google-reachability probe picks HF vs ModelScope; here a
cheap HF HEAD request decides download vs offline error.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

REPO_IDS: Dict[str, str] = {
    # model name -> hub repo id
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
    return any(entry.endswith((".safetensors", ".bin", ".npz", ".pt"))
               for entry in os.listdir(path))


def has_egress(timeout: float = 3.0) -> bool:
    """Cheap reachability probe (the reference probes Google to pick its
    source, model_downloader.py:210-309)."""
    import socket

    try:
        socket.create_connection(("huggingface.co", 443),
                                 timeout=timeout).close()
        return True
    except OSError:
        return False


def ensure_model(name: str, root: Optional[str] = None,
                 allow_download: bool = True) -> str:
    """Return a local directory containing the named checkpoint."""
    for path in candidate_dirs(name, root):
        if _looks_like_checkpoint(path):
            return path

    repo_id = REPO_IDS.get(name)
    if repo_id and allow_download and has_egress():
        from huggingface_hub import snapshot_download

        target = os.path.join(root or DEFAULT_ROOT, name)
        partial = target + ".partial"       # atomic: download then rename
        os.makedirs(partial, exist_ok=True)
        snapshot_download(repo_id=repo_id, local_dir=partial)
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
