"""Dataset builder: raw audio directory -> training manifest + tensors.

Capability parity with the reference's builder pipeline
(/root/reference/acestep/training/dataset_builder.py +
dataset_builder_modules/: scan, label, caption, manifest, tensor stages).
Stages here:

1. scan_audio_dir: find audio files, read durations, pair sidecar metadata
   (`<name>.json` / `<name>.txt` lyrics) when present.
2. auto_label: optional LM captioning — encode audio to 5 Hz codes via the
   DiT tokenizer and ask the planner LM to 'understand' them (the reference
   shells out to whisper/gemini scripts; here the in-stack LM fills the
   same role, air-gap friendly).
3. write_manifest: dataset.json consumable by training.preprocess.
4. build: manifest -> tensor dir (delegates to preprocess_audio_files).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

from acestep_tpu.constants import SAMPLE_RATE
from acestep_tpu.utils.audio import load_audio

AUDIO_EXTENSIONS = (".wav", ".flac", ".mp3", ".ogg", ".m4a", ".aac", ".opus")


def scan_audio_dir(audio_dir: str) -> List[Dict[str, Any]]:
    """Find audio files + sidecar metadata. Returns manifest entries."""
    entries: List[Dict[str, Any]] = []
    for root, _dirs, files in os.walk(audio_dir):
        for name in sorted(files):
            if not name.lower().endswith(AUDIO_EXTENSIONS):
                continue
            path = os.path.join(root, name)
            stem = os.path.splitext(path)[0]
            entry: Dict[str, Any] = {"audio_path": path}
            meta_path = stem + ".json"
            if os.path.exists(meta_path):
                try:
                    with open(meta_path, "r", encoding="utf-8") as f:
                        sidecar = json.load(f)
                    entry.update({k: v for k, v in sidecar.items()
                                  if k in ("caption", "lyrics", "metas",
                                           "vocal_language")})
                except (OSError, ValueError):
                    pass
            lyrics_path = stem + ".txt"
            if "lyrics" not in entry and os.path.exists(lyrics_path):
                try:
                    with open(lyrics_path, "r", encoding="utf-8") as f:
                        entry["lyrics"] = f.read().strip()
                except OSError:
                    pass
            entries.append(entry)
    return entries


def auto_label(entries: List[Dict[str, Any]], dit_handler,
               llm_handler=None, *, max_seconds: float = 30.0
               ) -> List[Dict[str, Any]]:
    """Fill missing captions via tokenize->understand; defaults otherwise."""
    for entry in entries:
        if entry.get("caption"):
            continue
        caption = ""
        if llm_handler is not None:
            try:
                audio = load_audio(entry["audio_path"])
                audio = audio[: int(max_seconds * SAMPLE_RATE)]
                codes = dit_handler.audio_to_codes(np.asarray(audio))
                out = llm_handler.understand(codes)
                caption = out.get("caption", "")
                for key in ("bpm", "keyscale", "timesignature"):
                    if out.get(key):
                        entry.setdefault("metas", {})[key] = out[key]
            except Exception:
                caption = ""
        entry["caption"] = caption or os.path.splitext(
            os.path.basename(entry["audio_path"]))[0].replace("_", " ")
        entry.setdefault("lyrics", "[inst]")
    return entries


def write_manifest(entries: List[Dict[str, Any]], path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(entries, f, indent=2, ensure_ascii=False)
    return path


def build_dataset(audio_dir: str, out_dir: str, dit_handler,
                  llm_handler=None, **preprocess_kwargs) -> Dict[str, Any]:
    """Full pipeline: scan -> label -> manifest -> tensors."""
    from acestep_tpu.training.preprocess import preprocess_audio_files

    entries = scan_audio_dir(audio_dir)
    if not entries:
        raise FileNotFoundError(f"no audio files under {audio_dir}")
    entries = auto_label(entries, dit_handler, llm_handler)
    manifest = write_manifest(entries,
                              os.path.join(out_dir, "dataset.json"))
    tensor_dir = os.path.join(out_dir, "tensors")
    paths = preprocess_audio_files(dit_handler, manifest, tensor_dir,
                                   **preprocess_kwargs)
    return {"manifest": manifest, "tensor_dir": tensor_dir,
            "num_samples": len(paths)}
