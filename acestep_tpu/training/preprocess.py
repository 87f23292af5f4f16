"""Dataset preprocessing: raw audio + text -> training tensor files.

Reference: two-pass preprocessing (training_v2/preprocess.py — pass 1 VAE
encode + text-encoder embeddings, pass 2 condition tensors) and the v1
dataset builder (training/dataset_builder.py). Here one pass suffices:
the jitted training step runs the condition encoder itself (it is cheap on
TPU and keeps adapters trainable through it), so preprocessing stores only
VAE latents + text/lyric embeddings per sample as .npz.

Sample manifest format (dataset.json):
    [{"audio_path": ..., "caption": ..., "lyrics": ...,
      "metas": {"bpm": ..., "keyscale": ..., ...} (optional),
      "vocal_language": "en" (optional)}, ...]
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from acestep_tpu.pipeline import text as textlib
from acestep_tpu.utils.audio import load_audio

MAX_FRAMES_DEFAULT = 3000   # 120 s cap per training sample (v1 default window)


def load_manifest(path: str) -> List[Dict[str, Any]]:
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    if not isinstance(data, list):
        raise ValueError("dataset manifest must be a JSON list of samples")
    return data


def preprocess_samples(handler, samples: List[Dict[str, Any]], out_dir: str,
                       *, max_frames: int = MAX_FRAMES_DEFAULT,
                       progress: bool = False,
                       skip_existing: bool = False) -> Iterator[str]:
    """VAE-encode + text-embed every sample; yields written file paths.

    `handler` is an initialized AceStepHandler (provides encode_audio and
    text_embedder). A sample carrying precomputed `latents` (or a
    `latents_path` .npy) skips the VAE encode — the staged dataset builder
    reuses its encode-stage cache. `filename` overrides the default
    index-based name (stable ids enable per-file resume via
    skip_existing)."""
    os.makedirs(out_dir, exist_ok=True)
    for i, sample in enumerate(samples):
        name = sample.get("filename", f"sample_{i:05d}.npz")
        path = os.path.join(out_dir, name)
        if skip_existing and os.path.exists(path):
            yield path
            continue
        latents = sample.get("latents")
        if latents is None and sample.get("latents_path"):
            latents = np.load(sample["latents_path"])
        if latents is None:
            audio = sample.get("audio")
            if audio is None:
                audio = load_audio(sample["audio_path"])
            latents = handler.encode_audio(np.asarray(audio))
        latents = np.asarray(latents)[:max_frames]

        caption = sample.get("caption", "")
        lyrics = sample.get("lyrics", "")
        language = sample.get("vocal_language", "en")
        metas = sample.get("metas") or {}
        meta_str = textlib.parse_metas([metas])[0]
        instruction = textlib.resolve_instruction("text2music")
        text_prompt = textlib.build_text_prompt(instruction, caption, meta_str)
        lyric_prompt = textlib.format_lyrics(lyrics, language)

        text_h, text_m = handler.text_embedder.encode_text([text_prompt])
        lyric_h, lyric_m = handler.text_embedder.encode_lyrics([lyric_prompt])

        np.savez(
            path,
            hidden_states=np.asarray(latents, np.float32),
            text_hidden_states=np.asarray(text_h[0], np.float32),
            text_attention_mask=np.asarray(text_m[0], np.int32),
            lyric_hidden_states=np.asarray(lyric_h[0], np.float32),
            lyric_attention_mask=np.asarray(lyric_m[0], np.int32),
            caption=np.frombuffer(caption.encode("utf-8"), np.uint8),
        )
        yield path


def preprocess_audio_files(handler, manifest_path: str, out_dir: str,
                           **kwargs) -> List[str]:
    """Manifest file -> tensor dir. Returns written paths."""
    samples = load_manifest(manifest_path)
    return list(preprocess_samples(handler, samples, out_dir, **kwargs))
