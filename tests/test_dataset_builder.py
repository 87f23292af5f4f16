"""Dataset builder + presets + sensitivity estimation tests."""

import json
import os
import wave

import jax
import numpy as np
import pytest

from acestep_tpu.config import DiTConfig
from acestep_tpu.models.dit import init_dit_params
from acestep_tpu.training.dataset_builder import (
    auto_label,
    build_dataset,
    scan_audio_dir,
    write_manifest,
)
from acestep_tpu.training.presets import (
    PRESETS,
    estimate_gradient_sensitivity,
    get_preset,
)


def _write_wav(path, seconds=0.2, sr=48000):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(b"\x00\x00" * 2 * int(sr * seconds))


def test_scan_audio_dir_with_sidecars(tmp_path):
    _write_wav(tmp_path / "songA.wav")
    (tmp_path / "songA.json").write_text(json.dumps(
        {"caption": "lofi beat", "metas": {"bpm": 80}, "ignored_field": 1}))
    _write_wav(tmp_path / "songB.wav")
    (tmp_path / "songB.txt").write_text("[Verse]\nhello")
    entries = scan_audio_dir(str(tmp_path))
    assert len(entries) == 2
    by_name = {os.path.basename(e["audio_path"]): e for e in entries}
    assert by_name["songA.wav"]["caption"] == "lofi beat"
    assert by_name["songA.wav"]["metas"] == {"bpm": 80}
    assert "ignored_field" not in by_name["songA.wav"]
    assert by_name["songB.wav"]["lyrics"].startswith("[Verse]")


def test_auto_label_fallback_names(tmp_path):
    _write_wav(tmp_path / "my_cool_track.wav")
    entries = scan_audio_dir(str(tmp_path))
    labeled = auto_label(entries, dit_handler=None, llm_handler=None)
    assert labeled[0]["caption"] == "my cool track"
    assert labeled[0]["lyrics"] == "[inst]"


def test_build_dataset_end_to_end(tmp_path):
    from tests.test_training import _FakeHandler

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    _write_wav(audio_dir / "one.wav")
    _write_wav(audio_dir / "two.wav")
    out = build_dataset(str(audio_dir), str(tmp_path / "ds"), _FakeHandler())
    assert out["num_samples"] == 2
    assert os.path.exists(out["manifest"])
    files = os.listdir(out["tensor_dir"])
    assert len([f for f in files if f.endswith(".npz")]) == 2


def test_presets():
    cfg = get_preset("standard", output_dir="/tmp/x")
    assert cfg.rank == 16 and cfg.output_dir == "/tmp/x"
    assert get_preset("fixed").timestep_mode == "continuous"
    assert get_preset("lokr").kind == "lokr"
    with pytest.raises(KeyError):
        get_preset("nope")
    assert set(PRESETS) >= {"quick", "standard", "fixed", "quality", "lokr"}


@pytest.mark.slow
def test_gradient_sensitivity_ranking():
    from acestep_tpu.training.step import tiny_batch

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    batches = [tiny_batch(cfg, jax.random.PRNGKey(i), batch=2, frames=10)
               for i in range(2)]
    ranked = estimate_gradient_sensitivity(params, cfg, batches,
                                           num_batches=2)
    assert len(ranked) == 11          # all LORA_TARGETS
    names = [n for n, _ in ranked]
    assert "self_attn.q_proj" in names and "mlp.down" in names
    sens = [s for _, s in ranked]
    assert sens == sorted(sens, reverse=True)
    assert all(np.isfinite(s) and s >= 0 for s in sens)


def test_pipeline_staged_resume(tmp_path):
    """Interrupting after encode and re-running resumes without redoing
    per-file work (per-stage artifacts on disk)."""
    from tests.test_training import _FakeHandler
    from acestep_tpu.training.dataset_builder import DatasetBuildPipeline

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    for name in ("a.wav", "b.wav", "c.wav"):
        _write_wav(audio_dir / name)

    class CountingHandler(_FakeHandler):
        encodes = 0

        def encode_audio(self, audio):
            CountingHandler.encodes += 1
            return super().encode_audio(audio)

    pipe = DatasetBuildPipeline(str(audio_dir), str(tmp_path / "ds"),
                                CountingHandler(), val_fraction=0.34)
    pipe.stage_scan()
    pipe.stage_encode()
    assert CountingHandler.encodes == 3
    st = pipe.status()
    assert st["encoded"] == 3 and "encode" in st["stages_done"]

    # "restart": a new pipeline object resumes from disk
    pipe2 = DatasetBuildPipeline(str(audio_dir), str(tmp_path / "ds"),
                                 CountingHandler(), val_fraction=0.34)
    out = pipe2.build()
    # encode stage skipped all 3 cached latents; tensors reuse them too
    assert CountingHandler.encodes == 3
    assert out["num_samples"] == 2 and out["num_val"] == 1
    assert os.path.exists(out["manifest_train"])
    assert os.path.exists(out["manifest_val"])
    files = os.listdir(out["tensor_dir"])
    assert len([f for f in files if f.endswith(".npz")]) == 2
    # tensors resumable as well: third run writes nothing new
    out2 = pipe2.build()
    assert out2["num_samples"] == 2


def test_no_llm_build_does_not_block_later_labeling(tmp_path):
    """A build without an LM must leave NO label files, so a later build
    WITH an LM still labels every entry — and the late label must reach
    the already-built training tensors (stale-tensor invalidation)."""
    from tests.test_training import _FakeHandler
    from acestep_tpu.training.dataset_builder import DatasetBuildPipeline

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    _write_wav(audio_dir / "first_take.wav")

    class CodesHandler(_FakeHandler):
        def latents_to_codes(self, latents):
            return "<|audio_code_1|>" * 5

    out_dir = tmp_path / "ds"
    pipe = DatasetBuildPipeline(str(audio_dir), str(out_dir),
                                CodesHandler(), llm_handler=None)
    out1 = pipe.build()
    lab_dir = out_dir / "labels"
    assert not lab_dir.exists() or not any(lab_dir.iterdir())
    manifest1 = json.load(open(out1["manifest"]))
    assert manifest1[0]["caption"] == "first take"   # filename fallback
    npz = [f for f in os.listdir(out1["tensor_dir"]) if f.endswith(".npz")]
    assert len(npz) == 1
    cap1 = np.load(os.path.join(out1["tensor_dir"], npz[0]))["caption"]
    assert bytes(cap1).decode() == "first take"

    class FakeLLM:
        def understand(self, codes):
            return {"caption": "breezy bossa nova", "bpm": 120}

    pipe2 = DatasetBuildPipeline(str(audio_dir), str(out_dir),
                                 CodesHandler(), FakeLLM())
    out2 = pipe2.build()
    manifest2 = json.load(open(out2["manifest"]))
    assert manifest2[0]["caption"] == "breezy bossa nova"
    # the tensor file was rebuilt with the new conditioning, not skipped
    cap2 = np.load(os.path.join(out2["tensor_dir"], npz[0]))["caption"]
    assert bytes(cap2).decode() == "breezy bossa nova"


def test_transient_label_failure_retries_and_tensors_refresh(tmp_path):
    """An LM that throws on build 1 and succeeds on build 2: the retry
    must happen AND the refreshed caption must reach the tensors."""
    from tests.test_training import _FakeHandler
    from acestep_tpu.training.dataset_builder import DatasetBuildPipeline

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    _write_wav(audio_dir / "take_two.wav")

    class CodesHandler(_FakeHandler):
        def latents_to_codes(self, latents):
            return "<|audio_code_1|>" * 5

    class FlakyLLM:
        calls = 0

        def understand(self, codes):
            FlakyLLM.calls += 1
            if FlakyLLM.calls == 1:
                raise RuntimeError("transient")
            return {"caption": "recovered caption"}

    out_dir = str(tmp_path / "ds")
    out1 = DatasetBuildPipeline(str(audio_dir), out_dir, CodesHandler(),
                                FlakyLLM()).build()
    m1 = json.load(open(out1["manifest"]))
    assert m1[0]["caption"] == "take two"            # fallback on failure
    out2 = DatasetBuildPipeline(str(audio_dir), out_dir, CodesHandler(),
                                FlakyLLM()).build()
    assert FlakyLLM.calls == 2                       # retried, not skipped
    m2 = json.load(open(out2["manifest"]))
    assert m2[0]["caption"] == "recovered caption"
    npz = [f for f in os.listdir(out2["tensor_dir"]) if f.endswith(".npz")]
    cap = np.load(os.path.join(out2["tensor_dir"], npz[0]))["caption"]
    assert bytes(cap).decode() == "recovered caption"


def test_orphan_tmp_files_cleaned_and_not_counted(tmp_path):
    from tests.test_training import _FakeHandler
    from acestep_tpu.training.dataset_builder import DatasetBuildPipeline

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    _write_wav(audio_dir / "a.wav")
    pipe = DatasetBuildPipeline(str(audio_dir), str(tmp_path / "ds"),
                                _FakeHandler())
    pipe.stage_scan()
    lat_dir = tmp_path / "ds" / "latents"
    lat_dir.mkdir(parents=True)
    # orphans from a crashed encode: current and legacy temp suffixes
    (lat_dir / "dead.npy.tmp").write_bytes(b"x")
    (lat_dir / "dead.npy.tmp.npy").write_bytes(b"x")
    assert pipe.status()["encoded"] == 0             # tmp files not counted
    pipe.stage_encode()
    names = sorted(os.listdir(lat_dir))
    assert not any(".tmp" in n for n in names)       # orphans removed
    assert pipe.status()["encoded"] == 1


def test_pipeline_labels_via_llm(tmp_path):
    from tests.test_training import _FakeHandler
    from acestep_tpu.training.dataset_builder import DatasetBuildPipeline

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    _write_wav(audio_dir / "untitled_take.wav")

    class CodesHandler(_FakeHandler):
        def latents_to_codes(self, latents):
            return "<|audio_code_1|>" * 5

    class FakeLLM:
        def understand(self, codes):
            assert codes.startswith("<|audio_code_")
            return {"caption": "a dusty lofi loop", "bpm": 80}

    pipe = DatasetBuildPipeline(str(audio_dir), str(tmp_path / "ds"),
                                CodesHandler(), FakeLLM())
    out = pipe.build()
    manifest = json.load(open(out["manifest"]))
    assert manifest[0]["caption"] == "a dusty lofi loop"
    assert manifest[0]["metas"]["bpm"] == 80
