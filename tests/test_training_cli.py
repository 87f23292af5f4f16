"""Training CLI (Side-Step equivalent) end-to-end on tiny geometry."""

import io
import json
import os
import wave
from contextlib import redirect_stdout

import numpy as np
import pytest

# slow tier: Training CLI flows run real tiny training loops
pytestmark = pytest.mark.slow

from acestep_tpu.training.cli import build_parser, main


def _write_wav(path, seconds=0.05, sr=48000):
    n = int(seconds * sr)
    data = (np.sin(np.linspace(0, 440, n)) * 0.2 * 32767).astype(np.int16)
    stereo = np.stack([data, data], axis=1)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(stereo.tobytes())


def test_parser_subcommands():
    parser = build_parser()
    args = parser.parse_args(["vanilla", "--tensor-dir", "x", "--tiny"])
    assert args.command == "vanilla" and args.tiny
    args = parser.parse_args(["fixed", "--tensor-dir", "x",
                              "--preset", "quality"])
    assert args.preset == "quality"
    args = parser.parse_args(["full", "--tensor-dir", "x",
                              "--mesh-dp", "2", "--mesh-tp", "2"])
    assert args.mesh_dp == 2 and args.mesh_tp == 2
    with pytest.raises(SystemExit):
        parser.parse_args([])          # subcommand required


def test_presets_listing(capsys):
    assert main(["presets"]) == 0
    out = capsys.readouterr().out
    for name in ("quick", "standard", "fixed", "quality", "lokr"):
        assert name in out


@pytest.fixture(scope="module")
def built_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ds")
    audio_dir = root / "audio"
    audio_dir.mkdir()
    for i in range(2):
        _write_wav(audio_dir / f"s{i}.wav")
        with open(audio_dir / f"s{i}.json", "w") as f:
            json.dump({"caption": f"tiny song {i}", "lyrics": "[inst]"}, f)
    out_dir = root / "ds"
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["dataset", "--audio-dir", str(audio_dir),
                   "--out-dir", str(out_dir), "--tiny"])
    assert rc == 0
    result = json.loads(buf.getvalue())
    assert result["num_samples"] == 2
    return result["tensor_dir"]


def test_cli_dataset_builds_tensors(built_dataset):
    files = [f for f in os.listdir(built_dataset) if f.endswith(".npz")]
    assert len(files) == 2
    with np.load(os.path.join(built_dataset, files[0])) as data:
        assert "hidden_states" in data.files


def test_cli_vanilla_trains_adapter(built_dataset, tmp_path, capsys):
    out = tmp_path / "lora_out"
    rc = main(["vanilla", "--tensor-dir", built_dataset, "--tiny",
               "--output-dir", str(out), "--max-steps", "2",
               "--checkpoint-every", "0", "--rank", "2",
               "--batch-size", "1"])
    assert rc == 0
    assert (out / "adapter.npz").exists()
    assert "discrete_shift3" in capsys.readouterr().out


def test_cli_fixed_uses_continuous(built_dataset, tmp_path, capsys):
    out = tmp_path / "fixed_out"
    rc = main(["fixed", "--tensor-dir", built_dataset, "--tiny",
               "--output-dir", str(out), "--max-steps", "1",
               "--checkpoint-every", "0", "--rank", "2"])
    assert rc == 0
    assert "continuous" in capsys.readouterr().out
    assert (out / "adapter.npz").exists()


def test_cli_estimate(built_dataset, capsys):
    rc = main(["estimate", "--tensor-dir", built_dataset, "--tiny",
               "--num-batches", "1", "--top-k", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sensitivity" in out and "suggested LoRA targets" in out
