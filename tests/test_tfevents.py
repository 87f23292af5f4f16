"""tfevents writer round-trip: our stdlib-only encoder must produce files
TensorBoard's own loader parses (utils/tfevents.py; consumed by
/v1/training/tensorboard/start)."""

import json
import os

import pytest

from acestep_tpu.utils import tfevents


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert tfevents.crc32c(b"") == 0
    assert tfevents.crc32c(b"123456789") == 0xE3069283
    assert tfevents.crc32c(bytes(32)) == 0x8A9136AA


@pytest.mark.slow
def test_export_and_parse_with_tensorboard_loader(tmp_path):
    tb_loader = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")

    metrics = tmp_path / "metrics.jsonl"
    rows = [{"step": s, "loss": 1.0 / (s + 1), "ts": 1000.0 + s}
            for s in range(5)]
    metrics.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    path = tfevents.export_metrics_jsonl(str(metrics), str(tmp_path))
    assert path is not None and os.path.exists(path)
    assert tfevents.has_event_files(str(tmp_path))

    loader = tb_loader.EventFileLoader(path)
    events = list(loader.Load())
    # first record is the file_version stamp, then one event per row
    scalar_events = [e for e in events if e.summary.value]
    assert len(scalar_events) == 5
    for row, ev in zip(rows, scalar_events):
        assert ev.step == row["step"]
        assert ev.wall_time == pytest.approx(row["ts"])
        (value,) = ev.summary.value
        assert value.tag == "train/loss"
        # recent TB loaders migrate simple_value into a rank-0 tensor
        got = (value.simple_value
               if value.WhichOneof("value") == "simple_value"
               else value.tensor.float_val[0])
        assert got == pytest.approx(row["loss"], rel=1e-6)


def test_export_skips_unplottable_and_empty(tmp_path):
    metrics = tmp_path / "metrics.jsonl"
    metrics.write_text('{"step": 0}\nnot json\n')
    assert tfevents.export_metrics_jsonl(str(metrics), str(tmp_path)) is None
    assert tfevents.export_metrics_jsonl(
        str(tmp_path / "missing.jsonl"), str(tmp_path)) is None
    assert not tfevents.has_event_files(str(tmp_path))


def test_tensorboard_start_requires_logdir_or_run():
    from acestep_tpu.serving.training_service import TrainingService

    svc = TrainingService(dit_handler=None)
    with pytest.raises(RuntimeError, match="metrics"):
        svc.tensorboard_start()


@pytest.mark.slow
def test_tensorboard_start_exports_before_launch(tmp_path, monkeypatch):
    """With a finished run's metrics.jsonl on disk, start() must convert
    it to tfevents before launching the dashboard process."""
    import subprocess

    from acestep_tpu.serving.training_service import TrainingService

    metrics = tmp_path / "metrics.jsonl"
    metrics.write_text('{"step": 1, "loss": 0.5, "ts": 1.0}\n')

    launched = {}

    class FakeProc:
        def poll(self):
            return None

    def fake_popen(cmd, **kw):
        launched["cmd"] = cmd
        return FakeProc()

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    svc = TrainingService(dit_handler=None)
    out = svc.tensorboard_start(logdir=str(tmp_path), port=16006)
    assert out["status"] == "started"
    assert out["exported_events"] and os.path.exists(out["exported_events"])
    assert tfevents.has_event_files(str(tmp_path))
    assert "--logdir" in launched["cmd"]


@pytest.mark.slow
def test_tensorboard_reexports_when_metrics_newer(tmp_path, monkeypatch):
    """A second run into the same output_dir must refresh the export —
    stale event files would silently show the previous run's curve."""
    import subprocess
    import time as _time

    from acestep_tpu.serving.training_service import TrainingService

    metrics = tmp_path / "metrics.jsonl"
    metrics.write_text('{"step": 1, "loss": 0.5, "ts": 1.0}\n')

    class FakeProc:
        def poll(self):
            return None

        def terminate(self):
            pass

        def kill(self):
            pass

        def wait(self, timeout=None):
            return 0

    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: FakeProc())
    svc = TrainingService(dit_handler=None)
    out1 = svc.tensorboard_start(logdir=str(tmp_path), port=16009)
    first = out1["exported_events"]
    assert first
    svc.tensorboard_stop()

    # "second run": metrics gains rows and becomes newer than the export
    _time.sleep(0.05)
    metrics.write_text('{"step": 1, "loss": 0.5, "ts": 1.0}\n'
                       '{"step": 2, "loss": 0.25, "ts": 2.0}\n')
    os.utime(metrics)
    out2 = svc.tensorboard_start(logdir=str(tmp_path), port=16009)
    # stable filename: the export is REPLACED (TB would merge two event
    # files into one overlaid run), now carrying both rows
    assert out2["exported_events"] == first
    with open(first, "rb") as f:
        data = f.read()
    import struct

    events = 0
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        events += 1
        off += 8 + 4 + length + 4
    assert events == 3      # version stamp + 2 scalar rows


def test_training_service_start_validates_up_front():
    from acestep_tpu.serving.training_service import TrainingService

    svc = TrainingService(dit_handler=None)
    with pytest.raises(ValueError, match="dataset_dir or manifest_path"):
        svc.start(config={"max_steps": 1})
    # the failed validation must not leave a zombie "running" state
    assert svc.status()["status"] == "idle"
