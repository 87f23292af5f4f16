"""Background training service for the REST API.

Capability parity with the reference's training API
(/root/reference/acestep/api/* + api_server.py:557-622: LoRA/LoKr start
routes, /v1/training/{stop,status}, tensorboard process management). JAX
redesign: one background thread runs the LoRATrainer generator; progress
events land in a ring buffer served by /v1/training/status; metrics are
appended to a JSONL file (the tensorboard-equivalent artifact, plottable
by anything)."""

from __future__ import annotations

import os
import threading
import time
from collections import deque
from typing import Any, Dict, Optional

from acestep_tpu.serving.jobstore import append_jsonl


class TrainingService:
    def __init__(self, dit_handler):
        self.handler = dit_handler
        self._lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._stop_flag = threading.Event()
        self._state: Dict[str, Any] = {"status": "idle"}
        self._events: deque = deque(maxlen=200)

    # -- control ------------------------------------------------------------

    def start(self, *, dataset_dir: Optional[str] = None,
              manifest_path: Optional[str] = None,
              config: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        from acestep_tpu.training.lora import LoRATrainer, LoRATrainingConfig

        with self._lock:
            if self._thread and self._thread.is_alive():
                raise RuntimeError("training already running")
            tcfg = LoRATrainingConfig(**(config or {}))
            self._stop_flag.clear()
            self._state = {"status": "starting", "step": 0,
                           "max_steps": tcfg.max_steps,
                           "loss": None, "started_at": time.time(),
                           "output_dir": tcfg.output_dir}
            self._thread = threading.Thread(
                target=self._run, args=(tcfg, dataset_dir, manifest_path),
                daemon=True)
            self._thread.start()
        return {"status": "started", "config": tcfg.to_dict()}

    def stop(self) -> Dict[str, Any]:
        self._stop_flag.set()
        return {"status": "stopping"}

    def status(self) -> Dict[str, Any]:
        with self._lock:
            state = dict(self._state)
            state["events"] = list(self._events)[-20:]
            return state

    # -- worker -------------------------------------------------------------

    def _run(self, tcfg, dataset_dir: Optional[str],
             manifest_path: Optional[str]) -> None:
        try:
            from acestep_tpu.training.data import PreprocessedDataset, make_batches
            from acestep_tpu.training.lora import LoRATrainer
            from acestep_tpu.training.preprocess import preprocess_audio_files

            if dataset_dir is None:
                if manifest_path is None:
                    raise ValueError("dataset_dir or manifest_path required")
                dataset_dir = os.path.join(tcfg.output_dir, "tensors")
                self._update(status="preprocessing")
                preprocess_audio_files(self.handler, manifest_path,
                                       dataset_dir)

            dataset = PreprocessedDataset(dataset_dir)
            batches = make_batches(
                dataset.train_files, tcfg.batch_size,
                latent_dim=self.handler.cfg.audio_acoustic_hidden_dim)
            trainer = LoRATrainer(self.handler.params, self.handler.cfg, tcfg)
            self._update(status="training")
            metrics_path = os.path.join(tcfg.output_dir, "metrics.jsonl")

            def stoppable(source):
                for batch in source:
                    if self._stop_flag.is_set():
                        return
                    yield batch

            for step, loss, message in trainer.train(stoppable(batches)):
                self._update(step=step, loss=loss)
                self._events.append({"step": step, "loss": loss,
                                     "message": message,
                                     "ts": time.time()})
                append_jsonl(metrics_path, {"step": step, "loss": loss,
                                            "ts": time.time()})
                if self._stop_flag.is_set():
                    break
            # hand the trained adapter to the live LoRA runtime BEFORE the
            # terminal status flips (clients poll status then use the adapter)
            adapter_path = os.path.join(tcfg.output_dir,
                                        f"{tcfg.adapter_name}.npz")
            if os.path.exists(adapter_path) and self.handler.lora is not None:
                self.handler.lora.load(adapter_path,
                                       adapter_name=tcfg.adapter_name)
                self._update(adapter_loaded=tcfg.adapter_name)
            self._update(status="stopped" if self._stop_flag.is_set()
                         else "completed", finished_at=time.time())
        except Exception as e:
            self._update(status="failed", error=str(e))

    def _update(self, **kw) -> None:
        with self._lock:
            self._state.update(kw)
