"""LoRA trainer + preprocessing + data module tests (tiny geometry, CPU)."""

import json
import os

import jax
import numpy as np
import pytest

# slow tier: real training loops (loss-decrease, orbax resume, mesh)
pytestmark = pytest.mark.slow

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.models.dit import init_dit_params
from acestep_tpu.training.data import PreprocessedDataset, make_batches
from acestep_tpu.training.lora import LoRATrainer, LoRATrainingConfig
from acestep_tpu.training.preprocess import preprocess_samples


class _FakeEmbedder:
    dim = 16

    def encode_text(self, texts, max_len=256):
        L = 8
        h = np.stack([np.full((L, self.dim), (hash(t) % 97) / 97.0,
                              np.float32) for t in texts])
        return h, np.ones((len(texts), L), np.int32)

    encode_lyrics = encode_text


class _FakeHandler:
    """Minimal preprocessing host: encode_audio + text_embedder."""

    def __init__(self):
        self.text_embedder = _FakeEmbedder()

    def encode_audio(self, audio):
        T = max(4, audio.shape[0] // 1920)
        return np.linspace(0, 1, T * 8, dtype=np.float32).reshape(T, 8)


@pytest.fixture(scope="module")
def tensor_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tensors"))
    handler = _FakeHandler()
    samples = [
        {"audio": np.zeros((1920 * 8, 2), np.float32),
         "caption": f"song {i}", "lyrics": "[inst]"}
        for i in range(4)
    ]
    paths = list(preprocess_samples(handler, samples, out))
    assert len(paths) == 4
    return out


def test_preprocess_output_keys(tensor_dir):
    files = sorted(os.listdir(tensor_dir))
    assert files[0] == "sample_00000.npz"
    with np.load(os.path.join(tensor_dir, files[0])) as data:
        for key in ("hidden_states", "text_hidden_states",
                    "text_attention_mask", "lyric_hidden_states",
                    "lyric_attention_mask"):
            assert key in data.files


def test_dataset_split_and_batches(tensor_dir):
    ds = PreprocessedDataset(tensor_dir, val_fraction=0.25)
    assert len(ds.train_files) == 3 and len(ds.val_files) == 1

    it = make_batches(ds.train_files, batch_size=2, latent_dim=8,
                      frame_bucket=8, epochs=1, refer_frames=4)
    batch = next(it)
    B, T, C = batch["hidden_states"].shape
    assert B == 2 and C == 8 and T % 8 == 0
    assert batch["src_latents"].shape == batch["hidden_states"].shape
    assert batch["chunk_masks"].shape == (B, T, 8)
    assert batch["is_covers"].shape == (B,)
    # static shapes across batches
    shapes = {k: v.shape for k, v in batch.items()}
    for more in it:
        assert {k: v.shape for k, v in more.items()} == shapes


def _tiny_training_batches(cfg, n, batch=2, frames=16):
    from acestep_tpu.training.step import tiny_batch

    for i in range(n):
        b = tiny_batch(cfg, jax.random.PRNGKey(i), batch=batch, frames=frames)
        yield {k: np.asarray(v) for k, v in b.items()}


def test_lora_trainer_loss_decreases_and_checkpoints(tmp_path):
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    tcfg = LoRATrainingConfig(
        rank=2, max_steps=6, learning_rate=5e-3, checkpoint_every=3,
        output_dir=str(tmp_path / "out"), log_every=1,
        timestep_mode="discrete_shift3", seed=0)
    trainer = LoRATrainer(params, cfg, tcfg)
    events = list(trainer.train(_tiny_training_batches(cfg, 10)))
    steps = [e[0] for e in events]
    assert steps[-1] == 6
    assert any("checkpoint saved" in e[2] for e in events)
    assert os.path.exists(str(tmp_path / "out" / "adapter.npz"))
    assert os.path.exists(str(tmp_path / "out" / "checkpoint_6" /
                              "trainer_state.json"))
    losses = [e[1] for e in events if "loss" in e[2]]
    assert all(np.isfinite(l) for l in losses)


def test_lora_trainer_resume(tmp_path):
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path / "out")
    tcfg = LoRATrainingConfig(rank=2, max_steps=4, checkpoint_every=2,
                              output_dir=out, log_every=1)
    trainer = LoRATrainer(params, cfg, tcfg)
    list(trainer.train(_tiny_training_batches(cfg, 6)))

    tcfg2 = LoRATrainingConfig(rank=2, max_steps=6, checkpoint_every=10,
                               output_dir=out, log_every=1,
                               resume_from=os.path.join(out, "checkpoint_4"))
    trainer2 = LoRATrainer(params, cfg, tcfg2)
    events = list(trainer2.train(_tiny_training_batches(cfg, 6)))
    steps = [e[0] for e in events]
    assert steps[0] >= 5 and steps[-1] == 6   # resumed from step 4


def test_lokr_trainer_one_step(tmp_path):
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    tcfg = LoRATrainingConfig(kind="lokr", lokr_factor=2, max_steps=2,
                              output_dir=str(tmp_path / "out"), log_every=1)
    trainer = LoRATrainer(params, cfg, tcfg)
    events = list(trainer.train(_tiny_training_batches(cfg, 3)))
    assert events[-1][0] == 2


def test_trained_adapter_loads_into_manager(tmp_path):
    from acestep_tpu.lora.manager import LoraManager

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path / "out")
    tcfg = LoRATrainingConfig(rank=2, max_steps=2, checkpoint_every=0,
                              output_dir=out, adapter_name="mystyle",
                              log_every=1)
    list(LoRATrainer(params, cfg, tcfg).train(_tiny_training_batches(cfg, 3)))

    manager = LoraManager(params)
    info = manager.load(os.path.join(out, "mystyle.npz"))
    assert info["adapter_name"] == "mystyle"
    effective = manager.effective_params()
    assert effective is not params


def test_full_trainer_with_orbax_resume(tmp_path):
    from acestep_tpu.training.trainer_full import FullTrainer, FullTrainingConfig

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path / "full")
    tcfg = FullTrainingConfig(max_steps=4, checkpoint_every=2, log_every=1,
                              warmup_steps=1, output_dir=out)
    trainer = FullTrainer(params, cfg, tcfg)
    events = list(trainer.train(_tiny_training_batches(cfg, 6)))
    assert trainer.step == 4
    assert any("checkpoint" in e[2] for e in events)

    # fresh trainer restores the latest checkpoint and continues
    trainer2 = FullTrainer(params, cfg, dataclasses_replace(tcfg, max_steps=6))
    assert trainer2.restore()
    assert trainer2.step == 4
    events2 = list(trainer2.train(_tiny_training_batches(cfg, 6)))
    assert trainer2.step == 6
    assert all(np.isfinite(e[1]) for e in events2)


def test_full_trainer_sharded_mesh(tmp_path):
    from acestep_tpu.training.trainer_full import FullTrainer, FullTrainingConfig

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    tcfg = FullTrainingConfig(max_steps=2, checkpoint_every=0, log_every=1,
                              warmup_steps=1, mesh_dp=2, mesh_tp=2,
                              output_dir=str(tmp_path / "mesh"))
    trainer = FullTrainer(params, cfg, tcfg)
    events = list(trainer.train(_tiny_training_batches(cfg, 3, batch=4)))
    assert trainer.step == 2 and np.isfinite(events[-1][1])


def dataclasses_replace(tcfg, **kw):
    import dataclasses
    return dataclasses.replace(tcfg, **kw)


def test_lora_trainer_target_subset(tmp_path):
    """Targeted training (Side-Step estimation workflow): a targets
    subset trains ONLY those projections, and unknown names fail loudly."""
    from acestep_tpu.lora.manager import load_adapter_file

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    tcfg = LoRATrainingConfig(
        rank=2, max_steps=2, learning_rate=5e-3, checkpoint_every=10,
        output_dir=str(tmp_path / "out"), log_every=1,
        timestep_mode="discrete_shift3", seed=0,
        targets=("self_attn.q_proj", "cross_attn.v_proj"))
    trainer = LoRATrainer(params, cfg, tcfg)
    list(trainer.train(_tiny_training_batches(cfg, 4)))
    adapter = load_adapter_file(str(tmp_path / "out" / "adapter.npz"))
    assert set(adapter["weights"]) == {"self_attn.q_proj",
                                       "cross_attn.v_proj"}

    bad = LoRATrainingConfig(targets=("self_attn.nope",), max_steps=1,
                             output_dir=str(tmp_path / "b"))
    with pytest.raises(ValueError, match="unknown LoRA targets"):
        list(LoRATrainer(params, cfg, bad).train(
            _tiny_training_batches(cfg, 2)))
