"""Training CLI — the reference's "Side-Step" `train.py` counterpart.

Capability parity with /root/reference/train.py:1-270 (subcommands
`vanilla` / `fixed` / `estimate`) plus the rest of the training surface
this framework exposes anyway:

  acestep-tpu-train dataset    audio dir -> staged dataset build (scan ->
                               encode -> label -> manifest -> tensors)
  acestep-tpu-train preprocess manifest -> tensor dir
  acestep-tpu-train vanilla    LoRA/LoKr, DISCRETE turbo shift-3 timesteps
                               (reference training/trainer.py:303-324)
  acestep-tpu-train fixed      LoRA/LoKr, CONTINUOUS logit-normal timesteps
                               matching the model config (reference
                               training_v2/timestep_sampling.py:20-60)
  acestep-tpu-train estimate   per-target gradient-sensitivity ranking
                               (reference train.py `estimate`)
  acestep-tpu-train full       full-parameter trainer over a dp x tp mesh
                               (beyond the reference)
  acestep-tpu-train presets    list named presets

Shared flags load real checkpoints when given and fall back to seeded
random init otherwise (training mechanics are weight-independent, so the
whole CLI is exercisable in CI without released checkpoints).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import Optional

from acestep_tpu.config import DiTConfig, VAEConfig


def _resolve_pick(args) -> None:
    """--pick NAME: discover the checkpoint dir by (fuzzy) name under
    --checkpoint-root (the Side-Step model picker,
    training_v2/model_discovery.py:161-205)."""
    if not getattr(args, "pick", None) or args.checkpoint_dir:
        return
    from acestep_tpu.training.discovery import pick_model

    root = args.checkpoint_root or "checkpoints"
    info = pick_model(root, args.pick)
    if info is None:
        raise SystemExit(
            f"--pick {args.pick!r}: no matching model under {root}")
    print(f"[training] picked {info.name} "
          f"({'official' if info.is_official else 'custom'}, "
          f"base: {info.base_model}) at {info.path}")
    args.checkpoint_dir = info.path


def _build_handler(args) -> "AceStepHandler":
    from acestep_tpu.pipeline.handler import AceStepHandler

    _resolve_pick(args)
    if getattr(args, "tiny", False):
        # tiny VAE must emit latents at the tiny DiT's acoustic dim (64)
        handler = AceStepHandler(dit_config=DiTConfig.tiny(),
                                 vae_config=VAEConfig.tiny(
                                     decoder_input_channels=64),
                                 frame_bucket=25, min_frames=25,
                                 refer_frames=10)
    else:
        handler = AceStepHandler()
    handler.initialize_service(checkpoint_dir=args.checkpoint_dir,
                               vae_dir=args.vae_dir, seed=args.seed)
    return handler


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--checkpoint-dir", default=None,
                   help="DiT checkpoint dir (default: seeded random init)")
    p.add_argument("--checkpoint-root", default=None,
                   help="root scanned by --pick (default ./checkpoints)")
    p.add_argument("--pick", default=None, metavar="NAME",
                   help="discover the checkpoint by (fuzzy) name under "
                        "--checkpoint-root instead of a full path — the "
                        "Side-Step model picker "
                        "(training_v2/model_discovery.py)")
    p.add_argument("--vae-dir", default=None, help="VAE checkpoint dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="miniature model (CI / smoke tests)")


def _add_train_common(p: argparse.ArgumentParser) -> None:
    _add_common(p)
    p.add_argument("--tensor-dir", required=True,
                   help="directory of preprocessed sample_*.npz tensors")
    p.add_argument("--output-dir", default="lora_output")
    p.add_argument("--preset", default=None,
                   help="named preset (see `presets`); flags override it")
    p.add_argument("--kind", choices=["lora", "lokr"], default=None)
    p.add_argument("--rank", type=int, default=None)
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--lokr-factor", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--checkpoint-every", type=int, default=None)
    p.add_argument("--resume-from", default=None,
                   help="checkpoint_<step> directory to resume from")
    p.add_argument("--adapter-name", default=None)
    p.add_argument("--val-fraction", type=float, default=0.0)


def _training_config(args, timestep_mode: str):
    from acestep_tpu.training.lora import LoRATrainingConfig
    from acestep_tpu.training.presets import get_preset

    overrides = {
        name: getattr(args, name)
        for name in ("kind", "rank", "alpha", "lokr_factor", "learning_rate",
                     "batch_size", "max_steps", "checkpoint_every",
                     "resume_from", "adapter_name")
        if getattr(args, name) is not None
    }
    overrides["output_dir"] = args.output_dir
    overrides["seed"] = args.seed
    if getattr(args, "targets", None):
        overrides["targets"] = tuple(
            t.strip() for t in args.targets.split(",") if t.strip())
    if args.preset:
        tcfg = get_preset(args.preset, **overrides)
    else:
        tcfg = LoRATrainingConfig(**overrides)
    # the subcommand IS the timestep-mode selector (vanilla=discrete
    # shift-3, fixed=continuous — Side-Step semantics); it overrides
    # whatever the preset bundles
    return dataclasses.replace(tcfg, timestep_mode=timestep_mode)


def _run_adapter_training(args, timestep_mode: str) -> int:
    from acestep_tpu.training.data import PreprocessedDataset, make_batches
    from acestep_tpu.training.lora import LoRATrainer

    handler = _build_handler(args)
    tcfg = _training_config(args, timestep_mode)
    dataset = PreprocessedDataset(args.tensor_dir,
                                  val_fraction=args.val_fraction,
                                  seed=args.seed)
    batches = make_batches(dataset.train_files, tcfg.batch_size,
                           latent_dim=handler.cfg.audio_acoustic_hidden_dim,
                           seed=args.seed)
    print(f"training {tcfg.kind} ({tcfg.timestep_mode}) on "
          f"{len(dataset.train_files)} samples "
          f"(+{len(dataset.val_files)} val) -> {tcfg.output_dir}",
          flush=True)
    trainer = LoRATrainer(handler.params, handler.cfg, tcfg)
    for _step, _loss, message in trainer.train(batches):
        print(message, flush=True)
    return 0


def cmd_vanilla(args) -> int:
    return _run_adapter_training(args, "discrete_shift3")


def cmd_fixed(args) -> int:
    return _run_adapter_training(args, "continuous")


def cmd_estimate(args) -> int:
    from acestep_tpu.training.data import PreprocessedDataset, make_batches
    from acestep_tpu.training.presets import estimate_gradient_sensitivity

    handler = _build_handler(args)
    dataset = PreprocessedDataset(args.tensor_dir, seed=args.seed)
    batches = make_batches(dataset.train_files, args.batch_size,
                           latent_dim=handler.cfg.audio_acoustic_hidden_dim,
                           seed=args.seed)
    ranked = estimate_gradient_sensitivity(handler.params, handler.cfg,
                                           batches,
                                           num_batches=args.num_batches,
                                           seed=args.seed)
    print(f"{'target':<24} sensitivity")
    for name, score in ranked:
        print(f"{name:<24} {score:.6f}")
    top = [name for name, _ in ranked[: args.top_k]]
    print(f"\nsuggested LoRA targets (top {args.top_k}): {', '.join(top)}")
    return 0


def cmd_full(args) -> int:
    from acestep_tpu.training.data import PreprocessedDataset, make_batches
    from acestep_tpu.training.trainer_full import (FullTrainer,
                                                   FullTrainingConfig)

    handler = _build_handler(args)
    tcfg = FullTrainingConfig(
        learning_rate=args.learning_rate or 1e-4,
        max_steps=args.max_steps or 10_000,
        checkpoint_every=args.checkpoint_every or 1000,
        output_dir=args.output_dir, seed=args.seed,
        mesh_dp=args.mesh_dp, mesh_tp=args.mesh_tp)
    dataset = PreprocessedDataset(args.tensor_dir,
                                  val_fraction=args.val_fraction,
                                  seed=args.seed)
    batches = make_batches(dataset.train_files, args.batch_size or 1,
                           latent_dim=handler.cfg.audio_acoustic_hidden_dim,
                           seed=args.seed)
    trainer = FullTrainer(handler.params, handler.cfg, tcfg)
    if args.resume_from:
        # the full trainer resumes from ITS OWN output-dir checkpoint
        # manager: accept 'latest' or an integer step, not a foreign path
        if args.resume_from == "latest":
            step = None
        else:
            try:
                step = int(args.resume_from.rsplit("_", 1)[-1])
            except ValueError:
                raise SystemExit(
                    "full: --resume-from must be 'latest' or a step number "
                    "(checkpoints live under --output-dir/checkpoints)")
        if not trainer.restore(step):
            raise SystemExit(
                f"full: no checkpoint to resume in {args.output_dir}")
    for _step, _loss, message in trainer.train(batches):
        print(message, flush=True)
    return 0


def cmd_preprocess(args) -> int:
    from acestep_tpu.training.preprocess import preprocess_audio_files

    handler = _build_handler(args)
    written = preprocess_audio_files(handler, args.manifest, args.out_dir)
    print(f"wrote {len(written)} tensor files -> {args.out_dir}")
    return 0


def cmd_dataset(args) -> int:
    from acestep_tpu.training.dataset_builder import DatasetBuildPipeline

    handler = _build_handler(args)
    llm = None
    if args.label:
        from acestep_tpu.llm.handler import LLMHandler

        llm = LLMHandler()
        llm.initialize(seed=args.seed)
    pipeline = DatasetBuildPipeline(args.audio_dir, args.out_dir, handler,
                                    llm, val_fraction=args.val_fraction)
    result = pipeline.build()
    print(json.dumps(result, indent=2, default=str))
    return 0


def cmd_presets(_args) -> int:
    from acestep_tpu.training.presets import PRESETS

    for name, kw in PRESETS.items():
        desc = ", ".join(f"{k}={v}" for k, v in kw.items())
        print(f"{name:<10} {desc}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="acestep-tpu-train",
        description="ACE-Step TPU training CLI (Side-Step equivalent)")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("vanilla", help="LoRA/LoKr, discrete shift-3 "
                       "timesteps (trainer v1 semantics)")
    _add_train_common(p)
    p.set_defaults(fn=cmd_vanilla)

    p = sub.add_parser("fixed", help="LoRA/LoKr, continuous timesteps "
                       "matching the model config (v2 'fixed')")
    _add_train_common(p)
    p.set_defaults(fn=cmd_fixed)

    p = sub.add_parser("estimate", help="rank decoder projections by "
                       "gradient sensitivity on your dataset")
    _add_common(p)
    p.add_argument("--tensor-dir", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-batches", type=int, default=4)
    p.add_argument("--top-k", type=int, default=4)
    p.set_defaults(fn=cmd_estimate)

    p = sub.add_parser("full", help="full-parameter trainer "
                       "(orbax checkpoints, optional dp x tp mesh)")
    _add_train_common(p)
    p.add_argument("--mesh-dp", type=int, default=1)
    p.add_argument("--mesh-tp", type=int, default=1)
    p.set_defaults(fn=cmd_full)

    p = sub.add_parser("preprocess", help="manifest -> tensor dir")
    _add_common(p)
    p.add_argument("--manifest", required=True, help="dataset.json path")
    p.add_argument("--out-dir", required=True)
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("dataset", help="audio dir -> staged dataset build")
    _add_common(p)
    p.add_argument("--audio-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--label", action="store_true",
                   help="auto-caption unlabeled audio with the planner LM")
    p.add_argument("--val-fraction", type=float, default=0.0)
    p.set_defaults(fn=cmd_dataset)

    p = sub.add_parser("presets", help="list named training presets")
    p.set_defaults(fn=cmd_presets)
    return parser


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
