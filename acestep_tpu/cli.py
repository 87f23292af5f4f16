"""Interactive CLI wizard: configure-and-generate loop.

Capability parity with the reference wizard (/root/reference/cli.py): an
interactive session that walks through caption/lyrics/metadata/sampler
settings, supports editing any field before generating, $EDITOR hook for
long text, repeated generation with tweaks, and non-interactive one-shot
flags for scripting.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
from typing import Any, Dict, List, Optional

from acestep_tpu.constants import (
    DURATION_MAX,
    DURATION_MIN,
    TASK_TYPES,
    VALID_LANGUAGES,
)
from acestep_tpu.inference import GenerationConfig, GenerationParams, generate_music


def _input(prompt: str, default: str = "") -> str:
    suffix = f" [{default}]" if default else ""
    try:
        value = input(f"{prompt}{suffix}: ").strip()
    except EOFError:
        return default
    return value or default


def _edit_in_editor(initial: str) -> str:
    """Open $EDITOR on a temp file (reference cli.py:335-407 behavior)."""
    import shlex

    editor = os.environ.get("EDITOR")
    if not editor:
        return initial
    with tempfile.NamedTemporaryFile("w+", suffix=".txt", delete=False) as f:
        f.write(initial)
        path = f.name
    try:
        # EDITOR may carry arguments ("code --wait", "vim -u NONE")
        subprocess.run(shlex.split(editor) + [path], check=False)
        with open(path, "r", encoding="utf-8") as f:
            return f.read().strip()
    finally:
        os.unlink(path)


FIELDS = [
    ("caption", "Music description / caption", str),
    ("lyrics", "Lyrics ([inst] for instrumental)", str),
    ("duration", f"Duration seconds ({DURATION_MIN}-{DURATION_MAX}, -1 auto)", float),
    ("bpm", "BPM (blank = auto)", int),
    ("keyscale", "Key scale (e.g. 'C major', blank = auto)", str),
    ("vocal_language", f"Language ({'/'.join(VALID_LANGUAGES[:6])}/...)", str),
    ("task_type", f"Task ({'/'.join(TASK_TYPES)})", str),
    ("inference_steps", "Diffusion steps", int),
    ("thinking", "Use LM planner (y/n)", bool),
    ("seed", "Seed (-1 random)", int),
]


def _collect_params(args) -> GenerationParams:
    params = GenerationParams(
        caption=args.caption or "",
        lyrics=args.lyrics or "",
        duration=args.duration,
        thinking=not args.no_think,
        inference_steps=args.steps,
        seed=args.seed,
        task_type=args.task,
    )
    if args.language:
        params.vocal_language = args.language
    return params


def _wizard_edit(params: GenerationParams) -> GenerationParams:
    print("\n-- Configure generation (enter keeps current value) --")
    for name, label, typ in FIELDS:
        current = getattr(params, name, None)
        if name == "thinking":
            raw = _input(label, "y" if params.thinking else "n")
            params.thinking = raw.lower().startswith("y")
            continue
        raw = _input(label, "" if current in (None, "", -1, -1.0)
                     else str(current))
        if not raw:
            continue
        if raw == "@edit" and typ is str:
            setattr(params, name, _edit_in_editor(str(current or "")))
            continue
        try:
            setattr(params, name, typ(raw))   # bools special-cased above
        except ValueError:
            print(f"  ! could not parse {raw!r}; keeping {current!r}")
    return params


def run_wizard(dit_handler, llm_handler, args) -> None:
    params = _collect_params(args)
    config = GenerationConfig(batch_size=args.batch, output_dir=args.output_dir,
                              audio_format=args.format)
    while True:
        params = _wizard_edit(params)
        print("\nGenerating...")
        result = generate_music(dit_handler, llm_handler, params, config)
        if result.success:
            for audio in result.audios:
                print(f"  -> {audio['path']}  (seed {audio['seed']})")
            costs = result.extra_outputs.get("time_costs", {})
            total = costs.get("total_time_cost")
            if total:
                print(f"  total {total:.2f}s "
                      f"(diffusion {costs.get('diffusion_time_cost', 0):.2f}s, "
                      f"vae {costs.get('vae_decode_time_cost', 0):.2f}s)")
        else:
            print(f"  generation failed: {result.error}")
        again = _input("\nGenerate again? (y/n)", "y")
        if not again.lower().startswith("y"):
            break


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="acestep-tpu", description="ACE-Step TPU music generation CLI")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--vae-dir", default=None)
    parser.add_argument("--lm-checkpoint-dir", default=None)
    parser.add_argument("--caption", default=None)
    parser.add_argument("--lyrics", default=None)
    parser.add_argument("--duration", type=float, default=-1.0)
    parser.add_argument("--language", default=None)
    parser.add_argument("--task", default="text2music", choices=TASK_TYPES)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--seed", type=int, default=-1)
    parser.add_argument("--no-think", action="store_true",
                        help="skip the LM planning phase")
    parser.add_argument("--format", default="wav")
    parser.add_argument("--output-dir", default="outputs")
    parser.add_argument("--once", action="store_true",
                        help="non-interactive: generate once and exit")
    return parser


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)

    from acestep_tpu.pipeline.handler import AceStepHandler

    handler = AceStepHandler()
    print("Initializing service (first TPU compile may take a minute)...")
    handler.initialize_service(checkpoint_dir=args.checkpoint_dir,
                               vae_dir=args.vae_dir)
    llm = None
    if args.lm_checkpoint_dir:
        from acestep_tpu.llm.handler import LLMHandler

        llm = LLMHandler()
        llm.initialize(checkpoint_dir=args.lm_checkpoint_dir)

    if args.once:
        params = _collect_params(args)
        config = GenerationConfig(batch_size=args.batch,
                                  output_dir=args.output_dir,
                                  audio_format=args.format)
        result = generate_music(handler, llm, params, config)
        if not result.success:
            print(f"generation failed: {result.error}", file=sys.stderr)
            return 1
        for audio in result.audios:
            print(audio["path"])
        return 0

    run_wizard(handler, llm, args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
