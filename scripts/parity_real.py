"""One-command real-checkpoint parity harness (torch CPU vs JAX).

Given a downloaded DiT checkpoint directory, runs the reference's own
seeded `test_forward`-style inputs (reference
acestep/models/turbo/modeling_acestep_v15_turbo.py:2004-2156) through
BOTH stacks — the reference torch model instantiated from the same
weights, and this repo's JAX port loaded through the checkpoint
converter — and reports per-module max error plus a seeded 10 s
end-to-end latent diff.

    python scripts/parity_real.py --checkpoint-dir checkpoints/acestep-v15-turbo
    python scripts/parity_real.py --synthetic      # no weights needed

Skips cleanly (exit 0 with a message) when weights or the reference
modeling code are absent. `--synthetic` builds a random-weight reference
model at tiny geometry, SAVES it as a checkpoint directory, and runs the
exact same real-checkpoint code path over it — the green-path exercise
for environments without released weights (this image).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_MODELING_DIRS = (
    "/root/reference/acestep/models/turbo",
)

TINY = dict(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    patch_size=2, in_channels=192, audio_acoustic_hidden_dim=64,
    sliding_window=8, layer_types=["sliding_attention", "full_attention"],
    rope_theta=1_000_000.0, text_hidden_dim=32, timbre_hidden_dim=64,
    num_lyric_encoder_hidden_layers=2, num_timbre_encoder_hidden_layers=1,
    num_attention_pooler_hidden_layers=1, fsq_dim=64,
)


def _skip(msg: str) -> int:
    print(f"parity_real: SKIP — {msg}")
    return 0


def _load_ref_modeling(ckpt_dir: str, extra_dir: str | None):
    """Import the reference modeling/config modules (checkpoint code files
    first — real checkpoints ship them — then the mounted reference)."""
    import torch

    if "vector_quantize_pytorch" not in sys.modules:
        # FSQ dependency: unused under precomputed LM hints / text2music
        stub = types.ModuleType("vector_quantize_pytorch")

        class ResidualFSQ(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        stub.ResidualFSQ = ResidualFSQ
        sys.modules["vector_quantize_pytorch"] = stub

    candidates = [ckpt_dir] + ([extra_dir] if extra_dir else []) \
        + list(REF_MODELING_DIRS)
    for d in candidates:
        if d and os.path.isfile(os.path.join(d,
                                "modeling_acestep_v15_turbo.py")):
            sys.path.insert(0, d)
            try:
                import configuration_acestep_v15 as ref_cfg_mod
                import modeling_acestep_v15_turbo as ref_mod
            finally:
                sys.path.remove(d)
            return ref_cfg_mod, ref_mod
    return None, None


def _ref_config_kwargs(ckpt_dir: str) -> dict:
    path = os.path.join(ckpt_dir, "config.json")
    if not os.path.isfile(path):
        return {}
    with open(path, "r", encoding="utf-8") as f:
        raw = json.load(f)
    raw.pop("architectures", None)
    raw.pop("auto_map", None)
    return raw


def _our_config(ref_kwargs: dict):
    from acestep_tpu.config import DiTConfig
    import dataclasses

    fields = {f.name for f in dataclasses.fields(DiTConfig)}
    kw = {k: v for k, v in ref_kwargs.items() if k in fields}
    if isinstance(kw.get("layer_types"), list):
        kw["layer_types"] = tuple(kw["layer_types"])
    if isinstance(kw.get("fsq_levels"), list):
        kw["fsq_levels"] = tuple(kw["fsq_levels"])
    return DiTConfig(**kw, attention_impl="dense")


def make_synthetic_checkpoint(out_dir: str) -> str:
    """Random-weight reference model at tiny geometry, saved exactly like
    a real checkpoint dir (model.safetensors + config.json +
    silence_latent.pt + the modeling code files)."""
    import shutil

    import numpy as np
    import torch
    from safetensors.numpy import save_file

    ref_cfg_mod, ref_mod = _load_ref_modeling(out_dir, None)
    if ref_mod is None:
        raise RuntimeError("reference modeling code not found")
    torch.manual_seed(3)
    ref_config = ref_cfg_mod.AceStepConfig(**TINY)
    ref_config._attn_implementation = "eager"
    model = ref_mod.AceStepConditionGenerationModel(ref_config).eval()
    state = {k: v.detach().numpy().copy()
             for k, v in model.state_dict().items()}
    # the FSQ stub holds no params; its projections are unused under
    # precomputed hints — write zeros so the converter stays strict
    state.setdefault("tokenizer.quantizer.layers.0.project_in.weight",
                     np.zeros((6, TINY["fsq_dim"]), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_in.bias",
                     np.zeros((6,), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.weight",
                     np.zeros((TINY["fsq_dim"], 6), np.float32))
    state.setdefault("tokenizer.quantizer.layers.0.project_out.bias",
                     np.zeros((TINY["fsq_dim"],), np.float32))
    os.makedirs(out_dir, exist_ok=True)
    save_file(state, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w",
              encoding="utf-8") as f:
        json.dump(TINY, f)
    torch.save(torch.zeros(1, 50, TINY["audio_acoustic_hidden_dim"]),
               os.path.join(out_dir, "silence_latent.pt"))
    for d in REF_MODELING_DIRS:
        for fn in ("modeling_acestep_v15_turbo.py",
                   "configuration_acestep_v15.py"):
            p = os.path.join(d, fn)
            if os.path.isfile(p):
                shutil.copy(p, os.path.join(out_dir, fn))
    return out_dir


def run_parity(ckpt_dir: str, reference_dir: str | None, seconds: float,
               seed: int, tol: float) -> int:
    import numpy as np

    try:
        import torch
    except ImportError:
        return _skip("torch not installed")

    ref_cfg_mod, ref_mod = _load_ref_modeling(ckpt_dir, reference_dir)
    if ref_mod is None:
        return _skip("reference modeling code not found (checkpoint dir, "
                     "--reference-dir, or /root/reference)")
    if not any(f.endswith(".safetensors") for f in os.listdir(ckpt_dir)):
        return _skip(f"no .safetensors in {ckpt_dir}")

    import jax
    import jax.numpy as jnp

    from acestep_tpu.models.dit import dit_decoder, prepare_condition
    from acestep_tpu.models.sampler import (
        ConditionSet, build_turbo_schedule, sample_turbo)
    from acestep_tpu.utils.checkpoint import (
        convert_dit_state, load_safetensors_dir)

    ref_kwargs = _ref_config_kwargs(ckpt_dir)
    ref_config = ref_cfg_mod.AceStepConfig(**ref_kwargs) if ref_kwargs \
        else ref_cfg_mod.AceStepConfig()
    ref_config._attn_implementation = "eager"
    cfg = _our_config(ref_kwargs or {})

    print(f"parity_real: loading {ckpt_dir} "
          f"(hidden={ref_config.hidden_size}, "
          f"layers={ref_config.num_hidden_layers})")
    state = load_safetensors_dir(ckpt_dir)

    # ---- torch side: the actual reference model with the real weights
    model = ref_mod.AceStepConditionGenerationModel(ref_config).eval()
    tstate = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}
    missing, unexpected = model.load_state_dict(tstate, strict=False)
    # the FSQ stub has no params: its quantizer weights land in `unexpected`
    unexpected = [k for k in unexpected if "quantizer" not in k]
    if missing or unexpected:
        print(f"parity_real: WARNING state_dict mismatch — missing "
              f"{missing[:4]}..., unexpected {unexpected[:4]}...")

    # ---- JAX side: same weights through the converter
    params = convert_dit_state(dict(state), cfg, dtype=jnp.float32)

    results = {}
    rng = np.random.default_rng(seed)
    H = ref_config.audio_acoustic_hidden_dim
    T = int(seconds * 25)

    # ---- module check 1: decoder forward (one denoise step) ----------
    B = 2
    xt = rng.standard_normal((B, T, H)).astype(np.float32)
    ctx = rng.standard_normal((B, T, 2 * H)).astype(np.float32)
    enc_len = 32
    enc = rng.standard_normal(
        (B, enc_len, ref_config.hidden_size)).astype(np.float32)
    tv = np.asarray([0.7, 0.3], np.float32)
    with torch.no_grad():
        ref_dec = model.decoder(
            hidden_states=torch.from_numpy(xt),
            timestep=torch.from_numpy(tv),
            timestep_r=torch.from_numpy(tv),
            attention_mask=torch.ones(B, T),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.ones(B, enc_len),
            context_latents=torch.from_numpy(ctx),
        )[0].numpy()
    with jax.default_matmul_precision("float32"):
        ours_dec = np.asarray(dit_decoder(
            params, cfg, jnp.asarray(xt), jnp.asarray(tv), jnp.asarray(tv),
            jnp.asarray(ctx), encoder_hidden_states=jnp.asarray(enc)))
    scale = max(1e-6, float(np.abs(ref_dec).max()))
    results["decoder_forward"] = float(np.abs(ours_dec - ref_dec).max())
    print(f"parity_real: decoder forward max err "
          f"{results['decoder_forward']:.3e} (output scale {scale:.3f})")

    # ---- end-to-end: seeded 10 s text2music trajectory ----------------
    Lt, Ll = 8, 16
    text_h = rng.standard_normal(
        (1, Lt, ref_config.text_hidden_dim)).astype(np.float32)
    lyric_h = rng.standard_normal(
        (1, Ll, ref_config.text_hidden_dim)).astype(np.float32)
    refer = rng.standard_normal(
        (1, 2 * ref_config.pool_window_size, H)).astype(np.float32)
    hints = rng.standard_normal((1, T, H)).astype(np.float32)
    src = np.zeros((1, T, H), np.float32)
    chunk = np.ones((1, T, H), np.float32)
    torch_kw = dict(
        text_hidden_states=torch.from_numpy(text_h),
        text_attention_mask=torch.ones(1, Lt),
        lyric_hidden_states=torch.from_numpy(lyric_h),
        lyric_attention_mask=torch.ones(1, Ll),
        refer_audio_acoustic_hidden_states_packed=torch.from_numpy(refer),
        refer_audio_order_mask=torch.zeros(1).long(),
        src_latents=torch.from_numpy(src),
        chunk_masks=torch.from_numpy(chunk),
        is_covers=torch.zeros(1),
        precomputed_lm_hints_25Hz=torch.from_numpy(hints),
        silence_latent=torch.zeros(1, T, H),
        attention_mask=torch.ones(1, T),
    )
    with torch.no_grad():
        ref_out = model.generate_audio(seed=seed, fix_nfe=8,
                                       infer_method="ode", shift=3.0,
                                       **torch_kw)
        noise = model.prepare_noise(
            torch.cat([torch.from_numpy(src), torch.from_numpy(chunk)],
                      dim=-1), seed=seed).numpy()
    ref_traj = ref_out["target_latents"].numpy()

    with jax.default_matmul_precision("float32"):
        enc_j, _m, ctx_j = prepare_condition(
            params, cfg,
            text_hidden_states=jnp.asarray(text_h),
            text_attention_mask=jnp.ones((1, Lt), jnp.int32),
            lyric_hidden_states=jnp.asarray(lyric_h),
            lyric_attention_mask=jnp.ones((1, Ll), jnp.int32),
            refer_audio_packed=jnp.asarray(refer),
            refer_order_mask=jnp.zeros((1,), jnp.int32),
            src_latents=jnp.asarray(src),
            chunk_masks=jnp.asarray(chunk),
            is_covers=jnp.zeros((1,), jnp.int32),
            precomputed_lm_hints_25hz=jnp.asarray(hints),
        )
        cond = ConditionSet.build(params, cfg, enc_j, ctx_j)
        ours_traj = np.asarray(sample_turbo(
            params, cfg, x_init=jnp.asarray(noise),
            schedule=tuple(build_turbo_schedule(3.0)), cond=cond,
            infer_method="ode"))
    tscale = max(1e-6, float(np.abs(ref_traj).max()))
    results["trajectory_10s"] = float(np.abs(ours_traj - ref_traj).max())
    results["trajectory_rel"] = results["trajectory_10s"] / tscale
    print(f"parity_real: {seconds:.0f}s 8-step ODE trajectory max err "
          f"{results['trajectory_10s']:.3e} "
          f"(rel {results['trajectory_rel']:.3e}, scale {tscale:.3f})")

    ok = (results["decoder_forward"] <= tol * scale
          and results["trajectory_rel"] <= tol)
    print(json.dumps({"ok": bool(ok), "tol": tol, **results}))
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint-dir",
                    default="checkpoints/acestep-v15-turbo")
    ap.add_argument("--reference-dir", default=None,
                    help="dir holding the reference modeling .py files")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tol", type=float, default=2e-2,
                    help="relative tolerance on each check")
    ap.add_argument("--synthetic", action="store_true",
                    help="build a random-weight tiny checkpoint and run "
                         "the real path over it (green-path exercise)")
    args = ap.parse_args()

    if args.synthetic:
        tmp = tempfile.mkdtemp(prefix="acestep_parity_synth_")
        try:
            make_synthetic_checkpoint(tmp)
        except RuntimeError as e:
            return _skip(str(e))
        print(f"parity_real: synthetic checkpoint at {tmp}")
        return run_parity(tmp, args.reference_dir, args.seconds, args.seed,
                          args.tol)

    if not os.path.isdir(args.checkpoint_dir):
        return _skip(f"checkpoint dir {args.checkpoint_dir} not found — "
                     "run acestep-tpu-download first")
    return run_parity(args.checkpoint_dir, args.reference_dir, args.seconds,
                      args.seed, args.tol)


if __name__ == "__main__":
    sys.exit(main())
