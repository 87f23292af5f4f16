"""Profiler / benchmark harness.

Capability parity with /root/reference/profile_inference.py: modes
- profile:        one configured generation with per-stage time costs
- benchmark:      duration x batch x steps matrix, JSON report with RTF
- tier-test:      iterate memory tiers via ACESTEP_MAX_HBM_GB override and
                  validate init + a small generation per tier
- understand / create_sample / format_sample: LM utility modes

Metrics per run: wall seconds, seconds-per-song, real-time factor
(audio seconds generated per wall second), DiT steps/s, VAE decode RTF —
the BASELINE.md measurement set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any, Dict, List, Optional


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _init_handler(args, hbm_override: Optional[float] = None,
                  quantization: Optional[str] = None):
    if hbm_override is not None:
        os.environ["ACESTEP_MAX_HBM_GB"] = str(hbm_override)
        # the global tier is cached after first use; re-pin it per tier run
        from acestep_tpu.runtime_config import get_tier_config, set_global_config

        set_global_config(get_tier_config(float(hbm_override)))
    from acestep_tpu.pipeline.handler import AceStepHandler

    handler = AceStepHandler()
    t0 = time.time()
    handler.initialize_service(checkpoint_dir=args.checkpoint_dir,
                               vae_dir=args.vae_dir,
                               quantization=quantization)
    from acestep_tpu.parallel import parse_mesh_spec

    mesh_spec = parse_mesh_spec(getattr(args, "mesh", None))
    if mesh_spec:
        handler.enable_mesh(dp=mesh_spec[0], tp=mesh_spec[1])
    return handler, time.time() - t0


def _run_once(handler, *, duration: float, batch: int, steps: int,
              warm: bool = False) -> Dict[str, Any]:
    t0 = time.time()
    result = handler.generate_music(
        "an upbeat synthpop track with bright leads",
        "[inst]",
        audio_duration=duration, batch_size=batch, infer_steps=steps,
        seeds=42, save_dir=None,
    )
    wall = time.time() - t0
    costs = result.time_costs
    diff = costs.get("diffusion_time_cost", 0.0) or 1e-9
    vae = costs.get("vae_decode_time_cost", 0.0) or 1e-9
    # the handler clamps batch to the tier ceiling (effective_batch) —
    # per-song metrics must divide by what actually RENDERED, and the
    # report must say so, or clamped sweeps publish ~4x-inflated numbers
    actual = max(1, len(result.seeds or [])) or batch
    out = {
        "duration_s": duration, "batch": batch, "steps": steps,
        "warm": warm,
        "wall_s": round(wall, 3),
        "seconds_per_song": round(wall / actual, 3),
        "rtf": round(duration * actual / wall, 2),
        "diffusion_s": round(diff, 3),
        "dit_steps_per_s": round(steps / diff, 2),
        "vae_decode_s": round(vae, 3),
        "vae_rtf": round(duration * actual / vae, 2),
        "costs": {k: round(v, 4) for k, v in costs.items()},
    }
    if actual != batch:
        out["batch_clamped_to"] = actual
    return out


def mode_profile(args) -> Dict[str, Any]:
    handler, init_s = _init_handler(args)
    cold = _run_once(handler, duration=args.duration, batch=args.batch,
                     steps=args.steps)
    report: Dict[str, Any] = {"mode": "profile", "init_s": round(init_s, 2),
                              "cold": cold}
    if args.detailed:
        # cProfile the warm run (reference --detailed, profile_inference.py
        # :505-520): host-side dispatch/prep hotspots; device time shows up
        # as the blocking np.asarray conversion.
        import cProfile
        import io
        import pstats

        prof = cProfile.Profile()
        prof.enable()
        warm = _run_once(handler, duration=args.duration, batch=args.batch,
                         steps=args.steps, warm=True)
        prof.disable()
        buf = io.StringIO()
        stats = pstats.Stats(prof, stream=buf).sort_stats("cumulative")
        stats.print_stats(25)
        report["detailed"] = buf.getvalue().splitlines()[:60]
    else:
        warm = _run_once(handler, duration=args.duration, batch=args.batch,
                         steps=args.steps, warm=True)
    report["warm"] = warm
    if args.llm_debug:
        report["llm_debug"] = _llm_token_throughput(args)
    return report


def _llm_token_throughput(args) -> Dict[str, Any]:
    """Token-level LM throughput (reference --llm-debug): prefill tokens/s
    and decode tokens/s for the constrained CoT loop and the codes scan."""
    llm = _init_llm(args)
    prompt = llm.build_formatted_prompt(
        "an upbeat synthpop track with bright leads", "[inst]")
    n_prompt = len(llm.tokenizer.encode(prompt))
    tables = llm._cot_tables({"duration": 30}, None)

    # warm both programs, then measure
    llm.engine.generate_cot_device(prompt, fsm_tables=tables,
                                   max_tokens=128, seed=0)
    t0 = time.time()
    toks = llm.engine.generate_cot_device(prompt, fsm_tables=tables,
                                          max_tokens=128, seed=1)
    cot_s = time.time() - t0

    llm.engine.generate_codes([prompt], n_codes=150, seed=0)
    t0 = time.time()
    llm.engine.generate_codes([prompt], n_codes=150, seed=1)
    codes_s = time.time() - t0

    out = llm.engine.generate([prompt], max_new_tokens=64, seed=2)
    t0 = time.time()
    out = llm.engine.generate([prompt], max_new_tokens=64, seed=3)
    generic_s = time.time() - t0
    return {
        "prompt_tokens": n_prompt,
        "cot_tokens": len(toks),
        "cot_wall_s": round(cot_s, 3),
        "cot_tokens_per_s": round(len(toks) / max(cot_s, 1e-9), 1),
        "codes_tokens_per_s": round(150 / max(codes_s, 1e-9), 1),
        "generic_tokens_per_s": round(
            len(out.token_ids[0]) / max(generic_s, 1e-9), 1),
    }


def _run_think_once(handler, llm, *, duration: float, batch: int,
                    steps: int, warm: bool = False) -> Dict[str, Any]:
    """One thinking (LM-planned) run through the inference facade."""
    from acestep_tpu import inference
    from acestep_tpu.inference import GenerationConfig, GenerationParams

    params = GenerationParams(
        caption="an upbeat synthpop track with bright leads",
        lyrics="[inst]", thinking=True, duration=float(duration), seed=42,
        inference_steps=steps)
    config = GenerationConfig(batch_size=batch, output_dir=None,
                              allow_lm_batch=True, use_random_seed=False)
    t0 = time.time()
    result = inference.generate_music(handler, llm, params, config)
    wall = time.time() - t0
    costs = result.extra_outputs.get("time_costs", {}) if result.success \
        else {}
    return {
        "duration_s": duration, "batch": batch, "steps": steps,
        "thinking": True, "warm": warm, "ok": bool(result.success),
        "wall_s": round(wall, 3),
        "seconds_per_song": round(wall / batch, 3),
        "rtf": round(duration * batch / wall, 2),
        "lm_s": round(costs.get("lm_time_cost", 0.0), 3),
        "diffusion_s": round(costs.get("diffusion_time_cost", 0.0), 3),
        "vae_decode_s": round(costs.get("vae_decode_time_cost", 0.0), 3),
    }


def mode_benchmark(args) -> Dict[str, Any]:
    """duration x batch x steps x thinking matrix (the reference's
    `--mode benchmark` default matrix spans the same four dimensions,
    docs/en/BENCHMARK.md:112-116; it clamps by GPU memory where we clamp
    by the HBM tier at request time)."""
    handler, init_s = _init_handler(args)
    durations = [float(d) for d in args.durations.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    steps_list = ([int(s) for s in args.steps_list.split(",")]
                  if args.steps_list else [args.steps])
    think_opts = [False, True] if args.thinking_matrix else [False]
    llm = lm_info = None
    if True in think_opts:
        # the tier's REAL planner geometry (initialize_auto walks the
        # fallback ladder with random weights when no checkpoint dir is
        # given) — a tiny fallback LM would make the thinking rows
        # meaningless against the reference matrix
        from acestep_tpu.llm.handler import LLMHandler

        llm = LLMHandler()
        if getattr(args, "lm_checkpoint_dir", None):
            llm.initialize(checkpoint_dir=args.lm_checkpoint_dir)
        else:
            try:
                lm_info = llm.initialize_auto()
            except RuntimeError:
                # CPU/test tiers have no planner budget: tiny fallback,
                # clearly labeled so the rows aren't mistaken for real
                # planner latency
                llm.initialize()
                lm_info = {"size": "tiny-fallback", "quantization": None,
                           "downgraded": False}
            log(f"bench thinking planner: {lm_info}")
    rows: List[Dict[str, Any]] = []
    for duration in durations:
        for batch in batches:
            for steps in steps_list:
                for think in think_opts:
                    if think:
                        def runner(warm=False):
                            return _run_think_once(
                                handler, llm, duration=duration,
                                batch=batch, steps=steps, warm=warm)
                    else:
                        def runner(warm=False):
                            return _run_once(handler, duration=duration,
                                             batch=batch, steps=steps,
                                             warm=warm)
                    runner()                             # compile
                    rows.append(runner(warm=True))
                    log(f"bench d={duration} b={batch} s={steps} "
                        f"think={think}: {rows[-1]['seconds_per_song']}"
                        f"s/song rtf={rows[-1]['rtf']}")
    report = {"mode": "benchmark", "init_s": round(init_s, 2),
              "steps_list": steps_list, "rows": rows}
    if lm_info:
        report["lm_planner"] = lm_info
    return report


def mode_tier_test(args) -> Dict[str, Any]:
    from acestep_tpu.runtime_config import get_tier_config

    tiers = ([float(t) for t in args.tiers.split(",")] if args.tiers
             else [0.0, 8.0, 16.0, 32.0])
    results = []
    handler = None
    for hbm in tiers:
        tier = get_tier_config(float(hbm))
        entry: Dict[str, Any] = {"hbm_gb": hbm, "tier": tier.name,
                                 "max_batch": tier.max_batch,
                                 "max_duration": tier.max_duration_s,
                                 "lm": tier.lm_size}
        try:
            # drop the previous tier's params BEFORE the next init: two
            # resident DiT+VAE sets would corrupt exactly the memory-limit
            # measurement this mode makes (same reason bench.py dels its
            # bf16 handler before the quantized one)
            handler = None
            handler, init_s = _init_handler(args, hbm_override=float(hbm))
            run = _run_once(handler, duration=10.0,
                            batch=min(2, tier.max_batch), steps=4)
            entry.update(init_s=round(init_s, 2), ok=True,
                         seconds_per_song=run["seconds_per_song"])
        except Exception as e:  # tier failure is a result, not a crash
            entry.update(ok=False, error=str(e))
            results.append(entry)
            log(f"tier {tier.name}: {entry}")
            continue

        if args.tier_boundary:
            # Minimum tier at which quantization can be disabled (reference
            # --tier-boundary, BENCHMARK.md:205-219): bf16 vs quantized
            # configurations per tier.
            entry["boundary"] = []
            handler = None        # boundary configs are measured alone
            h2 = None
            for quant in (None, "int8", "fp8", "w8a8"):
                try:
                    h2 = None     # free the previous quant config first
                    h2, _ = _init_handler(args, hbm_override=float(hbm),
                                          quantization=quant)
                    r = _run_once(h2, duration=10.0, batch=1, steps=4)
                    entry["boundary"].append(
                        {"quantization": quant or "bf16", "ok": True,
                         "wall_s": r["wall_s"]})
                except Exception as e:
                    entry["boundary"].append(
                        {"quantization": quant or "bf16", "ok": False,
                         "error": str(e)[:200]})
                log(f"  boundary {quant or 'bf16'}: "
                    f"{entry['boundary'][-1]}")
            h2 = None     # last quant config must not stay resident

        if args.tier_batch_boundary:
            # Max safe batch per tier (reference --tier-batch-boundary,
            # BENCHMARK.md:226-233): escalate 1,2,4,8 until failure.
            entry["batch_boundary"] = []
            if handler is None:   # released by the quant-boundary sweep
                h2 = None
                handler, _ = _init_handler(args, hbm_override=float(hbm))
            # probing the REAL OOM boundary: lift the tier clamp for the
            # sweep, otherwise batches above max_batch silently render at
            # the cap and report fake 'ok' rows
            import dataclasses as _dc
            handler.tier = _dc.replace(handler.tier, max_batch=8)
            max_ok = 0
            for batch in (1, 2, 4, 8):
                try:
                    r = _run_once(handler, duration=10.0, batch=batch,
                                  steps=4)
                    entry["batch_boundary"].append(
                        {"batch": batch, "ok": True,
                         "seconds_per_song": r["seconds_per_song"]})
                    max_ok = batch
                except Exception as e:
                    entry["batch_boundary"].append(
                        {"batch": batch, "ok": False,
                         "error": str(e)[:200]})
                    log(f"  batch boundary {batch}: "
                        f"{entry['batch_boundary'][-1]}")
                    break
                log(f"  batch boundary {batch}: "
                    f"{entry['batch_boundary'][-1]}")
            entry["max_safe_batch"] = max_ok

        results.append(entry)
        log(f"tier {tier.name}: ok")
    return {"mode": "tier-test", "tiers": results,
            "boundary": args.tier_boundary,
            "batch_boundary": args.tier_batch_boundary}


def _init_llm(args):
    from acestep_tpu.llm.handler import LLMHandler

    llm = LLMHandler()
    llm.initialize(checkpoint_dir=getattr(args, "lm_checkpoint_dir", None))
    return llm


def mode_understand(args) -> Dict[str, Any]:
    llm = _init_llm(args)
    codes = "".join(f"<|audio_code_{i % 64000}|>" for i in range(50))
    t0 = time.time()
    out = llm.understand(codes)
    return {"mode": "understand", "wall_s": round(time.time() - t0, 2),
            "output": out}


def mode_create_sample(args) -> Dict[str, Any]:
    llm = _init_llm(args)
    t0 = time.time()
    out = llm.create_sample(args.query or "a rainy day lofi track")
    return {"mode": "create_sample", "wall_s": round(time.time() - t0, 2),
            "output": out}


def mode_format_sample(args) -> Dict[str, Any]:
    llm = _init_llm(args)
    t0 = time.time()
    out = llm.format_sample("edm banger", "la la la")
    return {"mode": "format_sample", "wall_s": round(time.time() - t0, 2),
            "output": out}


MODES = {
    "profile": mode_profile,
    "benchmark": mode_benchmark,
    "tier-test": mode_tier_test,
    "understand": mode_understand,
    "create_sample": mode_create_sample,
    "format_sample": mode_format_sample,
}


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mode", default="profile", choices=sorted(MODES))
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--vae-dir", default=None)
    parser.add_argument("--lm-checkpoint-dir", default=None)
    parser.add_argument("--mesh", default=os.environ.get("ACESTEP_MESH"),
                        help="multi-chip DiT mesh 'DPxTP' or device count "
                             "(env: ACESTEP_MESH)")
    parser.add_argument("--duration", type=float, default=30.0)
    parser.add_argument("--durations", default="10,30,60")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--batches", default="1,2")
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--steps-list", default=None,
                        help="benchmark mode: comma-separated steps "
                             "dimension (reference default matrix: 8,16)")
    parser.add_argument("--thinking-matrix", action="store_true",
                        help="benchmark mode: add the thinking True/False "
                             "dimension (runs the LM planner)")
    parser.add_argument("--query", default=None)
    parser.add_argument("--output", default=None,
                        help="write the JSON report here as well")
    parser.add_argument("--detailed", action="store_true",
                        help="cProfile the warm run (host-side hotspots)")
    parser.add_argument("--llm-debug", action="store_true",
                        help="LM token-level throughput (prefill/CoT/codes)")
    parser.add_argument("--tier-boundary", action="store_true",
                        help="per tier: test bf16 + each quantization mode")
    parser.add_argument("--tier-batch-boundary", action="store_true",
                        help="per tier: escalate batch 1,2,4,8 until failure")
    parser.add_argument("--tiers", default=None,
                        help="comma-separated HBM GB values for tier-test")
    args = parser.parse_args(argv)

    report = MODES[args.mode](args)
    payload = json.dumps(report, indent=2, default=str)
    print(payload)
    if args.output:
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(payload)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
