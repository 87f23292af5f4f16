#!/usr/bin/env python3
"""TPU environment diagnostic for ACE-Step TPU.

The reference ships `scripts/check_gpu.py` (288 LoC): a self-serve
doctor that checks the torch build, CUDA/ROCm devices, env vars, and
prints remediation steps. This is its TPU-native analog: JAX install,
backend/device detection, HBM + tier policy, compile cache, checkpoint
resolution, ACESTEP_* env review, and an optional on-device smoke test.

Usage:
    python scripts/check_tpu.py            # all passive checks
    python scripts/check_tpu.py --smoke    # + tiny on-device matmul
    python scripts/check_tpu.py --cpu      # force the CPU backend

Exit code 0 when every check passes (warnings allowed), 1 otherwise.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

HEADER_WIDTH = 72
_FAILURES = []


def section(title: str) -> None:
    print(f"\n{'=' * HEADER_WIDTH}\n  {title}\n{'=' * HEADER_WIDTH}")


def ok(msg: str) -> None:
    print(f"[ok]   {msg}")


def warn(msg: str) -> None:
    print(f"[warn] {msg}")


def fail(msg: str) -> None:
    _FAILURES.append(msg)
    print(f"[FAIL] {msg}")


def check_install() -> None:
    section("Python / library versions")
    print(f"python: {sys.version.split()[0]} ({sys.executable})")
    for mod in ("jax", "jaxlib", "flax", "optax", "numpy"):
        try:
            m = __import__(mod)
            ok(f"{mod} {getattr(m, '__version__', '?')}")
        except ImportError as e:
            fail(f"{mod} not importable: {e}")
    try:
        import torch

        ok(f"torch {torch.__version__} (CPU build is expected — torch is "
           "only used for checkpoint conversion and parity tests)")
    except ImportError:
        warn("torch not importable: checkpoint conversion from .bin/.pt "
             "files unavailable (safetensors still works)")


def check_devices(force_cpu: bool) -> list:
    section("Backend / device detection")
    if force_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        print("note: if the TPU backend is unreachable this step can block "
              "for ~20-25 min inside backend init before failing — that is "
              "the documented outage mode, not a hang in this script.")
    t0 = time.time()
    try:
        devices = jax.devices()
    except RuntimeError as e:
        fail(f"jax.devices() failed after {time.time() - t0:.0f}s: {e}")
        print("  remediation: check the TPU runtime / tunnel; force CPU "
              "with --cpu (or JAX_PLATFORMS=cpu) to test everything else.")
        return []
    ok(f"{len(devices)} device(s) in {time.time() - t0:.1f}s")
    for d in devices:
        print(f"       - {d.device_kind} (platform={d.platform}, id={d.id})")
    if devices and devices[0].platform == "cpu" and not force_cpu:
        warn("running on the CPU backend — generation works but is far "
             "from TPU speed")
    return devices


def check_tier(devices: list) -> None:
    section("Memory / tier policy")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from acestep_tpu.runtime_config import get_tier_config, lm_fallback_plan

    if devices:
        try:
            stats = devices[0].memory_stats() or {}
            limit = stats.get("bytes_limit")
            in_use = stats.get("bytes_in_use", 0)
            if limit:
                ok(f"HBM: {limit / 2**30:.1f} GB "
                   f"({in_use / 2**30:.2f} GB in use)")
            else:
                warn("device reports no memory limit (CPU backend?)")
        except Exception as e:  # noqa: BLE001 — diagnostic must not die
            warn(f"memory_stats unavailable: {e}")
    tier = get_tier_config()
    ok(f"tier: {tier.name} (hbm>={tier.hbm_gb:g} GB)")
    print(f"       max duration {tier.max_duration_s}s, max batch "
          f"{tier.max_batch}, VAE decode chunk {tier.decode_chunk}")
    if tier.lm_size:
        plan = lm_fallback_plan(tier)
        print(f"       LM planner: {tier.lm_size} "
              f"(quant={tier.lm_quantization or 'bf16'}); "
              f"fallback ladder: {plan}")
    else:
        print("       LM planner: disabled at this tier "
              "(thinking/sample/format modes unavailable)")
    if tier.notes:
        print(f"       note: {tier.notes}")
    if os.environ.get("ACESTEP_MAX_HBM_GB"):
        warn(f"ACESTEP_MAX_HBM_GB={os.environ['ACESTEP_MAX_HBM_GB']} "
             "overrides detection (tier simulation)")


def check_compile_cache() -> None:
    section("Persistent XLA compile cache")
    if os.environ.get("ACESTEP_NO_COMP_CACHE"):
        warn("ACESTEP_NO_COMP_CACHE set: every process pays full compiles "
             "(1-3 min per new shape on the tunneled backend)")
        return
    import jax

    path = jax.config.jax_compilation_cache_dir
    if not path:
        warn("compile cache not configured (importing acestep_tpu sets it)")
        return
    entries = 0
    if os.path.isdir(path):
        entries = len(os.listdir(path))
    ok(f"cache dir {path} ({entries} entries)")


def check_checkpoints() -> None:
    section("Checkpoint resolution")
    from acestep_tpu.utils.downloads import (REPO_IDS, has_egress,
                                             resolve_local)

    any_found = False
    for name in sorted(REPO_IDS):
        path = resolve_local(name)
        if path:
            ok(f"{name}: {path}")
            any_found = True
        else:
            print(f"       {name}: not present locally")
    if not any_found:
        egress = has_egress()
        if egress:
            warn("no checkpoints found — `acestep-tpu-download` fetches "
                 "them (HF/ModelScope reachable)")
        else:
            warn("no checkpoints found and no hub reachable — random "
                 "weights will be used (geometry/perf work only)")


def check_env() -> None:
    section("ACESTEP_* environment")
    keys = sorted(k for k in os.environ if k.startswith("ACESTEP_"))
    if not keys:
        print("       (none set — defaults active; see .env.example)")
    for k in keys:
        val = os.environ[k]
        shown = val if "KEY" not in k else val[:6] + "..."
        print(f"       {k}={shown}")
    for k in ("PORT", "SERVER_NAME"):
        if os.environ.get(k):
            print(f"       {k}={os.environ[k]}")


def check_smoke(devices: list) -> None:
    section("On-device smoke test")
    if not devices:
        fail("no devices — smoke test skipped")
        return
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def step(x):
        # chain x16 so the measurement isn't pure tunnel RTT
        def body(h, _):
            return jnp.tanh(h @ h), None
        h, _ = jax.lax.scan(body, x, None, length=16)
        return h

    x = jnp.ones((512, 512), jnp.bfloat16)
    t0 = time.time()
    np.asarray(step(x))
    compile_s = time.time() - t0
    t0 = time.time()
    np.asarray(step(x))
    run_s = time.time() - t0
    ok(f"16x bf16 512^2 matmul chain: compile+run {compile_s:.1f}s, "
       f"warm {run_s * 1000:.0f} ms (includes transfer RTT)")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (skip TPU detection)")
    parser.add_argument("--smoke", action="store_true",
                        help="run a tiny on-device matmul chain")
    args = parser.parse_args(argv)

    check_install()
    devices = check_devices(args.cpu)
    check_tier(devices)
    check_compile_cache()
    check_checkpoints()
    check_env()
    if args.smoke:
        check_smoke(devices)

    section("Summary")
    if _FAILURES:
        print(f"[RESULT] {len(_FAILURES)} check(s) FAILED:")
        for f in _FAILURES:
            print(f"  - {f}")
        return 1
    print("[RESULT] environment looks good")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
