"""Per-stage device-memory (HBM) profiler.

Reference counterpart: scripts/profile_vram.py (per-stage CUDA VRAM
peaks). TPU version: reads `device.memory_stats()` around each stage of
the service path — init, condition+diffusion, tiled VAE decode — across a
duration/batch matrix, and reports peaks in GB. Where the platform
exposes no memory stats (e.g. some tunneled devices), it falls back to
analytic estimates from array sizes so the tier table can still be
sanity-checked.

Usage:
  python scripts/profile_hbm.py --durations 10,60 --batches 1,4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_hbm_stats():
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


def gb(n):
    return round(n / (1 << 30), 3)


def analytic_estimate(handler, duration: float, batch: int) -> dict:
    """Rough HBM model when memory_stats is unavailable: params + KV-free
    activations of the widest stage (decode windows + latents)."""
    p_bytes = sum(np.prod(x.shape) * x.dtype.itemsize
                  for x in __import__("jax").tree.leaves(handler.params))
    v_bytes = sum(np.prod(x.shape) * x.dtype.itemsize
                  for x in __import__("jax").tree.leaves(handler.vae_params))
    T = int(duration * 25)
    chunk, groups = handler._decode_plan(T)
    # decode activation ~ groups * chunk frames * hop samples * 2ch * widest
    # intermediate channel multiple (dtype bytes)
    act = groups * chunk * handler.vae_cfg.hop_length * 2 * 4
    latents = batch * T * handler.cfg.audio_acoustic_hidden_dim * 4
    return {"params_gb": gb(p_bytes + v_bytes),
            "decode_act_est_gb": gb(act),
            "latents_gb": gb(latents)}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--durations", default="10,60")
    parser.add_argument("--batches", default="1")
    parser.add_argument("--steps", type=int, default=8)
    args = parser.parse_args()

    from acestep_tpu.pipeline.handler import AceStepHandler

    rows = []
    base = device_hbm_stats()
    handler = AceStepHandler()
    handler.initialize_service(seed=0)
    after_init = device_hbm_stats()
    print("init:", json.dumps({
        "before": {k: gb(v) for k, v in base.items()} if base else None,
        "after": {k: gb(v) for k, v in after_init.items()}
        if after_init else None}), file=sys.stderr)

    for duration in [float(d) for d in args.durations.split(",")]:
        for batch in [int(b) for b in args.batches.split(",")]:
            r = handler.generate_music(
                ["hbm probe"] * batch, ["[inst]"] * batch,
                audio_duration=duration, batch_size=batch,
                seeds=list(range(batch)), infer_steps=args.steps)
            np.asarray(r.audios[0][:8])
            stats = device_hbm_stats()
            row = {"duration_s": duration, "batch": batch}
            if stats:
                row.update({"peak_gb": gb(stats["peak_bytes_in_use"]),
                            "in_use_gb": gb(stats["bytes_in_use"]),
                            "limit_gb": gb(stats["bytes_limit"])})
            else:
                row.update(analytic_estimate(handler, duration, batch))
                row["note"] = "memory_stats unavailable; analytic estimate"
            rows.append(row)
            print(json.dumps(row), file=sys.stderr)

    print(json.dumps({"stages": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
