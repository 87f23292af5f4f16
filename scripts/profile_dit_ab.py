"""On-chip A/B of the DiT denoising loop: scan vs unrolled layer stack,
dense vs flash attention, with a per-stage wall breakdown.

Drives the 8-step turbo trajectory (the bench headline's diffusion stage)
at 60 s / 600 s geometry, batch 1, bf16, random weights — throughput is
weight-independent. Timing discipline per the axon tunnel: one jitted
program per trajectory, np.asarray on a tiny slice as the only real
barrier, median of N.

Usage (real TPU):  python scripts/profile_dit_ab.py [--trace]
  --trace additionally writes a jax.profiler trace for the fastest
  variant to /tmp/dit_trace (inspect op-level MFU offline).
"""

from __future__ import annotations

import dataclasses
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from acestep_tpu.config import DiTConfig
from acestep_tpu.models.dit import init_dit_params, prepare_condition
from acestep_tpu.models.sampler import (
    ConditionSet, build_turbo_schedule, sample_turbo,
)

TEXT_LEN, LYRIC_LEN, B = 64, 512, 1


def build(cfg: DiTConfig, T: int):
    dtype = jnp.bfloat16

    @jax.jit
    def setup(key):
        cast = lambda tree: jax.tree.map(lambda x: x.astype(dtype), tree)
        ks = jax.random.split(key, 8)
        params = cast(init_dit_params(ks[4], cfg))
        inputs = dict(
            text_hidden_states=jax.random.normal(
                ks[0], (B, TEXT_LEN, cfg.text_hidden_dim), dtype),
            text_attention_mask=jnp.ones((B, TEXT_LEN), jnp.int32),
            lyric_hidden_states=jax.random.normal(
                ks[1], (B, LYRIC_LEN, cfg.text_hidden_dim), dtype),
            lyric_attention_mask=jnp.ones((B, LYRIC_LEN), jnp.int32),
            refer_audio_packed=jax.random.normal(
                ks[2], (B, 2 * cfg.pool_window_size, cfg.timbre_hidden_dim),
                dtype),
            refer_order_mask=jnp.arange(B, dtype=jnp.int32),
            src_latents=jnp.zeros((B, T, cfg.audio_acoustic_hidden_dim),
                                  dtype),
            chunk_masks=jnp.ones((B, T, cfg.audio_acoustic_hidden_dim),
                                 dtype),
            is_covers=jnp.zeros((B,), jnp.int32),
        )
        x_init = jax.random.normal(ks[3],
                                   (B, T, cfg.audio_acoustic_hidden_dim),
                                   dtype)
        return params, inputs, x_init

    params, inputs, x_init = setup(jax.random.PRNGKey(0))
    jax.block_until_ready(params["decoder"]["proj_in"])
    schedule = tuple(build_turbo_schedule(shift=3.0))

    def traj(params, inputs, x_init):
        enc, _m, ctx = prepare_condition(params, cfg, **inputs)
        cond = ConditionSet.build(params, cfg, enc, ctx)
        return sample_turbo(params, cfg, x_init=x_init, schedule=schedule,
                            cond=cond)

    return jax.jit(traj), params, inputs, x_init


def run(tag: str, cfg: DiTConfig, T: int, repeats: int = 5) -> float:
    fn, params, inputs, x_init = build(cfg, T)
    t0 = time.perf_counter()
    out = fn(params, inputs, x_init)
    np.asarray(out[0, :4, 0])
    compile_s = time.perf_counter() - t0
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(params, inputs, x_init)
        np.asarray(out[0, :4, 0])
        walls.append(time.perf_counter() - t0)
    med = statistics.median(walls)
    print(f"{tag:34s} T={T:5d} compile={compile_s:6.1f}s "
          f"median={med:7.4f}s spread=[{min(walls):.4f},{max(walls):.4f}]",
          flush=True)
    return med


def main():
    import gc

    from acestep_tpu.models.dit import resolve_attention_impl

    print("devices:", jax.devices(), flush=True)
    base = DiTConfig()
    results = {}
    # --geo 60|600 limits to one geometry (8 variants of compile time blow
    # typical driver/CI timeouts; one geometry is 4)
    geos = ((1500, "60s"), (15000, "600s"))
    if "--geo" in sys.argv:
        want = sys.argv[sys.argv.index("--geo") + 1]
        geos = tuple(g for g in geos if g[1].startswith(want))
    for T, label in geos:
        L = -(-T // base.patch_size)
        auto = resolve_attention_impl(base, seq_len=L)
        print(f"{label}: impl='auto' resolves to {auto!r}", flush=True)
        for unroll in (False, True):
            for impl in ("dense", "flash"):
                cfg = dataclasses.replace(base, unroll_layers=unroll,
                                          attention_impl=impl)
                tag = f"{label} unroll={int(unroll)} impl={impl}"
                try:
                    results[tag] = run(tag, cfg, T)
                except Exception as e:  # noqa: BLE001 - report and move on
                    print(f"{tag}: FAILED {e!r}", flush=True)
                    # free the dead variant's buffers/compiled programs or
                    # an OOM here cascades into the remaining variants
                    gc.collect()
                    try:
                        jax.clear_caches()
                    except Exception:
                        pass
                    gc.collect()
    if not results:
        print("\nall variants failed", flush=True)
        return
    best = min(results, key=results.get)
    print(f"\nbest: {best} = {results[best]:.4f}s", flush=True)

    if "--trace" in sys.argv:
        label, rest = best.split(" ", 1)
        T = 1500 if label == "60s" else 15000
        unroll = "unroll=1" in best
        impl = best.rsplit("impl=", 1)[1]
        cfg = dataclasses.replace(base, unroll_layers=unroll,
                                  attention_impl=impl)
        fn, params, inputs, x_init = build(cfg, T)
        np.asarray(fn(params, inputs, x_init)[0, :4, 0])   # warm
        with jax.profiler.trace("/tmp/dit_trace"):
            np.asarray(fn(params, inputs, x_init)[0, :4, 0])
        print("trace written to /tmp/dit_trace", flush=True)


if __name__ == "__main__":
    main()
