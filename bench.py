"""Benchmark: headline seconds-per-song + the full configuration matrix.

Headline (the driver metric): condition encode -> 8-step turbo DiT ->
tiled Oobleck VAE decode for one 60 s 48 kHz stereo song, bf16 (matches
the reference's "< 2 s full-song on A100" headline,
/root/reference/README.md:29,52).

The matrix (reference docs/en/BENCHMARK.md:117-125 table): thinking
on/off x batch 1/8 x 60/600 s through the REAL service stack
(AceStepHandler + LLMHandler facade), with per-stage decomposition
(LM / diffusion / VAE) and analytic DiT MFU per diffusion row. Random
weights — no released checkpoints in this image; throughput is
weight-independent. The `lm1.7B_*`/`lm4B_*` rows instantiate the REAL
Qwen3 geometries and measure actual planner latency.

Wall budget: the whole process targets ACESTEP_BENCH_BUDGET_S seconds
(default 960 — the driver kills the run hard at its own timeout, and a
timeout loses every row). Sections run REQUIRED-first; a section that
does not fit the remaining budget (including the lazy init of any
handler/LM dependency it would have to build) is skipped with an
explicit `skipped (budget)` row so truncation is visible, not silent.

stdout contract: ONE SMALL JSON line
  {"metric": "seconds_per_song", "value": W, "unit": "s",
   "vs_baseline": baseline/W, "extra": {...small...}}
printed TWICE — immediately after the headline measurement (so a later
hard kill still leaves a parseable line as the last stdout line; all
progress logging goes to stderr) and again, updated, at exit. The full
matrix goes to BENCH_MATRIX.json (BENCH_MATRIX_starved.json when a
backend-init block starved the capture below 6 rows) and docs/BENCHMARK.md
(`--write-docs`) — round 3 showed a multi-KB single-line JSON on stdout
can fail the driver's parser even at rc=0.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.models.dit import init_dit_params, prepare_condition
from acestep_tpu.models.sampler import ConditionSet, build_turbo_schedule, sample_turbo
from acestep_tpu.models.vae import init_vae_params
from acestep_tpu.models.vae_tiled import tiled_decode

BASELINE_SECONDS = 2.0   # reference: < 2 s per full song on A100
DURATION_S = 60
BATCH = 1
TEXT_LEN = 64
LYRIC_LEN = 512

_T_START = time.perf_counter()
# Calibration: round-3 (similar matrix, no base50/4B) PASSED the driver
# timeout; round-4 (+base50/4B/full repeats) died at rc=124 after ~15+ min
# of rows — the timeout is ~20 min. 960 s leaves ~4 min of overshoot
# allowance for a section that outruns its estimate.
BUDGET_S = float(os.environ.get("ACESTEP_BENCH_BUDGET_S", "960"))
# safety margin: a section is only started if its estimate fits inside
# (budget - margin); estimates are rough, the margin absorbs overruns
MARGIN_S = 30.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def remaining() -> float:
    return BUDGET_S - MARGIN_S - (time.perf_counter() - _T_START)


def _stats(walls):
    """(median, [min, max]) — rows report the MEDIAN with spread so the
    published numbers are reproducible under the tunnel's 2-4x
    device->host bandwidth swings (VERDICT r2 weak #1), not a lucky best."""
    return (round(statistics.median(walls), 3),
            [round(min(walls), 3), round(max(walls), 3)])


def _median_run(walls):
    """(wall, spread, idx) where idx is the run whose wall IS the reported
    median (lower median for even counts) — stage costs must come from the
    SAME run as the reported wall, or the columns can sum past it."""
    order = sorted(range(len(walls)), key=walls.__getitem__)
    idx = order[(len(walls) - 1) // 2]
    return (round(walls[idx], 3),
            [round(min(walls), 3), round(max(walls), 3)], idx)


# ---------------------------------------------------------------- MFU

def peak_tflops(dtype: str = "bf16") -> float:
    """Per-chip peak for the MFU column. v5e: 197 bf16 / 394 int8 TFLOP/s
    (public spec). Unknown chips fall back to the v5e figure so the
    column is still comparable round to round."""
    kind = ""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        pass
    table = {
        "v5 lite": 197.0, "v5e": 197.0, "v5litepod": 197.0,
        "v4": 275.0, "v5p": 459.0, "v6 lite": 918.0, "v6e": 918.0,
    }
    base = next((v for k, v in table.items() if k in kind), 197.0)
    return base * (2.0 if dtype == "int8" else 1.0)


def dit_flops(cfg: DiTConfig, frames: int, cond_len: int, steps: int,
              batch: int, cfg_steps: int = 0) -> float:
    """Analytic forward FLOPs of the DiT decoder trajectory (2*MACs).

    Counts the decoder only (projections, attention, MLP, patchify) —
    the condition encoder runs once per request and is excluded, so the
    MFU column measures the diffusion hot loop it is printed next to.
    `cfg_steps` of the `steps` run with a doubled (CFG) batch.
    """
    L = -(-frames // cfg.patch_size)                     # patches
    h = cfg.hidden_size
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    inter = cfg.intermediate_size
    n_layers = cfg.num_hidden_layers
    window = getattr(cfg, "sliding_window", 128) or 128

    per_layer = 0.0
    for i in range(n_layers):
        try:
            sliding = cfg.layer_is_sliding(i)
        except Exception:
            sliding = (i % 2 == 0) if n_layers > 1 else False
        kv_span = min(L, window if sliding else L)
        # self-attn: QKVO projections + QK^T + AV
        per_layer_i = 2 * L * (h * qd + 2 * h * kvd + qd * h)
        per_layer_i += 2 * 2 * L * kv_span * qd
        # cross-attn: Q,O every step (KV cached once per trajectory)
        per_layer_i += 2 * L * (h * qd + qd * h)
        per_layer_i += 2 * 2 * L * cond_len * qd
        # SwiGLU MLP: gate+up+down
        per_layer_i += 2 * L * h * inter * 3
        per_layer += per_layer_i
    # patchify in (192ch*patch -> h) + de-patchify out (h -> 64*patch)
    io = 2 * L * (3 * cfg.audio_acoustic_hidden_dim * cfg.patch_size * h) \
        + 2 * L * (h * cfg.audio_acoustic_hidden_dim * cfg.patch_size)
    per_fwd = per_layer + io
    # cross-KV projection, once per trajectory
    kv_once = n_layers * 2 * cond_len * (2 * h * kvd)
    eff_steps = steps + cfg_steps                        # CFG doubles batch
    return batch * (per_fwd * eff_steps + kv_once)


def _mfu_fields(cfg: DiTConfig, frames: int, cond_len: int, steps: int,
                batch: int, diffusion_s: float, cfg_steps: int = 0,
                dtype: str = "bf16") -> dict:
    if not diffusion_s or diffusion_s <= 0:
        return {}
    fl = dit_flops(cfg, frames, cond_len, steps, batch, cfg_steps)
    tf = fl / diffusion_s / 1e12
    return {"dit_tflops": round(fl / 1e12, 2),
            "dit_tflops_s": round(tf, 1),
            "mfu_pct": round(100.0 * tf / peak_tflops(dtype), 1)}


# ------------------------------------------------------------- stages

def probe_bandwidth(wall_bound_s: float = 25.0) -> dict:
    """Device->host transfer probe: contextualizes the transfer-bound
    rows — a 600 s song's audio is ~115 MB on the int16 wire, so its VAE
    stage wall tracks this number, which swings run to run on a tunneled
    TPU. Escalating sizes (1 -> 8 -> 32 MiB) under a wall bound: the
    tunnel has been observed in sub-0.2 MB/s windows where a single
    32 MiB fetch blocks for minutes (an in-flight fetch cannot be
    interrupted, so the only safe move is to never issue a big one until
    a small one proved the link fast). A slow window yields a slow-but-
    finite probe instead of eating the whole driver budget."""
    import numpy as np

    t_start = time.perf_counter()
    rates = []
    probed_mib = 0.0
    for mib in (1, 8, 32, 32):
        n = int(mib * 1024 * 1024 // 2)
        x = jnp.full((n,), len(rates) + 1, jnp.int16)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        np.asarray(x)
        dt = time.perf_counter() - t0
        rates.append(mib / max(dt, 1e-6))
        probed_mib = float(mib)
        elapsed = time.perf_counter() - t_start
        # escalate only while the link looks fast enough that the NEXT
        # (bigger) fetch also fits the bound
        if elapsed > wall_bound_s or rates[-1] < 4.0:
            break
    med, spread = _stats(rates)
    return {"d2h_MBps": med, "d2h_MBps_spread": spread,
            "d2h_probe_mib": probed_mib}


def headline():
    """Kernel-level 60 s song (cond encode + 8-step DiT + tiled VAE)."""
    cfg = DiTConfig()
    vae_cfg = VAEConfig()
    dtype = jnp.bfloat16
    T = DURATION_S * 25                      # 25 Hz latent frames

    # All setup in ONE jitted program: eager per-leaf init is hundreds of
    # tiny dispatches (minutes over a tunneled TPU).
    @jax.jit
    def setup(key):
        cast = lambda tree: jax.tree.map(lambda x: x.astype(dtype), tree)
        ks = jax.random.split(key, 8)
        params = cast(init_dit_params(ks[4], cfg))
        vae_params = cast(init_vae_params(ks[5], vae_cfg))
        batch_inputs = dict(
            text_hidden_states=jax.random.normal(ks[0], (BATCH, TEXT_LEN, cfg.text_hidden_dim), dtype),
            text_attention_mask=jnp.ones((BATCH, TEXT_LEN), jnp.int32),
            lyric_hidden_states=jax.random.normal(ks[1], (BATCH, LYRIC_LEN, cfg.text_hidden_dim), dtype),
            lyric_attention_mask=jnp.ones((BATCH, LYRIC_LEN), jnp.int32),
            refer_audio_packed=jax.random.normal(ks[2], (BATCH, 2 * cfg.pool_window_size, cfg.timbre_hidden_dim), dtype),
            refer_order_mask=jnp.arange(BATCH, dtype=jnp.int32),
            src_latents=jnp.zeros((BATCH, T, cfg.audio_acoustic_hidden_dim), dtype),
            chunk_masks=jnp.ones((BATCH, T, cfg.audio_acoustic_hidden_dim), dtype),
            is_covers=jnp.zeros((BATCH,), jnp.int32),
        )
        x_init = jax.random.normal(ks[3], (BATCH, T, cfg.audio_acoustic_hidden_dim), dtype)
        return params, vae_params, batch_inputs, x_init

    t0 = time.perf_counter()
    params, vae_params, batch_inputs, x_init = setup(jax.random.PRNGKey(0))
    jax.block_until_ready(params["decoder"]["proj_in"])
    log(f"setup: {time.perf_counter() - t0:.1f}s")
    schedule = tuple(build_turbo_schedule(shift=3.0))

    @jax.jit
    def generate(params, vae_params, inputs, x_init):
        enc, _mask, ctx = prepare_condition(params, cfg, **inputs)
        cond = ConditionSet.build(params, cfg, enc, ctx)
        x0 = sample_turbo(params, cfg, x_init=x_init, schedule=schedule, cond=cond)
        audio = tiled_decode(vae_params, vae_cfg, x0)
        return audio

    import numpy as np

    log(f"devices: {jax.devices()}")
    log("compiling headline…")
    t0 = time.perf_counter()
    audio = generate(params, vae_params, batch_inputs, x_init)
    np.asarray(audio[0, :8, 0])  # axon tunnel: block_until_ready is async
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s; audio {audio.shape}")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        audio = generate(params, vae_params, batch_inputs, x_init)
        np.asarray(audio[0, :8, 0])
        times.append(time.perf_counter() - t0)
        log(f"headline run {i}: {times[-1]:.3f}s")
    wall, spread = _stats(times)
    # headline MFU: the fused program's wall covers cond-enc + 8-step DiT +
    # VAE; DiT dominates FLOPs, so this is a lower bound on DiT MFU
    mfu = _mfu_fields(cfg, T, TEXT_LEN + LYRIC_LEN + 1, 8, BATCH, wall)
    return wall, spread, mfu


# ------------------------------------------------------------- matrix

def matrix(rows: list, truncated: list) -> None:
    """Service-stack matrix, REQUIRED-sections-first under the budget."""
    import contextlib
    import gc

    import numpy as np

    from acestep_tpu import inference
    from acestep_tpu.config import LMConfig
    from acestep_tpu.inference import GenerationConfig, GenerationParams
    from acestep_tpu.llm.handler import LLMHandler
    from acestep_tpu.llm.tokenizer import SimpleTokenizer
    from acestep_tpu.pipeline.handler import AceStepHandler

    state: dict = {}            # live handlers, built lazily per section
    oom_hit: list = []          # post-OOM circuit breaker (see section())

    # lazy-dependency surcharge: a section whose handler/LM is not built
    # yet pays its init+compile inside the section, so the gate must price
    # it in (r5 observed: a 25 s prefill row took 61 s because the skipped
    # preceding section would have built the 1.7B engine)
    DEP_COST = {"handler": 45, "llm": 20, "llm17": 80, "llm17q": 70}

    # Mandatory sections keep a budget RESERVE: an optional (tail) section
    # only runs if the remaining budget covers BOTH it and every mandatory
    # section still outstanding — tails run EARLY (while their residents
    # are live, and before the memory-risky base/quantized/4B block, r5's
    # OOM-cascade lesson) without being able to starve the required rows.
    MANDATORY = {
        "60s_b1": 40, "30s_b8": 35, "10s_b1_think": 25,
        "lm1.7B_think60s_b1": 35, "lm1.7B_prefill2048_cfg": 25,
        "lm1.7B_prefix_reuse": 20, "30s_b1_think_lm1.7B": 45,
        "lm1.7B_codes300_w8a8": 90, "base50_60s_b1": 110,
        "lm4B": 300,
    }
    reserve_left = dict(MANDATORY)

    # Slow-tunnel detector: estimates are calibrated on a ~30-40 MB/s d2h
    # window, but the tunnel swings 4-45 MB/s MID-run (r5: 600s_b1 took
    # 184 s against a 95 s estimate and starved the mandatory base50 row).
    # Track the worst actual/estimate overrun among substantial completed
    # sections and inflate every later gate (est and reserve) by it — a
    # fast run is unaffected, a slow run sheds optional tails early.
    overrun = [1.0]

    @contextlib.contextmanager
    def section(name, est_s, deps=(), tail=False):
        """Budget gate + fail-soft guard: a section that does not fit the
        remaining budget is skipped visibly; a broken row must not kill
        the whole matrix (the driver records whatever rows completed)."""
        t_sec = time.perf_counter()
        reserve_left.pop(name, None)
        if oom_hit:
            # after a device OOM the axon backend reports RESOURCE_EXHAUSTED
            # for every later allocation no matter what the client frees —
            # and continuing to hammer it with allocation attempts has
            # wedged the whole backend before (r4). Stop allocating; record
            # the skip so truncation is visible.
            log(f"SECTION {name} skipped (post-OOM)")
            truncated.append(name)
            rows.append({"config": name, "skipped": "post-OOM"})
            yield False
            return
        est_s = est_s + sum(DEP_COST[d] for d in deps if d not in state)
        # the slow-tunnel factor gates TAILS only: a mandatory section is
        # always worth attempting at its nominal estimate — shedding
        # optional work is how the budget absorbs a slow tunnel
        factor = max(overrun) if tail else 1.0
        need = (est_s + sum(reserve_left.values())) * factor if tail else est_s
        if remaining() < need:
            log(f"SECTION {name} skipped (budget): need ~{need:.0f}s"
                f"{' incl. mandatory reserve' if tail else ''}"
                f"{f' (x{factor:.2f} slow-tunnel)' if factor > 1 else ''}, "
                f"have {remaining():.0f}s")
            truncated.append(name)
            rows.append({"config": name, "skipped": "budget"})
            yield False
            return
        failed = False
        try:
            yield True
        except Exception as e:       # pragma: no cover - defensive
            log(f"SECTION {name} FAILED: {e!r}")
            rows.append({"config": name, "error": repr(e)[:300]})
            failed = True
            from acestep_tpu.utils.memory import is_oom_error
            if is_oom_error(e):
                oom_hit.append(name)
        elapsed = time.perf_counter() - t_sec
        if not failed and elapsed >= 30 and elapsed > est_s:
            overrun.append(elapsed / est_s)
            log(f"slow-tunnel factor now x{max(overrun):.2f} "
                f"({name}: {elapsed:.0f}s vs {est_s:.0f}s est)")
        log(f"section {name}: {elapsed:.1f}s elapsed, "
            f"{remaining():.0f}s budget left")
        if failed:
            # drop dead handlers and every compiled program that captured
            # their buffers (on OOM, residents themselves may be why the
            # chip is full — clear them all; nothing later runs anyway)
            if oom_hit:
                state.clear()
            from acestep_tpu.utils.memory import release_device_memory
            release_device_memory()
            if oom_hit:
                # self-heal probe: if a fresh 256 MB alloc materializes
                # after the release, the backend survived the OOM and
                # later sections (which rebuild their own residents) can
                # still run — clear the breaker instead of skipping the
                # rest of the matrix on a stale assumption.
                try:
                    z = jax.block_until_ready(
                        jnp.zeros((128, 1024, 1024), jnp.int16))
                    del z
                    log(f"post-OOM probe passed after {name}; continuing")
                    oom_hit.clear()
                except Exception as pe:     # noqa: BLE001 - diagnostic
                    log(f"post-OOM probe failed ({pe!r}); "
                        f"skipping remaining sections")

    # lazy builders ---------------------------------------------------

    def turbo_handler():
        if "handler" not in state:
            h = AceStepHandler()
            h.initialize_service(seed=0)
            state["handler"] = h
        return state["handler"]

    def tiny_llm():
        if "llm" not in state:
            l = LLMHandler()
            l.initialize(num_fallback_codes=64, max_duration=600, seed=0)
            state["llm"] = l
        return state["llm"]

    def tok17():
        if "tok17" not in state:
            state["tok17"] = SimpleTokenizer(num_audio_codes=64_000)
        return state["tok17"]

    def llm17():
        if "llm17" not in state:
            l = LLMHandler(dtype=jnp.bfloat16)
            # kv_quant: int8 KV cache — halves the per-step cache reads
            # that dominate decode beyond ~3k context
            l.initialize(cfg=LMConfig.qwen3_1_7b(), tokenizer=tok17(),
                         max_duration=600, seed=0, kv_quant=True)
            if not l.initialized:
                raise RuntimeError("lm1.7B init failed")
            state["llm17"] = l
        return state["llm17"]

    def drop(*names, hard=False):
        for n in names:
            state.pop(n, None)
        gc.collect()
        if hard:
            # also evict jax's compiled-executable caches: executables
            # capture closed-over device constants (rope tables, FSM
            # tables, cross-KV precomputes) that gc alone never frees —
            # the r5 lm4B OOM was dead cache from 5 earlier services.
            # Only safe when no resident still needs its programs (the
            # persistent compile cache makes any recompile a disk hit).
            from acestep_tpu.utils.memory import release_device_memory
            release_device_memory()

    # row runners -----------------------------------------------------

    def run_dit(tag, duration, batch, repeats=3, steps=8):
        handler = turbo_handler()
        kw = dict(audio_duration=float(duration), batch_size=batch,
                  seeds=list(range(batch)), infer_steps=steps)
        handler.generate_music(["bench"] * batch, ["[inst]"] * batch, **kw)
        walls, runs = [], []
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = handler.generate_music(["bench"] * batch,
                                       ["[inst]"] * batch, **kw)
            np.asarray(r.audios[0][:8])
            walls.append(time.perf_counter() - t0)
            runs.append(r.time_costs)
        wall, spread, mid = _median_run(walls)
        costs = runs[mid]
        diff_s = round(costs.get("diffusion_time_cost", 0), 3)
        rows.append({
            "config": tag, "duration_s": duration, "batch": batch,
            "thinking": False, "wall_s": wall, "wall_spread": spread,
            "seconds_per_song": round(wall / batch, 3),
            "rtf": round(duration * batch / wall, 1),
            "prep_s": round(costs.get("prepare_time_cost", 0)
                            + costs.get("text_encode_time_cost", 0), 3),
            "svc_total_s": round(costs.get("total_time_cost", 0), 3),
            "diffusion_s": diff_s,
            "vae_s": round(costs.get("vae_decode_time_cost", 0), 3),
            **_mfu_fields(DiTConfig(), int(duration * 25), 577, steps,
                          batch, diff_s),
        })
        log(f"matrix {tag}: {rows[-1]}")

    def run_think(tag, duration, batch, repeats=2, llm_handler=None,
                  lm_geom=None, dit_handler=None):
        llm_ = llm_handler if llm_handler is not None else tiny_llm()
        dit_ = dit_handler if dit_handler is not None else turbo_handler()
        params = GenerationParams(caption="an upbeat synth track",
                                  lyrics="[inst]", thinking=True,
                                  duration=float(duration), seed=7)
        config = GenerationConfig(batch_size=batch,
                                  output_dir="/tmp/bench_out",
                                  allow_lm_batch=True,
                                  use_random_seed=False,
                                  audio_format="wav")  # measure generation,
        # not the (now-default) flac encode
        inference.generate_music(dit_, llm_, params, config)  # warm
        walls, runs = [], []
        for _ in range(repeats):
            t0 = time.perf_counter()
            result = inference.generate_music(dit_, llm_, params, config)
            walls.append(time.perf_counter() - t0)
            assert result.success, result.error
            runs.append(result.extra_outputs.get("time_costs", {}))
        wall, spread, mid = _median_run(walls)
        costs = runs[mid]
        diff_s = round(costs.get("diffusion_time_cost", 0), 3)
        row = {
            "config": tag, "duration_s": duration, "batch": batch,
            "thinking": True, "wall_s": wall, "wall_spread": spread,
            "seconds_per_song": round(wall / batch, 3),
            "rtf": round(duration * batch / wall, 1),
            "lm_s": round(costs.get("lm_time_cost", 0), 3),
            "diffusion_s": diff_s,
            "vae_s": round(costs.get("vae_decode_time_cost", 0), 3),
            **_mfu_fields(DiTConfig(), int(duration * 25), 577, 8,
                          batch, diff_s),
        }
        if lm_geom:
            row["lm_geom"] = lm_geom
        rows.append(row)
        log(f"matrix {tag}: {rows[-1]}")

    def run_lm_only(tag, *, target_duration, batch, repeats=3):
        """LM-only two-phase wall (CFG-paired, constrained CoT + codes)."""
        l = llm17()
        kw = dict(temperature=0.85, cfg_scale=2.0, top_p=0.9,
                  target_duration=target_duration,
                  user_metadata={"duration": target_duration})
        n_codes = int(target_duration * 5)
        if batch == 1:
            l.generate_with_stop_condition("bench lm", seed=0, **kw)
        else:
            l.plan_batch("bench lm", n=batch, seed=0, **kw)
        walls, toks_runs = [], []
        for i in range(repeats):
            t0 = time.perf_counter()
            if batch == 1:
                rs = [l.generate_with_stop_condition("bench lm",
                                                     seed=1 + i, **kw)]
            else:
                rs = l.plan_batch("bench lm", n=batch, seed=1 + i, **kw)
            walls.append(time.perf_counter() - t0)
            # TOTAL decoded tokens across the batch (short rows stop early
            # and feed pads — crediting every row with the longest row's
            # CoT length would overstate published throughput)
            cot_total = sum(len(l.tokenizer.encode(r["cot_text"]))
                            for r in rs)
            toks_runs.append(cot_total + n_codes * batch)
        wall, spread, mid = _median_run(walls)
        toks = toks_runs[mid]
        rows.append({
            "config": tag, "lm_geom": "1.7B", "batch": batch,
            "thinking": True, "duration_s": target_duration,
            "wall_s": wall, "wall_spread": spread,
            "lm_tokens_per_seq": round(toks / batch, 1),
            "decode_tok_s": round(toks / wall, 1),
        })
        log(f"matrix {tag}: {rows[-1]}")

    def run_guided(tag, duration, steps, repeats=3):
        handler_b = state["handler_b"]
        kw = dict(audio_duration=float(duration), infer_steps=steps,
                  guidance_scale=7.0, use_adg=False)
        handler_b.generate_music("bench", "[inst]", seeds=1, **kw)  # warm
        walls, runs = [], []
        for i in range(repeats):
            t0 = time.perf_counter()
            r = handler_b.generate_music("bench", "[inst]", seeds=2 + i, **kw)
            np.asarray(r.audios[0][:8])
            walls.append(time.perf_counter() - t0)
            runs.append(r.time_costs)
        wall, spread, mid = _median_run(walls)
        costs = runs[mid]
        diff_s = round(costs.get("diffusion_time_cost", 0), 3)
        rows.append({
            "config": tag, "duration_s": duration, "batch": 1,
            "thinking": False, "wall_s": wall, "wall_spread": spread,
            "seconds_per_song": wall, "rtf": round(duration / wall, 1),
            "infer_steps": steps,
            "prep_s": round(costs.get("prepare_time_cost", 0)
                            + costs.get("text_encode_time_cost", 0), 3),
            "svc_total_s": round(costs.get("total_time_cost", 0), 3),
            "diffusion_s": diff_s,
            "vae_s": round(costs.get("vae_decode_time_cost", 0), 3),
            **_mfu_fields(DiTConfig.base(), int(duration * 25), 577, steps,
                          1, diff_s, cfg_steps=steps),
        })
        log(f"matrix {tag}: {rows[-1]}")

    # ---- REQUIRED sections ---------------------------------------------

    # the headline's DiT+VAE residents are dead locals by now, but their
    # compiled executables still pin device constants — drop them so the
    # 4B init below really does see a near-fresh chip (recompiles are
    # disk-cache hits)
    drop(hard=True)

    # 4B planner (VERDICT r4 item 5): Qwen3-4B geometry at w8a8 (tier_16g's
    # pinned mode) plus the int8 DiT+VAE service pairing on one chip.
    # FIRST by design: both r5 captures OOM'd this section when it ran
    # LAST, on a chip that had hosted six services' worth of alloc/free
    # history — with gc + jax.clear_caches done and jax.live_arrays()
    # empty, the init still died, i.e. the residue is backend allocator
    # state the client cannot release. The identical init on a near-fresh
    # chip completes in ~9 s (verified standalone). Everything after this
    # section rebuilds its own residents on a hard-dropped chip.
    def bench_lm4b():
        # nested function: on an exception every local (the 4B handler and
        # its caches) dies with the frame, freeing its HBM
        live = jax.live_arrays()
        log(f"pre-4B live arrays: {len(live)}, "
            f"{sum(a.nbytes for a in live) / (1 << 20):.0f} MB")
        del live
        llm4 = LLMHandler(dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        llm4.initialize(cfg=LMConfig.qwen3_4b(), tokenizer=tok17(),
                        max_duration=600, seed=0, quantization="w8a8")
        load4_s = time.perf_counter() - t0
        p4 = llm4.build_formatted_prompt_with_cot(
            "bench", "", "<think>\nduration: 60\n</think>")
        n4 = llm4.build_formatted_prompt_with_cot(
            "bench", "", "<think>\nduration: 60\n</think>",
            is_negative_prompt=True)
        qkw4 = dict(unconditional_prompts=[n4], cfg_scale=2.0,
                    temperature=0.85, top_p=0.9, n_codes=300)
        llm4.engine.generate_codes([p4], seed=0, **qkw4)        # warm
        walls4 = []
        for i in range(2):
            t0 = time.perf_counter()
            llm4.engine.generate_codes([p4], seed=1 + i, **qkw4)
            walls4.append(time.perf_counter() - t0)
        w4, s4, _ = _median_run(walls4)
        rows.append({
            "config": "lm4B_codes300_w8a8", "lm_geom": "4B", "batch": 1,
            "thinking": True, "wall_s": w4, "wall_spread": s4,
            "decode_tok_s": round(300 / w4, 1), "load_s": round(load4_s, 1),
        })
        log(f"matrix lm4B_codes300_w8a8: {rows[-1]}")
        # the reference's thinking example with the 4B planner, end to end
        # through the tier_16g service pairing (int8 DiT + w8a8 4B LM),
        # fail-soft: losing the pairing row must not lose the codes row
        hq = None
        if remaining() > 60:
            try:
                hq = AceStepHandler()
                hq.initialize_service(seed=0, quantization="w8a8")
                run_think("30s_b1_think_lm4B", 30, 1, repeats=2,
                          llm_handler=llm4, lm_geom="4B", dit_handler=hq)
            except Exception as e:   # noqa: BLE001 — row-level fail-soft
                log(f"row 30s_b1_think_lm4B FAILED: {e!r}")
                rows.append({"config": "30s_b1_think_lm4B",
                             "error": repr(e)[:300]})
        # quantized service row (w8a8: int8 x int8 MXU matmuls) measured
        # HERE, on the pairing handler that already exists — the r5 capture
        # that ran this as its own late section OOM'd re-initializing a
        # second w8a8 service on a chip carrying six services' worth of
        # backend allocator residue
        if hq is not None and remaining() > 90:
            try:
                hq.generate_music("bench", "[inst]", audio_duration=60.0,
                                  seeds=1, infer_steps=8)   # warm/compile
                walls, runs = [], []
                for i in range(3):
                    t0 = time.perf_counter()
                    r = hq.generate_music("bench", "[inst]",
                                          audio_duration=60.0,
                                          seeds=2 + i, infer_steps=8)
                    np.asarray(r.audios[0][:8])
                    walls.append(time.perf_counter() - t0)
                    runs.append(r.time_costs)
                wall, spread, mid = _median_run(walls)
                costs = runs[mid]
                diff_s = round(costs.get("diffusion_time_cost", 0), 3)
                rows.append({
                    "config": "60s_b1_w8a8", "duration_s": 60, "batch": 1,
                    "thinking": False, "wall_s": wall,
                    "wall_spread": spread, "seconds_per_song": wall,
                    "rtf": round(60 / wall, 1), "diffusion_s": diff_s,
                    "vae_s": round(costs.get("vae_decode_time_cost", 0), 3),
                    **_mfu_fields(DiTConfig(), 1500, 577, 8, 1, diff_s,
                                  dtype="int8"),
                })
                log(f"matrix 60s_b1_w8a8: {rows[-1]}")
            except Exception as e:   # noqa: BLE001 — row-level fail-soft
                log(f"row 60s_b1_w8a8 FAILED: {e!r}")
                rows.append({"config": "60s_b1_w8a8",
                             "error": repr(e)[:300]})
        del llm4, hq

    with section("lm4B", 300) as go:
        if go:
            retry = False
            try:
                bench_lm4b()
            except Exception as e:   # noqa: BLE001 — one-shot OOM retry
                from acestep_tpu.utils.memory import is_oom_error
                if not (is_oom_error(e) and remaining() > 120):
                    raise
                log(f"lm4B OOM ({e!r}); hard-releasing and retrying once")
                retry = True
            if retry:
                # outside the except block: the exception (whose traceback
                # pins the half-built 4B tree via frame locals) is dead
                from acestep_tpu.utils.memory import release_device_memory
                release_device_memory()
                bench_lm4b()
    # nothing survives the 4B section by construction — hand the rest of
    # the matrix a chip as close to fresh as the client can make it
    drop(hard=True)

    with section("60s_b1", 40, deps=("handler",)) as go:
        if go:
            run_dit("60s_b1", 60, 1, repeats=3)
    with section("30s_b8", 35, deps=("handler",)) as go:
        if go:
            run_dit("30s_b8", 30, 8, repeats=3)
    with section("10s_b1_think", 25, deps=("handler", "llm")) as go:
        if go:
            run_think("10s_b1_think", 10, 1, repeats=2)

    # real-geometry 1.7B planner (throughput is weight-independent)
    with section("lm1.7B_think60s_b1", 35, deps=("llm17",)) as go:
        if go:
            run_lm_only("lm1.7B_think60s_b1", target_duration=60, batch=1,
                        repeats=2)
    with section("lm1.7B_prefill2048_cfg", 25, deps=("llm17",)) as go:
        if go:
            l = llm17()
            prompt2k = "a" * 2048
            l.engine.generate_codes([prompt2k],
                                    unconditional_prompts=["b" * 2048],
                                    cfg_scale=2.0, n_codes=1, seed=0)  # warm
            t0 = time.perf_counter()
            l.engine.generate_codes([prompt2k],
                                    unconditional_prompts=["b" * 2048],
                                    cfg_scale=2.0, n_codes=1, seed=1)
            pf_wall = time.perf_counter() - t0
            rows.append({
                "config": "lm1.7B_prefill2048_cfg", "lm_geom": "1.7B",
                "batch": 1, "thinking": True, "wall_s": round(pf_wall, 3),
                "prefill_tok_s": round(2 * 2048 / pf_wall, 0),
            })
            log(f"matrix lm1.7B_prefill2048_cfg: {rows[-1]}")
    # cross-request prefix reuse (VERDICT r4 item 7): back-to-back jobs
    # share the chat-template prefix KV; report the measured reuse
    with section("lm1.7B_prefix_reuse", 20, deps=("llm17",)) as go:
        if go:
            l = llm17()
            st0 = dict(l.engine.prefill_stats)
            for i in range(3):
                l.generate_with_stop_condition(
                    f"prefix probe {i}", seed=20 + i, temperature=0.85,
                    cfg_scale=2.0, top_p=0.9, target_duration=10,
                    user_metadata={"duration": 10})
            st1 = l.engine.prefill_stats
            # prompt_tokens counts the FULL prompts (reused prefix + delta)
            prompt = st1["prompt_tokens"] - st0["prompt_tokens"]
            reused = st1["reused_tokens"] - st0["reused_tokens"]
            rows.append({
                "config": "lm1.7B_prefix_reuse", "lm_geom": "1.7B",
                "thinking": True,
                "prompt_tokens": int(prompt),
                "reused_tokens": int(reused),
                "lm_prefix_reuse_pct": round(
                    100.0 * reused / max(1, prompt), 1),
            })
            log(f"matrix lm1.7B_prefix_reuse: {rows[-1]}")
    # the reference's own thinking example: 30 s / b1 / 8 steps with think
    # = 5.67 s wall (LM 2.91), /root/reference/docs/en/BENCHMARK.md:121 —
    # the full pipeline with the REAL-geometry LM must beat it
    with section("30s_b1_think_lm1.7B", 45, deps=("llm17", "handler")) as go:
        if go:
            run_think("30s_b1_think_lm1.7B", 30, 1, repeats=2,
                      llm_handler=llm17(), lm_geom="1.7B")

    # optional llm17 tails run HERE, while the bf16 trunk is resident
    # (rebuilding it later costs its 80 s DEP surcharge) and before the
    # memory-risky base/quantized/4B block
    with section("lm1.7B_think60s_b8", 45, deps=("llm17",), tail=True) as go:
        if go:
            run_lm_only("lm1.7B_think60s_b8", target_duration=60, batch=8,
                        repeats=2)
    with section("lm1.7B_think600s_b1", 90, deps=("llm17",), tail=True) as go:
        if go:
            run_lm_only("lm1.7B_think600s_b1", target_duration=600, batch=1,
                        repeats=2)
    drop("llm17")               # bf16 trunk released before quantized runs

    # w8a8-quantized 1.7B planner: trunk weights stay int8 inside the
    # decode loops -> per-step weight reads halve
    def init_llm17q():
        l = LLMHandler(dtype=jnp.bfloat16)
        l.initialize(cfg=LMConfig.qwen3_1_7b(), tokenizer=tok17(),
                     max_duration=600, seed=0, quantization="w8a8")
        if not l.initialized:
            raise RuntimeError("lm1.7B w8a8 init failed")
        p2 = l.build_formatted_prompt_with_cot(
            "bench", "", "<think>\nduration: 60\n</think>")
        n2 = l.build_formatted_prompt_with_cot(
            "bench", "", "<think>\nduration: 60\n</think>",
            is_negative_prompt=True)
        state["llm17q"] = (l, p2, n2)
        return l, p2, n2

    with section("lm1.7B_codes300_w8a8", 90) as go:
        if go:
            l, p2, n2 = init_llm17q()
            qkw = dict(unconditional_prompts=[n2], cfg_scale=2.0,
                       temperature=0.85, top_p=0.9, n_codes=300)
            l.engine.generate_codes([p2], seed=0, **qkw)        # warm
            qwalls = []
            for i in range(3):
                t0 = time.perf_counter()
                l.engine.generate_codes([p2], seed=1 + i, **qkw)
                qwalls.append(time.perf_counter() - t0)
            qwall, qspread, _ = _median_run(qwalls)
            rows.append({
                "config": "lm1.7B_codes300_w8a8", "lm_geom": "1.7B",
                "batch": 1, "thinking": True, "wall_s": qwall,
                "wall_spread": qspread,
                "decode_tok_s": round(300 / qwall, 1),
            })
            log(f"matrix lm1.7B_codes300_w8a8: {rows[-1]}")
    with section("lm1.7B_codes3000_w8a8", 80, deps=("llm17q",),
                 tail=True) as go:
        if go:
            l, p2, n2 = state.get("llm17q") or init_llm17q()
            qkw_l = dict(unconditional_prompts=[n2], cfg_scale=2.0,
                         temperature=0.85, top_p=0.9, n_codes=3000)
            l.engine.generate_codes([p2], seed=10, **qkw_l)     # warm
            lwalls = []
            for i in range(2):
                t0 = time.perf_counter()
                l.engine.generate_codes([p2], seed=11 + i, **qkw_l)
                lwalls.append(time.perf_counter() - t0)
            lwall, lspread, _ = _median_run(lwalls)
            rows.append({
                "config": "lm1.7B_codes3000_w8a8", "lm_geom": "1.7B",
                "batch": 1, "thinking": True, "wall_s": lwall,
                "wall_spread": lspread,
                "decode_tok_s": round(3000 / lwall, 1),
            })
            log(f"matrix lm1.7B_codes3000_w8a8: {rows[-1]}")
    drop("llm17q")

    # long-song tails reuse the still-live turbo handler + tiny LM
    with section("600s_b1", 95, deps=("handler",), tail=True) as go:
        if go:
            run_dit("600s_b1", 600, 1, repeats=2)
    with section("30s_b8_think", 40, deps=("handler", "llm"),
                 tail=True) as go:
        if go:
            run_think("30s_b8_think", 30, 8, repeats=2)

    # Drop the bf16 turbo handler (the largest resident block) before the
    # memory-sensitive base/quantized/4B sections.
    drop("handler", "llm")

    # base-model guided path: 50 steps, CFG+APG (guidance_scale 7.0, the
    # reference generate_music.py:31 default). Reference example to beat:
    # 16-step guided 60 s = 12.34 s A100 (docs/en/BENCHMARK.md:122).
    with section("base50_60s_b1", 110) as go:
        if go:
            h = AceStepHandler(dit_config=DiTConfig.base())
            h.initialize_service(seed=0)
            state["handler_b"] = h
            run_guided("base50_60s_b1", 60, 50, repeats=3)
    with section("base50_600s_b1", 130, tail=True) as go:
        if go:
            if "handler_b" not in state:
                h = AceStepHandler(dit_config=DiTConfig.base())
                h.initialize_service(seed=0)
                state["handler_b"] = h
            run_guided("base50_600s_b1", 600, 50, repeats=2)
    drop("handler_b")

    # (the 60s_b1_w8a8 quantized-service row is measured inside the lm4B
    # section above, on the tier_16g pairing handler — see bench_lm4b)
    state.clear()
    gc.collect()


# --------------------------------------------------------------- docs

def write_docs(payload: dict, rows: list, env: dict) -> None:
    hs = payload["extra"].get("headline_spread", [])
    lines = [
        "# Benchmarks (measured)",
        "",
        "Measured by `bench.py` on one TPU v5e chip (warm, random weights,",
        "8-step turbo, bf16 unless noted). All walls are the MEDIAN of the",
        "repeats; spread = [min, max]. The reference baseline is the A100",
        "'<2 s per full song' headline (`/root/reference/README.md`).",
        "",
        f"Device->host bandwidth at run time: {env.get('d2h_MBps', '?')} MB/s"
        f" (spread {env.get('d2h_MBps_spread', '?')}) — transfer-bound rows",
        "(long-song VAE stage moves ~115 MB of int16 audio per 600 s song)",
        "scale with this number, which swings 2-4x between runs on a",
        "tunneled TPU.",
        "",
        f"**Headline**: {payload['value']} s per 60 s song, spread {hs} "
        f"({payload['vs_baseline']}x the reference baseline).",
        "",
        "`MFU %` is analytic DiT-decoder FLOPs / diffusion wall / chip peak",
        "(197 bf16 / 394 int8 TFLOP/s on v5e) — decoder trajectory only,",
        "condition encoder excluded.",
        "",
        "| config | duration | batch | think | wall s | spread | s/song | RTF | LM s | LM tok/s | DiT s | MFU % | VAE s |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for row in rows:
        if "error" in row or "skipped" in row:
            why = "SKIPPED (budget)" if "skipped" in row else "FAILED"
            lines.append(f"| {row['config']} | — | — | — | {why} | "
                         f"— | — | — | — | — | — | — | — |")
            continue
        if "lm_prefix_reuse_pct" in row:
            lines.append(
                f"| {row['config']} | — | — | on | "
                f"{row['lm_prefix_reuse_pct']}% of "
                f"{row['prompt_tokens']} prompt tokens served from the "
                f"cross-request prefix cache | — | — | — | — | — | — | "
                f"— | — |")
            continue
        lines.append(
            f"| {row['config']} | {row.get('duration_s', '—')} | "
            f"{row.get('batch', '—')} | "
            f"{'on' if row.get('thinking') else 'off'} | "
            f"{row.get('wall_s', '—')} | "
            f"{row.get('wall_spread', '—')} | "
            f"{row.get('seconds_per_song', '—')} | {row.get('rtf', '—')} | "
            f"{row.get('lm_s', '—')} | "
            f"{row.get('decode_tok_s', row.get('prefill_tok_s', '—'))} | "
            f"{row.get('diffusion_s', '—')} | "
            f"{row.get('mfu_pct', '—')} | "
            f"{row.get('vae_s', '—')} |")
    lines += [
        "",
        "Small thinking rows use the self-contained fallback LM (tiny",
        "random weights) to time the two-phase constrained-decoding",
        "machinery. `lm1.7B_*`/`lm4B_*` rows instantiate the real Qwen3",
        "geometries (random weights — throughput is weight-independent):",
        "LM-only CFG-paired two-phase walls; the LM tok/s column is",
        "decode (or prefill) tokens/s of the conditional stream (CFG",
        "doubles the model batch), plus the reference's 30 s thinking",
        "example end-to-end.",
        "",
        "## Roofline: where the remaining wall time lives",
        "",
        "**Turbo DiT at batch 1 is latency-bound, not compute-bound.** The",
        "same decoder forward costs ~29 ms/step at an effective batch of 1",
        "(8-step turbo, no CFG) and ~32 ms/step at an effective batch of 2",
        "(base 50-step, CFG pair) — doubling the FLOPs costs ~10% more",
        "wall, which is why the base-model row reports ~73% MFU while the",
        "b1 turbo row sits at ~40%. At L≈1327 tokens (750 audio patches +",
        "577 condition) and hidden 2048, a single-sequence matmul leaves",
        "MXU tiles idle; the batched rows (30s_b8, base50 CFG) show the",
        "same program at 49-73% MFU. Pushing b1 past ~40% would need",
        "cross-step batching, which the ODE's data dependence forbids —",
        "the capacity is real and free for any batched workload.",
        "",
        "**The 60 s service wall is device->host bandwidth, not compute.**",
        "Audio leaves the chip as int16 + per-item peak (half of f32, the",
        "same grid a 16-bit export keeps): a 60 s stereo song is 10.6 MB,",
        "which at the tunnel's ~20-40 MB/s is 0.3-0.5 s of pure transfer;",
        "decode compute overlaps it via segmented dispatch, so the VAE",
        "stage floor ≈ transfer time + one segment of compute. On a",
        "production host (PCIe/NVLink-class d2h, GB/s) the same code path",
        "is compute-bound and the stage collapses to the ~0.2 s decode.",
        "",
    ]
    with open("docs/BENCHMARK.md", "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    log("wrote docs/BENCHMARK.md")


def main():
    if "--docs-from-matrix" in sys.argv:
        # regenerate docs/BENCHMARK.md from the last saved matrix — no
        # TPU touched (doc-template changes should not cost a capture)
        with open("BENCH_MATRIX.json", encoding="utf-8") as f:
            saved = json.load(f)
        write_docs(saved["headline"], saved["rows"], saved["env"])
        return
    skip_matrix = "--headline-only" in sys.argv
    # headline FIRST (it fetches only 8 samples — transfer-light), then
    # the early print, and only THEN the bandwidth probe: a probe fetch
    # issued into a wedged-tunnel window blocks uninterruptibly, and a
    # hang before the early print loses the whole artifact (r05 observed
    # bench stuck >10 min inside a 32 MiB probe fetch while compute RPCs
    # ran fine).
    wall, spread, mfu = headline()
    payload = {
        "metric": "seconds_per_song",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / wall, 3),
        "extra": {"headline_spread": spread, **mfu},
    }
    # EARLY print: if the driver kills the process mid-matrix, the last
    # stdout line is still this parseable summary (matrix logs -> stderr)
    print(json.dumps(payload), flush=True)
    env = probe_bandwidth()
    log(f"d2h bandwidth probe: {env}")
    payload["extra"].update(env)

    rows: list = []
    truncated: list = []
    if not skip_matrix:
        try:
            matrix(rows, truncated)
        except Exception as e:      # pragma: no cover - defensive
            log(f"MATRIX ABORTED: {e!r}")
        payload["extra"]["rows_done"] = sum(
            1 for r in rows if "error" not in r and "skipped" not in r)
        payload["extra"]["truncated"] = truncated[:8]
        # full matrix to a FILE (a multi-KB stdout line broke the driver
        # parser in round 3); stdout stays small. A starved capture (a
        # backend-init block ate the budget, nearly all sections shed)
        # goes to a side file so it cannot clobber a good committed one.
        mx_name = ("BENCH_MATRIX.json"
                   if payload["extra"]["rows_done"] >= 6
                   else "BENCH_MATRIX_starved.json")
        with open(mx_name, "w", encoding="utf-8") as f:
            json.dump({"headline": payload, "rows": rows,
                       "truncated": truncated, "env": env}, f, indent=1)
        log(f"wrote {mx_name}")
        if "--write-docs" in sys.argv:
            if payload["extra"]["rows_done"] >= 6:
                write_docs(payload, rows, env)
            else:
                log(f"NOT writing docs: only "
                    f"{payload['extra']['rows_done']} rows captured")
    log(f"total bench wall: {time.perf_counter() - _T_START:.1f}s "
        f"(budget {BUDGET_S:.0f}s)")
    # FINAL print: same small schema, now with matrix accounting
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
