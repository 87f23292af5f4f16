"""ACE-Step TPU: a TPU-native (JAX/XLA/Pallas) music generation framework.

A from-scratch rebuild of the capabilities of ACE-Step 1.5
(`/root/reference`): a 5 Hz LM planner + 25 Hz flow-matching DiT +
48 kHz Oobleck audio VAE, designed for TPU from the ground up:

- Pure-functional models (param pytrees + jit-compiled apply fns).
- Static shapes everywhere (duration buckets, mask discipline) so the
  whole denoising trajectory compiles to one XLA program.
- The 8-step turbo sampler runs as a single `lax.scan` with cross-attn
  K/V computed once outside the scan.
- Multi-chip scaling via `jax.sharding.Mesh` + NamedSharding (batch
  sharded over ICI, weights replicated), not NCCL-style collectives.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt-out via ACESTEP_NO_COMP_CACHE).

    Big-graph compiles (full DiT trajectory, tiled VAE) cost 1-2 minutes on
    a tunneled TPU; caching them on disk makes every process after the first
    start in seconds. Safe no-op if the JAX version lacks the config knob.
    """
    if _os.environ.get("ACESTEP_NO_COMP_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if cache_dir is None:
            # scope the cache per HOST fingerprint: XLA:CPU persists AOT
            # machine code keyed without the host's CPU features, so an
            # entry written on one machine loads on another with a
            # "could lead to SIGILL" warning per program (observed: the
            # virtual-CPU-mesh dryrun drowned in these loads after the
            # image moved hosts). A fingerprinted subdir makes each host
            # start a clean, compatible cache.
            import hashlib

            fp_src = jax.__version__
            try:
                with open("/proc/cpuinfo", "r", encoding="utf-8") as f:
                    for line in f:
                        if line.startswith("flags"):
                            fp_src += line
                            break
            except OSError:
                pass
            fp = hashlib.md5(fp_src.encode()).hexdigest()[:10]
            cache_dir = _os.path.join(_os.path.expanduser("~"), ".cache",
                                      "acestep_tpu", "xla_cache", fp)
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()


# Lazy top-level API (imports stay cheap; jax loads on first use):
#   from acestep_tpu import AceStepHandler, LLMHandler, generate_music, ...
_LAZY = {
    "AceStepHandler": ("acestep_tpu.pipeline.handler", "AceStepHandler"),
    "LLMHandler": ("acestep_tpu.llm.handler", "LLMHandler"),
    "generate_music": ("acestep_tpu.inference", "generate_music"),
    "understand_music": ("acestep_tpu.inference", "understand_music"),
    "create_sample": ("acestep_tpu.inference", "create_sample"),
    "format_sample": ("acestep_tpu.inference", "format_sample"),
    "GenerationParams": ("acestep_tpu.inference", "GenerationParams"),
    "GenerationConfig": ("acestep_tpu.inference", "GenerationConfig"),
    "GenerationResult": ("acestep_tpu.inference", "GenerationResult"),
    "DiTConfig": ("acestep_tpu.config", "DiTConfig"),
    "VAEConfig": ("acestep_tpu.config", "VAEConfig"),
    "LMConfig": ("acestep_tpu.config", "LMConfig"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'acestep_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
