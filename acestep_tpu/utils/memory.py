"""Device-memory exhaustion detection + recovery.

The ONE implementation behind every OOM ladder (pipeline handler degrade
plan, LLM tier downgrade, bench fail-soft sections). Backend phrasings
drift — XLA:TPU raises RESOURCE_EXHAUSTED, CPU/GPU paths say "Out of
memory"/"out of memory", some wrap it as "OOM" — and three hand-rolled
copies of the string list had already diverged on capitalization.
"""

from __future__ import annotations

import gc

_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "out of memory", "OOM")


def is_oom_error(e: BaseException) -> bool:
    """True when `e` is a device-memory exhaustion from any backend."""
    msg = str(e)
    low = msg.lower()
    return ("RESOURCE_EXHAUSTED" in msg or "OOM" in msg
            or "out of memory" in low)


def release_device_memory() -> None:
    """Drop dead device buffers + compiled programs after an OOM.

    Call with the failed objects already unreferenced (and the OOM
    exception's traceback dropped — frames below the raise pin every
    partially-built tree). Two gc passes: the first frees the Python
    objects, jax.clear_caches drops compiled executables that captured
    their buffers, the second collects anything those released.
    """
    gc.collect()
    try:
        import jax

        jax.clear_caches()
    except Exception:       # pragma: no cover - defensive
        pass
    gc.collect()
